import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.ops.sht import SHT, clenshaw_curtis_weights, legendre_matrix


def test_clenshaw_curtis_exactness():
    """CC weights must integrate low-degree polynomials exactly."""
    n = 33
    w = clenshaw_curtis_weights(n)
    x = np.cos(np.arange(n) * np.pi / (n - 1))
    np.testing.assert_allclose(w.sum(), 2.0, atol=1e-12)  # ∫1 dx
    np.testing.assert_allclose((w * x).sum(), 0.0, atol=1e-12)
    np.testing.assert_allclose((w * x**2).sum(), 2 / 3, atol=1e-10)
    np.testing.assert_allclose((w * x**6).sum(), 2 / 7, atol=1e-10)


def test_legendre_orthonormality():
    """∫ P̄_l^m P̄_l'^m dcosθ = δ_{ll'} / (2π)."""
    nlat, L, M = 129, 20, 20
    theta = np.linspace(0, np.pi, nlat)
    P = legendre_matrix(nlat, L, M, np.cos(theta))
    w = clenshaw_curtis_weights(nlat)
    for m in (0, 1, 5):
        G = (P[m] * w) @ P[m].T  # (L, L)
        expected = np.eye(L) / (2 * np.pi)
        expected[:m, :m] = 0  # l < m rows are zero
        np.testing.assert_allclose(G, expected, atol=1e-8)


def test_roundtrip_bandlimited():
    """ISHT∘SHT must be identity on band-limited fields."""
    nlat, nlon, L = 65, 128, 32
    sht = SHT(nlat, nlon, lmax=L, mmax=L, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    alm = (rng.normal(size=(3, L, L)) + 1j * rng.normal(size=(3, L, L))).astype(
        np.complex64
    )
    # zero invalid modes (l < m) and make m=0 real (real-field constraint)
    li = np.arange(L)[:, None]
    mi = np.arange(L)[None, :]
    alm[:, li < mi] = 0
    alm[:, :, 0] = alm[:, :, 0].real
    x = np.asarray(sht.inverse(jnp.asarray(alm)))
    alm2 = np.asarray(sht.forward(jnp.asarray(x)))
    np.testing.assert_allclose(alm2, alm, atol=2e-4)


def test_roundtrip_grid():
    """SHT then ISHT reproduces a smooth low-degree grid field.

    Quadrature is exact for integrand degree ≤ nlat−1, so projection is
    exact only under triangular truncation lmax ≲ nlat/2 — which is how
    SFNO uses it.  (Full-bandwidth analysis aliases, as in any collocated
    SHT.)
    """
    nlat, nlon = 65, 128
    sht = SHT(nlat, nlon, lmax=nlat // 2, mmax=nlat // 2)
    lat = np.linspace(np.pi / 2, -np.pi / 2, nlat)
    lon = np.linspace(0, 2 * np.pi, nlon, endpoint=False)
    # genuine low-l field: Re(Y_22) ∝ cos²(lat)·cos(2·lon), plus Y_10 ∝ sin(lat)
    x = (
        np.cos(lat)[:, None] ** 2 * np.cos(2 * lon)[None, :]
        + np.sin(lat)[:, None]
    ).astype(np.float32)[None]
    back = np.asarray(sht.inverse(sht.forward(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=2e-3)


def test_constant_field():
    """A constant field is pure (l=0, m=0) with a_00 = c·sqrt(4π)."""
    nlat, nlon = 33, 64
    sht = SHT(nlat, nlon, lmax=16, mmax=16)
    x = jnp.ones((1, nlat, nlon))
    alm = np.asarray(sht.forward(x))
    np.testing.assert_allclose(alm[0, 0, 0].real, np.sqrt(4 * np.pi), rtol=1e-4)
    off = alm.copy()
    off[0, 0, 0] = 0
    assert np.abs(off).max() < 1e-3


def test_matches_scipy_sph_harm():
    """Pin the phase/normalization convention against scipy.

    ``scipy.special.sph_harm_y(l, m, θ, 0)`` is the standard orthonormal
    spherical harmonic WITH the Condon–Shortley phase — the same
    convention torch-harmonics uses — so matching it row-by-row retires
    the converter's biggest stated parity risk for fcnv2_sm (SURVEY §7
    hard-part 2): a sign flip on any odd-m row would show up here.
    """
    sph_harm_y = pytest.importorskip("scipy.special").sph_harm_y

    # equiangular (pole-inclusive) grid
    nlat, L = 19, 12
    theta = np.linspace(0, np.pi, nlat)
    P = legendre_matrix(nlat, L, L, np.cos(theta))
    for m in range(L):
        for l in range(m, L):
            ref = sph_harm_y(l, m, theta, 0.0).real
            np.testing.assert_allclose(P[m, l], ref, atol=1e-13)

    # legendre-gauss grid (the fcnv2_sm internal grid)
    x, _ = np.polynomial.legendre.leggauss(16)
    ct = x[::-1].copy()
    th = np.arccos(ct)
    Pg = legendre_matrix(16, 10, 10, ct)
    for m in range(10):
        for l in range(m, 10):
            ref = sph_harm_y(l, m, th, 0.0).real
            np.testing.assert_allclose(Pg[m, l], ref, atol=1e-13)


def test_matmul_lon_matches_fft():
    """The truncated-DFT matmul longitude path (the TPU default — the
    FFT computed all nlon/2+1 modes and dominated fcnv2_sm's step) must
    match the FFT path to float32 precision, truncation included."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 65, 128)).astype(np.float32)
    a = SHT(65, 128, lmax=33, mmax=33, lon_mode="matmul")
    b = SHT(65, 128, lmax=33, mmax=33, lon_mode="fft")
    fa = np.asarray(a.forward(jnp.asarray(x)))
    fb = np.asarray(b.forward(jnp.asarray(x)))
    np.testing.assert_allclose(fa, fb, atol=1e-6)
    ya = np.asarray(a.inverse(jnp.asarray(fa)))
    yb = np.asarray(b.inverse(jnp.asarray(fb)))
    np.testing.assert_allclose(ya, yb, atol=1e-5)


def test_matmul_lon_nyquist_weight():
    """mmax covering the Nyquist mode must not double-count it."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 17, 16)).astype(np.float32)  # mmax = 9 = W/2+1
    a = SHT(17, 16, lmax=17, mmax=9, lon_mode="matmul")
    b = SHT(17, 16, lmax=17, mmax=9, lon_mode="fft")
    ya = np.asarray(a.inverse(a.forward(jnp.asarray(x))))
    yb = np.asarray(b.inverse(b.forward(jnp.asarray(x))))
    np.testing.assert_allclose(ya, yb, atol=1e-5)
