"""Spherical harmonic transform as batched Legendre matmuls (MXU-bound).

Replaces torch-harmonics' CUDA SHT used by the reference's FourCastNetv2
backend (SURVEY.md §2.9 fcnv2_sm row).  Design:

- longitude: truncated real DFT as TWO static-matrix matmuls
  (cos/sin tables of shape (nlon, mmax)) — MXU work.  XLA's FFT on TPU
  runs on the VPU with heavy layout churn and computes ALL nlon/2+1
  frequencies; SFNO keeps only mmax=121 of 721, so the matmul computes
  an order of magnitude less and measured ~80% of fcnv2_sm's step was
  this FFT machinery (profiled round 3; same finding as AFNO's token
  mixer, ops/dft.py).  ``lon_mode="fft"`` keeps the old path for
  cross-checks.
- latitude: dense contraction with precomputed orthonormal associated
  Legendre matrices — einsum ``(m l h, c h m → c l m)``, a batched
  matmul that tiles directly onto the MXU
- quadrature: Clenshaw–Curtis on the equiangular pole-inclusive grid
  (exact for the band-limited case)

All tables are computed once in float64 numpy at construction and closed
over as constants; compute runs in f32 (spectral coefficients are
complex64 — parity with torch-harmonics requires f32 here).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def clenshaw_curtis_weights(n: int) -> np.ndarray:
    """Weights w_j for ∫_{-1}^{1} f(x) dx ≈ Σ w_j f(x_j), x_j = cos(jπ/(n−1)).

    Endpoint-inclusive (our lat grid includes both poles).
    """
    if n < 2:
        raise ValueError("need at least 2 nodes")
    N = n - 1
    theta = np.arange(n) * np.pi / N
    w = np.ones(n)
    ks = np.arange(1, N // 2 + 1)
    for j in range(n):
        terms = np.cos(2 * ks * theta[j]) / (4 * ks**2 - 1)
        # halve the last term when N is even (k = N/2)
        if N % 2 == 0:
            terms[-1] *= 0.5
        w[j] = (2.0 / N) * (1 - 2 * np.sum(terms))
    w[0] /= 2
    w[-1] /= 2
    return w


def legendre_matrix(nlat: int, lmax: int, mmax: int, costheta: np.ndarray) -> np.ndarray:
    """Orthonormal associated Legendre P̄_l^m at the given cosθ nodes.

    Returns (mmax, lmax, nlat) float64, zero for l < m.  Normalized so
    that ∫ P̄ P̄ dcosθ = 1/(2π) · δ — i.e. the spherical-harmonic
    normalization with the 2π longitude factor folded in, matching the
    FFT convention used in :class:`SHT`.
    """
    x = np.asarray(costheta, dtype=np.float64)
    sx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    P = np.zeros((mmax, lmax, nlat))
    # P̄_0^0 = sqrt(1/4π)
    pmm = np.full(nlat, np.sqrt(1.0 / (4.0 * np.pi)))
    for m in range(mmax):
        if m > 0:
            pmm = -np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * sx * pmm
        if m < lmax:
            P[m, m] = pmm
        if m + 1 < lmax:
            P[m, m + 1] = np.sqrt(2.0 * m + 3.0) * x * pmm
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            P[m, l] = a * (x * P[m, l - 1] - b * P[m, l - 2])
    return P


class SHT:
    """Spherical harmonic analysis/synthesis on a latitude-ring grid.

    ``forward``: (..., nlat, nlon) real → (..., lmax, mmax) complex
    ``inverse``: (..., lmax, mmax) complex → (..., nlat, nlon) real

    ``grid``:
    - "equiangular": pole-inclusive θ = 0..π with Clenshaw–Curtis
      quadrature (the 721-pt 0.25° product grid)
    - "legendre-gauss": Gauss–Legendre nodes/weights (exact for the
      band-limited case; the internal grid of the real fcnv2_sm, whose
      torch-harmonics transforms use grid="legendre-gauss" between
      blocks)
    """

    def __init__(self, nlat: int, nlon: int, lmax: int | None = None,
                 mmax: int | None = None, dtype=jnp.float32,
                 grid: str = "equiangular", lon_mode: str = "matmul"):
        self.nlat, self.nlon = nlat, nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or min(self.lmax, nlon // 2 + 1)
        self.dtype = dtype
        self.grid = grid
        self.lon_mode = lon_mode

        if grid == "equiangular":
            # pole-inclusive equiangular latitudes: θ = 0 .. π
            theta = np.linspace(0, np.pi, nlat)
            ct = np.cos(theta)
            w = clenshaw_curtis_weights(nlat)  # dcosθ quadrature
        elif grid == "legendre-gauss":
            # Gauss nodes are x = cosθ ∈ (−1, 1), descending θ order to
            # match the north→south latitude convention
            x, w = np.polynomial.legendre.leggauss(nlat)
            ct = x[::-1].copy()
            w = w[::-1].copy()
        else:
            raise ValueError(f"unknown SHT grid {grid!r}")
        P = legendre_matrix(nlat, self.lmax, self.mmax, ct)  # (M, L, H)

        # analysis operator: includes quadrature weights and the 2π/nlon
        # longitude integral factor; synthesis uses bare P with the
        # real-field (2 − δ_m0) fold handled by irfft's Hermitian sum.
        # Stored as NUMPY (not jnp): SHT instances are lru-cached and may
        # be constructed inside a jit trace — device conversion there
        # would leak tracers.  numpy tables become per-trace constants.
        np_dtype = np.dtype(jnp.dtype(dtype).name) if jnp.dtype(dtype) != jnp.bfloat16 else np.float32
        self._Pw = ((P * w[None, None, :]) * (2 * np.pi / nlon)).astype(np_dtype)
        self._P = P.astype(np_dtype)

        # truncated real-DFT tables: θ[w, m] = 2π·w·m/W for the mmax kept
        # modes only.  Forward: F_m = Σ_w x_w e^{-iθ}; synthesis folds the
        # Hermitian weights (2 except m=0 and the Nyquist mode) so the
        # real field is one cos-matmul minus one sin-matmul.
        theta = (
            np.arange(nlon)[:, None] * np.arange(self.mmax)[None, :]
            * (2 * np.pi / nlon)
        )
        self._cw = np.cos(theta).astype(np.float32)  # (W, M)
        self._sw = (-np.sin(theta)).astype(np.float32)
        hw = np.full((self.mmax,), 2.0)
        hw[0] = 1.0
        if nlon % 2 == 0 and self.mmax - 1 == nlon // 2:
            hw[-1] = 1.0
        self._icw = (np.cos(theta) * hw).astype(np.float32)  # (W, M)
        self._isw = (np.sin(theta) * hw).astype(np.float32)

    def _lon_forward(self, x32: jax.Array) -> tuple[jax.Array, jax.Array]:
        """real (..., W) f32 → (Fr, Fi) each (..., M) f32."""
        if self.lon_mode == "fft":
            F = jnp.fft.rfft(x32, axis=-1)[..., : self.mmax]
            return F.real, F.imag
        Fr = jnp.einsum("...w,wm->...m", x32, self._cw,
                        preferred_element_type=jnp.float32)
        Fi = jnp.einsum("...w,wm->...m", x32, self._sw,
                        preferred_element_type=jnp.float32)
        return Fr, Fi

    def _lon_inverse(self, Fr: jax.Array, Fi: jax.Array) -> jax.Array:
        """(Fr, Fi) (..., M) f32 → real (..., W): G_0 + 2Σ Re(G_m e^{imφ})."""
        if self.lon_mode == "fft":
            F = jax.lax.complex(Fr, Fi)
            nfreq = self.nlon // 2 + 1
            if self.mmax < nfreq:
                pad = [(0, 0)] * (F.ndim - 1) + [(0, nfreq - self.mmax)]
                F = jnp.pad(F, pad)
            # irfft computes (1/W)[X_0 + 2 Σ Re(X_m e^{imφ})]; scale by W
            return jnp.fft.irfft(F, n=self.nlon, axis=-1) * self.nlon
        return (
            jnp.einsum("...m,wm->...w", Fr, self._icw,
                       preferred_element_type=jnp.float32)
            - jnp.einsum("...m,wm->...w", Fi, self._isw,
                         preferred_element_type=jnp.float32)
        )

    @partial(jax.jit, static_argnums=0)
    def forward(self, x: jax.Array) -> jax.Array:
        """Analysis: real (..., H, W) → complex64 (..., L, M)."""
        Fr, Fi = self._lon_forward(x.astype(jnp.float32))
        Fr, Fi = Fr.astype(self.dtype), Fi.astype(self.dtype)
        # (..., H, M) × (M, L, H) → (..., L, M)
        ar = jnp.einsum("...hm,mlh->...lm", Fr, self._Pw,
                        preferred_element_type=jnp.float32)
        ai = jnp.einsum("...hm,mlh->...lm", Fi, self._Pw,
                        preferred_element_type=jnp.float32)
        return jax.lax.complex(ar, ai)

    @partial(jax.jit, static_argnums=0)
    def inverse(self, alm: jax.Array) -> jax.Array:
        """Synthesis: complex (..., L, M) → real (..., H, W)."""
        ar = alm.real.astype(self.dtype)
        ai = alm.imag.astype(self.dtype)
        Fr = jnp.einsum("...lm,mlh->...hm", ar, self._P,
                        preferred_element_type=jnp.float32)
        Fi = jnp.einsum("...lm,mlh->...hm", ai, self._P,
                        preferred_element_type=jnp.float32)
        return self._lon_inverse(Fr, Fi)


@lru_cache(maxsize=8)
def get_sht(nlat: int, nlon: int, lmax: int | None = None, mmax: int | None = None,
            grid: str = "equiangular") -> SHT:
    return SHT(nlat, nlon, lmax, mmax, grid=grid)
