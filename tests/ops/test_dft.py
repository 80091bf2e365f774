"""Matmul-DFT (ops/dft.py) must match jnp.fft.rfft2/irfft2."""

import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.ops.dft import dft_tables, irfft2_matmul, rfft2_matmul


@pytest.mark.parametrize("Ht,Wt", [(8, 12), (90, 180), (9, 15)])
def test_rfft2_matmul_matches_fft(Ht, Wt):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(Ht, Wt, 3)).astype(np.float32)
    t = dft_tables(Ht, Wt)
    xr, xi = rfft2_matmul(jnp.asarray(x), t)
    ref = np.fft.rfft2(x, axes=(0, 1))
    np.testing.assert_allclose(np.asarray(xr), ref.real, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(xi), ref.imag, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("Ht,Wt", [(8, 12), (90, 180), (9, 15)])
def test_irfft2_matmul_roundtrip(Ht, Wt):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(Ht, Wt, 3)).astype(np.float32)
    t = dft_tables(Ht, Wt)
    xr, xi = rfft2_matmul(jnp.asarray(x), t)
    y = np.asarray(irfft2_matmul(xr, xi, t, dtype=jnp.float32))
    np.testing.assert_allclose(y, x, atol=5e-3, rtol=5e-3)


def test_irfft2_matmul_matches_fft_on_filtered_spectrum():
    rng = np.random.default_rng(2)
    Ht, Wt = (16, 24)
    Wf = Wt // 2 + 1
    xr = rng.normal(size=(Ht, Wf, 2)).astype(np.float32)
    xi = rng.normal(size=(Ht, Wf, 2)).astype(np.float32)
    # a physically-valid spectrum must be Hermitian in the retained axis
    # extremes for irfft to be exact — zero them like a real filter output
    xi[:, 0] = 0
    xi[:, -1] = 0
    t = dft_tables(Ht, Wt)
    y = np.asarray(irfft2_matmul(jnp.asarray(xr), jnp.asarray(xi), t,
                                 dtype=jnp.float32))
    ref = np.fft.irfft2(xr + 1j * xi, s=(Ht, Wt), axes=(0, 1))
    np.testing.assert_allclose(y, ref, atol=5e-3, rtol=5e-3)
