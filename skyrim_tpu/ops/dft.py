"""2D real DFT as batched matmuls — the MXU-native replacement for
``jnp.fft.rfft2``/``irfft2`` in AFNO's token mixer.

XLA's FFT on TPU runs on the VPU and costs ~2.9 ms per
rfft2+irfft2 pair at AFNO block shape (90, 180, 768) — 77% of each
block (measured).  At these sizes an explicit DFT is a handful of
(tokens × modes) matmuls on the MXU: the transform matrices are static
numpy constants, inputs stay bf16 with f32 accumulation, and the whole
forward+inverse pair drops to ~0.3 ms.

Convention matches numpy: ``X[g, f] = Σ_{h,w} x[h, w] ·
e^{-2πi gh/Ht} · e^{-2πi fw/Wt}`` with the real transform along the
last (lon) axis keeping Wf = Wt//2 + 1 modes.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def dft_tables(Ht: int, Wt: int) -> dict:
    """Static forward/inverse DFT matrices for an (Ht, Wt) token grid."""
    Wf = Wt // 2 + 1
    w = np.arange(Wt)[:, None] * np.arange(Wf)[None, :] * (2 * np.pi / Wt)
    h = np.arange(Ht)[:, None] * np.arange(Ht)[None, :] * (2 * np.pi / Ht)
    # forward: e^{-iθ} = cos θ − i sin θ
    fwd = {
        "cw": np.cos(w), "sw": -np.sin(w),  # (Wt, Wf)
        "ch": np.cos(h), "sh": -np.sin(h),  # (Ht, Ht)
    }
    # inverse: e^{+iθ}; irfft doubles every non-Nyquist/non-DC lon mode
    # and normalizes by Ht·Wt — folded into the lon tables
    weight = np.full((Wf,), 2.0)
    weight[0] = 1.0
    if Wt % 2 == 0:
        weight[-1] = 1.0
    inv = {
        "ich": np.cos(h) / Ht, "ish": np.sin(h) / Ht,  # (Ht, Ht)
        "icw": (np.cos(w) * weight / Wt).T,  # (Wf, Wt)
        "isw": (np.sin(w) * weight / Wt).T,  # (Wf, Wt)
    }
    return {k: v.astype(np.float32) for k, v in {**fwd, **inv}.items()}


def rfft2_matmul(x: jnp.ndarray, tables: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x (Ht, Wt, D) real → (Xr, Xi) each (Ht, Wf, D) f32."""
    dt = x.dtype
    t = {k: jnp.asarray(v, dt) for k, v in tables.items()}
    f32 = jnp.float32
    ar = jnp.einsum("hwd,wf->hfd", x, t["cw"], preferred_element_type=f32)
    ai = jnp.einsum("hwd,wf->hfd", x, t["sw"], preferred_element_type=f32)
    ar_, ai_ = ar.astype(dt), ai.astype(dt)
    xr = (
        jnp.einsum("hfd,hg->gfd", ar_, t["ch"], preferred_element_type=f32)
        - jnp.einsum("hfd,hg->gfd", ai_, t["sh"], preferred_element_type=f32)
    )
    xi = (
        jnp.einsum("hfd,hg->gfd", ar_, t["sh"], preferred_element_type=f32)
        + jnp.einsum("hfd,hg->gfd", ai_, t["ch"], preferred_element_type=f32)
    )
    return xr, xi


def irfft2_matmul(
    xr: jnp.ndarray, xi: jnp.ndarray, tables: dict, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """(Xr, Xi) (Ht, Wf, D) → y (Ht, Wt, D) real (``dtype``)."""
    t = {k: jnp.asarray(v, dtype) for k, v in tables.items()}
    f32 = jnp.float32
    xr_, xi_ = xr.astype(dtype), xi.astype(dtype)
    br = (
        jnp.einsum("gfd,gh->hfd", xr_, t["ich"], preferred_element_type=f32)
        - jnp.einsum("gfd,gh->hfd", xi_, t["ish"], preferred_element_type=f32)
    )
    bi = (
        jnp.einsum("gfd,gh->hfd", xr_, t["ish"], preferred_element_type=f32)
        + jnp.einsum("gfd,gh->hfd", xi_, t["ich"], preferred_element_type=f32)
    )
    y = (
        jnp.einsum("hfd,fw->hwd", br.astype(dtype), t["icw"],
                   preferred_element_type=f32)
        - jnp.einsum("hfd,fw->hwd", bi.astype(dtype), t["isw"],
                     preferred_element_type=f32)
    )
    return y.astype(dtype)
