"""Fused patch-merging / patch-expansion kernels (Pallas).

Pangu's DownSample (2×2 patch merge → LayerNorm → Dense) and UpSample
(Dense → 2×2 expand → LayerNorm) lower in XLA as chains of pad /
reshape / relayout-copy / normalize ops that round-trip the full
activation through HBM 4-5× each (~15 ms of the Pangu step, measured
with utils/op_stats).  Each kernel here does the whole stage transform
in one HBM pass.

Mosaic cannot shape-cast lane groups ((…, 2, 2, C) → (…, 4C)), so the
2×2 interleave never happens as data movement at all: the kernels view
the activation as a free 6D reshape (Z, H/2, 2, W/2, 2, C), address the
four parity slabs by scalar index, and split the merged-channel
LayerNorm+GEMM algebraically —

  LN(concat_ij x_ij) @ W = inv·Σ_ij (x_ij∘s_ij) @ W_ij − inv·μ·(s@W)
                           + (b_ln@W + b)

where μ/inv are per-token stats over all 4C lanes (sums of per-part
lane reductions) and s@W / b_ln@W+b are param-only terms computed once
outside.  The expansion side needs no trick: its LayerNorm is per
Co-lane group, so the four groups are static lane slices written back
by scalar index.

Both are differentiable via custom VJPs through XLA reference
compositions (same pattern as ops/fused_block.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyrim_tpu.ops.fused_block import _layernorm_f32

_EPS = 1e-6


def _pick_tile(n: int, max_tile: int) -> int:
    """Largest divisor of n that is ≤ max_tile."""
    for t in range(min(n, max_tile), 0, -1):
        if n % t == 0:
            return t
    return 1


# --- DownSample: (Z, 2H', 2W', C) → (Z, H', W', Co) ---


def _down_kernel(x_ref, s4_ref, w4_ref, sw_ref, ct_ref, o_ref):
    # x_ref (1, th, 2, tw, 2, C) — parity slabs by scalar index
    _, th, _, tw, _, C = x_ref.shape
    Co = o_ref.shape[-1]
    dt = x_ref.dtype
    xb = x_ref[...]
    N = th * tw
    acc = jnp.zeros((N, Co), jnp.float32)
    sm = jnp.zeros((N, 1), jnp.float32)
    s2 = jnp.zeros((N, 1), jnp.float32)
    for i in range(2):
        for j in range(2):
            v = xb[0, :, i, :, j, :].reshape(N, C)
            vf = v.astype(jnp.float32)
            sm = sm + jnp.sum(vf, axis=-1, keepdims=True)
            s2 = s2 + jnp.sum(vf * vf, axis=-1, keepdims=True)
            vs = (vf * s4_ref[2 * i + j].astype(jnp.float32)[None]).astype(dt)
            acc = acc + jax.lax.dot_general(
                vs, w4_ref[2 * i + j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    mu = sm / (4 * C)
    var = jnp.maximum(s2 / (4 * C) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    out = inv * acc - (inv * mu) * sw_ref[...].astype(jnp.float32)
    out = out + ct_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(dt).reshape(1, th, tw, Co)


def reference_downsample(x, ln, wb):
    """XLA composition: 2×2 merge → LN → Dense (models/pangu.py
    DownSample semantics; input already padded to even H)."""
    Z, H, Wd, C = x.shape
    v = x.reshape(Z, H // 2, 2, Wd // 2, 2, C)
    v = v.transpose(0, 1, 3, 2, 4, 5).reshape(Z, H // 2, Wd // 2, 4 * C)
    h = _layernorm_f32(v, ln[0].reshape(1, -1), ln[1].reshape(1, -1))
    h = h.astype(x.dtype)
    return h @ wb[0].astype(x.dtype) + wb[1].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _down_vjp(x, ln, wb, interpret):
    return _down_impl(x, ln, wb, interpret)


def _down_fwd(x, ln, wb, interpret):
    return _down_impl(x, ln, wb, interpret), (x, ln, wb)


def _down_bwd(interpret, res, g):
    _, vjp = jax.vjp(reference_downsample, *res)
    return vjp(g)


_down_vjp.defvjp(_down_fwd, _down_bwd)


def fused_downsample(x, ln, wb, interpret: bool = False):
    """2×2 patch merge + LayerNorm + Dense in one HBM pass.

    x: (Z, H, W, C) with H, W even; ln: (scale, bias) over 4C;
    wb: ((4C, Co), (Co,)).  Returns (Z, H/2, W/2, Co).
    """
    return _down_vjp(x, ln, wb, interpret)


def _down_impl(x, ln, wb, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    Z, H, Wd, C = x.shape
    H2, W2 = H // 2, Wd // 2
    Co = wb[0].shape[1]
    dt = x.dtype
    x6 = x.reshape(Z, H2, 2, W2, 2, C)  # free view
    s4 = ln[0].reshape(4, C)
    w4 = wb[0].reshape(4, C, Co).astype(dt)
    # param-only terms of the split LayerNorm+GEMM (see module docstring)
    sw = (ln[0] @ wb[0]).reshape(1, Co).astype(jnp.float32)
    ct = (ln[1] @ wb[0] + wb[1]).reshape(1, Co).astype(jnp.float32)
    budget = 16 * 2**20
    th = _pick_tile(H2, max(1, budget // max(1, 2 * Wd * C * dt.itemsize * 2)))
    grid = (Z, H2 // th)

    def const2(*_):
        return (0, 0)

    return pl.pallas_call(
        _down_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, 2, W2, 2, C), lambda z, h: (z, h, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C), lambda z, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C, Co), lambda z, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W2, Co), lambda z, h: (z, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, H2, W2, Co), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * Z * H2 * W2 * 4 * C * Co,
            bytes_accessed=Z * H * Wd * C * dt.itemsize
            + Z * H2 * W2 * Co * dt.itemsize,
            transcendentals=0,
        ),
    )(x6, s4, w4, sw, ct)


# --- UpSample: (Z, H', W', C) → (Z, 2H', 2W', Co) ---


def _up_kernel(x_ref, w_ref, b_ref, lns_ref, lnb_ref, o_ref):
    _, th, tw, C = x_ref.shape
    Co = o_ref.shape[-1]
    dt = x_ref.dtype
    v = x_ref[0].reshape(th * tw, C)
    m = jax.lax.dot_general(
        v, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = (m + b_ref[...].astype(jnp.float32)).astype(dt)  # (th·tw, 4Co)
    # LayerNorm per Co-lane group; the 4 groups are the 2×2 expansion.
    # Parity dims LEAD the output array — Mosaic supports leading
    # scalar-index stores, but not the interspersed-singleton shape cast
    # an (…, 2, …, 2, …) store would need.
    for i in range(2):
        for j in range(2):
            g = 2 * i + j
            sl = m[:, g * Co : (g + 1) * Co]
            o = _layernorm_f32(sl, lns_ref, lnb_ref).astype(dt)
            o_ref[i, j, 0] = o.reshape(th, tw, Co)


def reference_upsample(x, wb, ln):
    """XLA composition: Dense(4Co) → 2×2 expand → LayerNorm
    (models/pangu.py UpSample semantics, without the row crop)."""
    Z, H, Wd, C = x.shape
    Co = wb[0].shape[1] // 4
    m = x @ wb[0].astype(x.dtype) + wb[1].astype(x.dtype)
    m = m.reshape(Z, H, Wd, 2, 2, Co)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(Z, 2 * H, 2 * Wd, Co)
    return _layernorm_f32(
        m, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
    ).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _up_vjp(x, wb, ln, interpret):
    return _up_impl(x, wb, ln, interpret)


def _up_fwd(x, wb, ln, interpret):
    return _up_impl(x, wb, ln, interpret), (x, wb, ln)


def _up_bwd(interpret, res, g):
    _, vjp = jax.vjp(reference_upsample, *res)
    return vjp(g)


_up_vjp.defvjp(_up_fwd, _up_bwd)


def fused_upsample(x, wb, ln, interpret: bool = False):
    """Dense(C→4Co) + 2×2 patch expand + LayerNorm in one HBM pass.

    x: (Z, H, W, C); wb: ((C, 4Co), (4Co,)); ln: (scale, bias) over Co.
    Returns (Z, 2H, 2W, Co) — caller crops rows.
    """
    return _up_vjp(x, wb, ln, interpret)


def _up_impl(x, wb, ln, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    Z, H, Wd, C = x.shape
    Co = wb[0].shape[1] // 4
    dt = x.dtype
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, 4 * Co).astype(jnp.float32)
    lns = ln[0].reshape(1, Co)
    lnb = ln[1].reshape(1, Co)
    budget = 16 * 2**20
    th = _pick_tile(H, max(1, budget // max(1, 4 * Wd * Co * dt.itemsize * 2)))
    grid = (Z, H // th)

    def const2(*_):
        return (0, 0)

    o4 = pl.pallas_call(
        _up_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, Wd, C), lambda z, h: (z, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 4 * Co), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * Co), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, 2, 1, th, Wd, Co), lambda z, h: (0, 0, z, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, 2, Z, H, Wd, Co), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * Z * H * Wd * C * 4 * Co,
            bytes_accessed=Z * H * Wd * C * dt.itemsize
            + Z * 4 * H * Wd * Co * dt.itemsize,
            transcendentals=0,
        ),
    )(x, w, b, lns, lnb)
    # one XLA interleave copy: (2,2,Z,H,W,Co) → (Z,H,2,W,2,Co) ≡ (Z,2H,2W,Co)
    out = o4.transpose(2, 3, 0, 4, 1, 5).reshape(Z, 2 * H, 2 * Wd, Co)
    return out
