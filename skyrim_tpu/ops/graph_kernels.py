"""Fused bipartite message-passing stages (Pallas) — GraphCast decoder/encoder.

Pallas custom-calls are fusion barriers for XLA, so kernel boundaries
must not cut through elementwise chains: the first fused-MLP attempt
left the h-assembly adds and residuals as standalone HBM passes and the
chunk scans' operand un-stacking as multi-GB dynamic-slices (~40 ms of
the GraphCast step, measured with utils/op_stats).  These kernels move
the WHOLE message stage inside one pallas_call — tiles bound live
memory, so the lax.scan chunking disappears along with its slicing:

- ``fused_fixed_degree_messages`` (mesh→grid): per row (grid point),
  sum over the fixed-degree slots of LN(Dense(swish(wide_k + bias_k +
  a_dst + b0))) — inputs are the wide face-gathered source latents and
  the wide cached bias, all math on (R, L) lane slices.
- ``fused_block_messages`` (grid→mesh): per block-plan block, message
  MLP on pre-gathered source rows + cached bias, then the one-hot
  segment aggregation as an in-kernel (SB, M) @ (M, L) matmul.

Both differentiate through XLA reference compositions (custom VJP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyrim_tpu.ops.fused_block import _layernorm_f32


def _finish_f32(h, b0, w, b, lns, lnb, dt):
    """swish(h + b0) → Dense → LayerNorm (FactoredEdgeMLP.finish)."""
    h = h + b0
    h = (h * jax.lax.logistic(h)).astype(dt)
    y = jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = (y + b).astype(dt)
    return _layernorm_f32(y, lns, lnb).astype(dt)


# --- mesh→grid: fixed-degree, slot-major ---


def _m2g_kernel(wide_ref, bias_ref, ad_ref, b0_ref, w_ref, b_ref,
                lns_ref, lnb_ref, o_ref, *, deg):
    dt = wide_ref.dtype
    R, KL = wide_ref.shape
    L = KL // deg
    ad = ad_ref[...].astype(jnp.float32)
    b0 = b0_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    agg = None
    for k in range(deg):
        h = (
            wide_ref[:, k * L : (k + 1) * L].astype(jnp.float32)
            + bias_ref[:, k * L : (k + 1) * L].astype(jnp.float32)
            + ad
        )
        m = _finish_f32(h, b0, w_ref[...], b, lns_ref, lnb_ref, dt)
        agg = m if agg is None else agg + m
    o_ref[...] = agg


def reference_fixed_degree_messages(wide, bias_w, ad, b0, wb, ln, deg):
    L = wide.shape[1] // deg
    dt = wide.dtype
    agg = None
    for k in range(deg):
        h = wide[:, k * L : (k + 1) * L] + bias_w[:, k * L : (k + 1) * L] + ad
        h = h + b0.astype(dt)
        h = (h.astype(jnp.float32) * jax.lax.logistic(h.astype(jnp.float32))).astype(dt)
        y = h @ wb[0].astype(dt) + wb[1].astype(dt)
        m = _layernorm_f32(
            y, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
        ).astype(dt)
        agg = m if agg is None else agg + m
    return agg


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _m2g_vjp(wide, bias_w, ad, b0, wb, ln, deg, interpret):
    return _m2g_impl(wide, bias_w, ad, b0, wb, ln, deg, interpret)


def _m2g_fwd(wide, bias_w, ad, b0, wb, ln, deg, interpret):
    out = _m2g_impl(wide, bias_w, ad, b0, wb, ln, deg, interpret)
    return out, (wide, bias_w, ad, b0, wb, ln)


def _m2g_bwd(deg, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: reference_fixed_degree_messages(*a, deg), *res
    )
    return vjp(g)


_m2g_vjp.defvjp(_m2g_fwd, _m2g_bwd)


def fused_fixed_degree_messages(wide, bias_w, ad, b0, wb, ln, deg,
                                interpret: bool = False):
    """Aggregate fixed-degree messages per row: Σ_k finish(wide_k +
    bias_k + ad).  wide/bias_w: (N, deg·L); ad: (N, L); b0: (L,);
    wb: ((L, L), (L,)); ln over L.  Returns (N, L)."""
    return _m2g_vjp(wide, bias_w, ad, b0, wb, ln, deg, interpret)


def _m2g_impl(wide, bias_w, ad, b0, wb, ln, deg, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    N, KL = wide.shape
    L = KL // deg
    dt = wide.dtype
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, L)
    b0r = b0.reshape(1, L)
    lns = ln[0].reshape(1, L)
    lnb = ln[1].reshape(1, L)
    R = 1024
    grid = (-(-N // R),)

    def const(_):
        return (0, 0)

    return pl.pallas_call(
        partial(_m2g_kernel, deg=deg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, KL), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, KL), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, L), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * deg * L * L,
            bytes_accessed=N * (2 * KL + 2 * L) * dt.itemsize,
            transcendentals=N * deg * L,
        ),
    )(wide, bias_w, ad, b0r, w, b, lns, lnb)


# --- grid→mesh: block-plan messages + one-hot aggregation ---


def _g2m_kernel(src_ref, bias_ref, local_ref, b0_ref, w_ref, b_ref,
                lns_ref, lnb_ref, o_ref):
    dt = src_ref.dtype
    _, M, L = src_ref.shape
    SB = o_ref.shape[1]
    h = src_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    m = _finish_f32(
        h, b0_ref[...].astype(jnp.float32), w_ref[...],
        b_ref[...].astype(jnp.float32), lns_ref, lnb_ref, dt,
    )  # (M, L)
    local = local_ref[0, 0]  # (M,) int32; == SB ⇒ padding row
    iota = jax.lax.broadcasted_iota(jnp.int32, (SB, M), 0)
    oh = (local[None, :] == iota).astype(dt)
    o_ref[0] = jax.lax.dot_general(
        oh, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dt)


def reference_block_messages(src_rows, bias_b, local, b0, wb, ln, SB):
    B, M, L = src_rows.shape
    dt = src_rows.dtype
    h = src_rows + bias_b + b0.astype(dt)
    hf = h.astype(jnp.float32)
    h = (hf * jax.lax.logistic(hf)).astype(dt)
    y = h @ wb[0].astype(dt) + wb[1].astype(dt)
    m = _layernorm_f32(
        y, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
    ).astype(dt)
    iota = jnp.arange(SB, dtype=local.dtype)
    oh = (local[:, None, :] == iota[None, :, None]).astype(dt)
    return jnp.einsum("bsm,bmd->bsd", oh, m)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _g2m_vjp(src_rows, bias_b, local, b0, wb, ln, SB, interpret):
    return _g2m_impl(src_rows, bias_b, local, b0, wb, ln, SB, interpret)


def _g2m_fwd(src_rows, bias_b, local, b0, wb, ln, SB, interpret):
    out = _g2m_impl(src_rows, bias_b, local, b0, wb, ln, SB, interpret)
    return out, (src_rows, bias_b, local, b0, wb, ln)


def _g2m_bwd(SB, interpret, res, g):
    src_rows, bias_b, local, b0, wb, ln = res
    _, vjp = jax.vjp(
        lambda s, bb, b0_, wb_, ln_: reference_block_messages(
            s, bb, local, b0_, wb_, ln_, SB
        ),
        src_rows, bias_b, b0, wb, ln,
    )
    gs, gbb, gb0, gwb, gln = vjp(g)
    return gs, gbb, None, gb0, gwb, gln


_g2m_vjp.defvjp(_g2m_fwd, _g2m_bwd)


def fused_block_messages(src_rows, bias_b, local, b0, wb, ln, SB,
                         interpret: bool = False):
    """Per block: finish(src + bias) then one-hot segment aggregation.

    src_rows/bias_b: (B, M, L); local: (B, M) int32 block-local segment
    ids (== SB ⇒ padding); returns (B, SB, L) block aggregates (unpack
    with the plan's ``unpack`` gather outside)."""
    return _g2m_vjp(src_rows, bias_b, local, b0, wb, ln, SB, interpret)


def _g2m_impl(src_rows, bias_b, local, b0, wb, ln, SB, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    B, M, L = src_rows.shape
    dt = src_rows.dtype
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, L)
    b0r = b0.reshape(1, L)
    lns = ln[0].reshape(1, L)
    lnb = ln[1].reshape(1, L)

    def const(_):
        return (0, 0)

    return pl.pallas_call(
        _g2m_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, M) so the block's trailing dims equal the array's
            # (Mosaic requires trailing block dims 8/128-divisible or full)
            pl.BlockSpec((1, 1, M), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SB, L), lambda b_: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SB, L), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * L * L + 2 * B * SB * M * L,
            bytes_accessed=2 * B * M * L * dt.itemsize
            + B * SB * L * dt.itemsize,
            transcendentals=B * M * L,
        ),
    )(src_rows, bias_b, local.reshape(B, 1, M), b0r, w, b, lns, lnb)
