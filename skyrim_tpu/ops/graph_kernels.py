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
- ``fused_round_messages`` (processor): one whole multimesh round per
  block — dst expansion, edge-part GEMM, finish MLP, residual edge
  update, and segment aggregation in a single HBM pass.  The XLA
  composition materialized each stage ((B, M, L) ≈ 338 MB apiece,
  ~4.05 GB/round × 16 rounds = 64.9 GB/step measured with
  utils/hlo_bytes); this kernel's per-round traffic is the edge state
  in/out + the pre-gathered source rows + two (B, SB, L) node stagings
  ≈ 1.1 GB.

All differentiate through XLA reference compositions (custom VJP).
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


# --- processor: whole multimesh round, one HBM pass per edge block ---


def _round_kernel(edges_ref, gsrc_ref, staged_ref, local_ref, we_ref,
                  b0_ref, w_ref, b_ref, lns_ref, lnb_ref,
                  ne_ref, agg_ref):
    dt = edges_ref.dtype
    _, M, L = edges_ref.shape
    SB = agg_ref.shape[1]
    e = edges_ref[0]  # (M, L)
    local = local_ref[0, 0]  # (M,) int32; == SB ⇒ padding row
    iota = jax.lax.broadcasted_iota(jnp.int32, (SB, M), 0)
    oh = (local[None, :] == iota).astype(dt)  # (SB, M)
    # dst-side expansion: (M, SB) contraction against the staged
    # per-segment rows — a matmul, not a gather
    expand = jax.lax.dot_general(
        oh, staged_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, L) f32
    h = (
        jax.lax.dot_general(
            e, we_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + gsrc_ref[0].astype(jnp.float32)
        + expand
    )
    m = _finish_f32(
        h, b0_ref[...].astype(jnp.float32), w_ref[...],
        b_ref[...].astype(jnp.float32), lns_ref, lnb_ref, dt,
    )  # (M, L)
    ne = e + m
    ne_ref[0] = ne
    agg_ref[0] = jax.lax.dot_general(
        oh, ne, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)


def reference_round_messages(edges, gsrc, staged, local, we, b0, wb, ln, SB):
    """XLA composition of one processor round's edge-block math."""
    B, M, L = edges.shape
    dt = edges.dtype
    iota = jnp.arange(SB, dtype=local.dtype)
    oh = (local[:, None, :] == iota[None, :, None]).astype(dt)  # (B, SB, M)
    expand = jnp.einsum("bsm,bsd->bmd", oh, staged)
    h = edges @ we.astype(dt) + gsrc + expand
    h = h + b0.astype(dt)
    hf = h.astype(jnp.float32)
    h = (hf * jax.lax.logistic(hf)).astype(dt)
    y = h @ wb[0].astype(dt) + wb[1].astype(dt)
    m = _layernorm_f32(
        y, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
    ).astype(dt)
    ne = edges + m
    agg = jnp.einsum("bsm,bmd->bsd", oh, ne)
    return ne, agg


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _round_vjp(edges, gsrc, staged, local, we, b0, wb, ln, SB, interpret):
    return _round_impl(edges, gsrc, staged, local, we, b0, wb, ln, SB,
                       interpret)


def _round_fwd(edges, gsrc, staged, local, we, b0, wb, ln, SB, interpret):
    out = _round_impl(edges, gsrc, staged, local, we, b0, wb, ln, SB,
                      interpret)
    return out, (edges, gsrc, staged, local, we, b0, wb, ln)


def _round_bwd(SB, interpret, res, g):
    edges, gsrc, staged, local, we, b0, wb, ln = res
    _, vjp = jax.vjp(
        lambda e, s, st, w_, b0_, wb_, ln_: reference_round_messages(
            e, s, st, local, w_, b0_, wb_, ln_, SB
        ),
        edges, gsrc, staged, we, b0, wb, ln,
    )
    ge, gs, gst, gwe, gb0, gwb, gln = vjp(g)
    return ge, gs, gst, None, gwe, gb0, gwb, gln


_round_vjp.defvjp(_round_fwd, _round_bwd)


def fused_round_messages(edges, gsrc, staged, local, we, b0, wb, ln, SB,
                         interpret: bool = False):
    """One multimesh processor round over dst-sorted edge blocks.

    edges/gsrc: (B, M, L) — edge latents and pre-gathered src-part rows;
    staged: (B, SB, L) dst-part rows per block segment range;
    local: (B, M) int32 block-local segment ids (== SB ⇒ padding);
    we: (L, L) edge-part kernel slice; b0: (L,) first-layer bias;
    wb: ((L, L), (L,)) Dense₁; ln: (scale, bias).
    Returns (new_edges (B, M, L), agg (B, SB, L))."""
    return _round_vjp(edges, gsrc, staged, local, we, b0, wb, ln, SB,
                      interpret)


def _round_impl(edges, gsrc, staged, local, we, b0, wb, ln, SB, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    B, M, L = edges.shape
    dt = edges.dtype
    we_ = we.astype(dt)
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, L)
    b0r = b0.reshape(1, L)
    lns = ln[0].reshape(1, L)
    lnb = ln[1].reshape(1, L)

    def const(_):
        return (0, 0)

    return pl.pallas_call(
        _round_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SB, L), lambda b_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, L), dt),
            jax.ShapeDtypeStruct((B, SB, L), dt),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * L * (2 * L + 2 * SB),
            bytes_accessed=B * (3 * M + 2 * SB) * L * 2,
            transcendentals=B * M * L,
        ),
    )(edges, gsrc, staged, local.reshape(B, 1, M), we_, b0r, w, b,
      lns, lnb)


# --- mesh→grid, 2D-tiled: in-kernel unique-face expansion ---


def _m2g_tiled_kernel(uniq_ref, local_ref, bias_ref, ad_ref, b0_ref,
                      w_ref, b_ref, lns_ref, lnb_ref, o_ref, *, deg):
    dt = uniq_ref.dtype
    th, tw, KL = bias_ref.shape
    U = uniq_ref.shape[2]
    L = KL // deg
    R = th * tw
    # one-hot built in (th, tw, U) layout — a flat (R,) reshape of the
    # (th, tw) local block would merge its LANE dim into sublanes,
    # which Mosaic cannot shape-cast; (th, tw, U) → (R, U) only merges
    # leading (batch/sublane) dims and is supported
    iota = jax.lax.broadcasted_iota(jnp.int32, (th, tw, U), 2)
    oh = (local_ref[...][:, :, None] == iota).astype(dt).reshape(R, U)
    wide = jax.lax.dot_general(
        oh, uniq_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, KL) f32 — the per-point face latents, expanded on the MXU
    bias = bias_ref[...].reshape(R, KL)
    ad = ad_ref[...].reshape(R, L).astype(jnp.float32)
    b0 = b0_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    agg = None
    for k in range(deg):
        h = (
            wide[:, k * L : (k + 1) * L]
            + bias[:, k * L : (k + 1) * L].astype(jnp.float32)
            + ad
        )
        m = _finish_f32(h, b0, w_ref[...], b, lns_ref, lnb_ref, dt)
        agg = m if agg is None else agg + m
    o_ref[...] = agg.reshape(th, tw, L)


def reference_m2g_tiled(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln, deg,
                        th, tw):
    """XLA composition: per-point face row from the tile tables, then
    the fixed-degree message sum (reference_fixed_degree_messages)."""
    H, W = local_hw.shape
    KL = bias_hw.shape[-1]
    ti = jnp.arange(H) // th
    tj = jnp.arange(W) // tw
    wide = uniq[ti[:, None], tj[None, :], local_hw]  # (H, W, KL)
    agg = reference_fixed_degree_messages(
        wide.reshape(H * W, KL),
        bias_hw.reshape(H * W, KL),
        ad_hw.reshape(H * W, -1),
        b0, wb, ln, deg,
    )
    return agg.reshape(H, W, -1)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _m2g_tiled_vjp(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln, deg, th, tw,
                   interpret):
    return _m2g_tiled_impl(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln,
                           deg, th, tw, interpret)


def _m2g_tiled_fwd(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln, deg, th, tw,
                   interpret):
    out = _m2g_tiled_impl(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln,
                          deg, th, tw, interpret)
    return out, (uniq, local_hw, bias_hw, ad_hw, b0, wb, ln)


def _m2g_tiled_bwd(deg, th, tw, interpret, res, g):
    uniq, local_hw, bias_hw, ad_hw, b0, wb, ln = res
    _, vjp = jax.vjp(
        lambda u, bb, ad_, b0_, wb_, ln_: reference_m2g_tiled(
            u, local_hw, bb, ad_, b0_, wb_, ln_, deg, th, tw
        ),
        uniq, bias_hw, ad_hw, b0, wb, ln,
    )
    gu, gbb, gad, gb0, gwb, gln = vjp(g)
    return gu, None, gbb, gad, gb0, gwb, gln


_m2g_tiled_vjp.defvjp(_m2g_tiled_fwd, _m2g_tiled_bwd)


def fused_m2g_tiled(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln, deg,
                    th, tw, interpret: bool = False):
    """Fixed-degree mesh→grid messages over (th, tw) spatial tiles.

    uniq: (TH, TW, U, deg·L) per-tile unique wide face latents
    (gathered outside — ~0.6 GB vs 3.2 GB for the flat row-gather);
    local_hw: (H, W) int32 per-point index into its tile's rows;
    bias_hw: (H, W, deg·L) cached static edge bias; ad_hw: (H, W, L)
    dst-part rows.  Returns (H, W, L) aggregated messages."""
    return _m2g_tiled_vjp(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln,
                          deg, th, tw, interpret)


def _m2g_tiled_impl(uniq, local_hw, bias_hw, ad_hw, b0, wb, ln, deg,
                    th, tw, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    H, W, KL = bias_hw.shape
    TH, TW, U, _ = uniq.shape
    L = KL // deg
    dt = uniq.dtype
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, L)
    b0r = b0.reshape(1, L)
    lns = ln[0].reshape(1, L)
    lnb = ln[1].reshape(1, L)

    def const(*_):
        return (0, 0)

    return pl.pallas_call(
        partial(_m2g_tiled_kernel, deg=deg),
        grid=(TH, TW),
        in_specs=[
            pl.BlockSpec((1, 1, U, KL), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, KL), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, L), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tw, L), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, L), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * (U * KL + deg * L * L),
            bytes_accessed=(H * W * (2 * KL + 2 * L)
                            + TH * TW * U * KL) * dt.itemsize,
            transcendentals=H * W * deg * L,
        ),
    )(uniq, local_hw, bias_hw, ad_hw, b0r, w, b, lns, lnb)


# --- grid→mesh, 2D-tiled grid-major: no source gather at all ---


def _g2m_tiled_kernel(asrc_ref, bias_ref, local_ref, b0_ref, w_ref,
                      b_ref, lns_ref, lnb_ref, o_ref, *, D):
    dt = asrc_ref.dtype
    th, tw, L = asrc_ref.shape
    U = o_ref.shape[2]
    R = th * tw
    a = asrc_ref[...].reshape(R, L).astype(jnp.float32)
    b0 = b0_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    acc = jnp.zeros((U, L), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (U, R), 0)
    for k in range(D):
        h = a + bias_ref[:, :, k * L : (k + 1) * L].reshape(R, L).astype(
            jnp.float32
        )
        m = _finish_f32(h, b0, w_ref[...], b, lns_ref, lnb_ref, dt)
        # (U, R) one-hot of this slot's local dst; empty slots (== U)
        # match no row and never aggregate
        lk = local_ref[0, 0, k]  # (R,) int32
        oh = (lk[None, :] == iota).astype(dt)
        acc = acc + jax.lax.dot_general(
            oh, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, 0] = acc.astype(dt)


def reference_g2m_tiled(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U,
                        th, tw):
    """XLA composition of the grid-major encoder messages + per-tile
    one-hot aggregation.  ``local_t``: (TH, TW, D, th·tw) tile-flat slot
    ids.  Returns (TH, TW, U, L) tile partials."""
    H, W, L = asrc_hw.shape
    dt = asrc_hw.dtype
    TH, TW = H // th, W // tw
    accs = []
    for k in range(D):
        h = asrc_hw + bias_hw[:, :, k * L : (k + 1) * L] + b0.astype(dt)
        hf = h.astype(jnp.float32)
        h = (hf * jax.lax.logistic(hf)).astype(dt)
        y = h @ wb[0].astype(dt) + wb[1].astype(dt)
        m = _layernorm_f32(
            y.reshape(H * W, L), ln[0].reshape(1, -1), ln[1].reshape(1, -1)
        ).astype(dt).reshape(H, W, L)
        m_t = m.reshape(TH, th, TW, tw, L).transpose(0, 2, 1, 3, 4).reshape(
            TH, TW, th * tw, L
        )
        iota = jnp.arange(U, dtype=local_t.dtype)
        oh = (local_t[:, :, k, :, None] == iota).astype(dt)  # (TH,TW,R,U)
        accs.append(jnp.einsum("ijru,ijrl->ijul", oh, m_t))
    return sum(accs)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _g2m_tiled_vjp(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U, th, tw,
                   interpret):
    return _g2m_tiled_impl(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U,
                           th, tw, interpret)


def _g2m_tiled_fwd(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U, th, tw,
                   interpret):
    out = _g2m_tiled_impl(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U,
                          th, tw, interpret)
    return out, (asrc_hw, bias_hw, local_t, b0, wb, ln)


def _g2m_tiled_bwd(D, U, th, tw, interpret, res, g):
    asrc_hw, bias_hw, local_t, b0, wb, ln = res
    _, vjp = jax.vjp(
        lambda a, bb, b0_, wb_, ln_: reference_g2m_tiled(
            a, bb, local_t, b0_, wb_, ln_, D, U, th, tw
        ),
        asrc_hw, bias_hw, b0, wb, ln,
    )
    ga, gbb, gb0, gwb, gln = vjp(g)
    return ga, gbb, None, gb0, gwb, gln


_g2m_tiled_vjp.defvjp(_g2m_tiled_fwd, _g2m_tiled_bwd)


def fused_g2m_tiled(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U,
                    th, tw, interpret: bool = False):
    """Grid-major grid→mesh messages over (th, tw) spatial tiles.

    asrc_hw: (H, W, L) CONTIGUOUS per-point src-part rows (no gather);
    bias_hw: (H, W, D·L) cached static per-slot bias (edge embedding +
    folded dst mesh-embed transform); local_t: (TH, TW, D, th·tw)
    int32 tile-flat slot → tile-local dst index (== U ⇒ empty).  Returns (TH, TW, U, L) tile
    partials — combine with the plan's static ``combine_idx`` gather +
    segment sum."""
    return _g2m_tiled_vjp(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U,
                          th, tw, interpret)


def _g2m_tiled_impl(asrc_hw, bias_hw, local_t, b0, wb, ln, D, U, th, tw,
                    interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    H, W, L = asrc_hw.shape
    if H % th or W % tw:
        raise ValueError(
            f"g2m tiles must cover the grid exactly ({H}x{W} vs {th}x{tw})"
        )
    TH, TW = H // th, W // tw
    dt = asrc_hw.dtype
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, L)
    b0r = b0.reshape(1, L)
    lns = ln[0].reshape(1, L)
    lnb = ln[1].reshape(1, L)

    def const(*_):
        return (0, 0)

    return pl.pallas_call(
        partial(_g2m_tiled_kernel, D=D),
        grid=(TH, TW),
        in_specs=[
            pl.BlockSpec((th, tw, L), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, D * L), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, th * tw), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, U, L), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TH, TW, U, L), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * D * (L * L + U * L),
            bytes_accessed=H * W * (D + 2) * L * 2 + TH * TW * U * L * 2,
            transcendentals=H * W * D * L,
        ),
    )(asrc_hw, bias_hw, local_t, b0r, w, b, lns, lnb)
