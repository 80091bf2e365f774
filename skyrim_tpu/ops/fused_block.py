"""Fully-fused Swin/Pangu transformer block (Pallas) — one HBM pass.

Pangu's step is HBM-bound: XLA's per-block chain (LayerNorm → qkv GEMM →
window attention → proj → residual → LayerNorm → 4× MLP → residual)
round-trips the full activation through HBM ~30× per block (measured
9.3 TFLOP vs 91 GB accessed per step → a ~112 ms bandwidth floor at v5e
HBM speed, with compute only ~47 ms).  This kernel runs the WHOLE block
per window tile in VMEM: the activation is read once and written once
(2× traffic instead of ~30×); every weight matrix (qkv, proj, both MLP
layers — ≤3.5 MB even at 2C=384) rides along as a constant-index block
that Pallas keeps resident across grid steps.

Numerics match the XLA path (models/pangu.py PanguBlock, models/fuxi.py
SwinBlock2D): LayerNorm statistics in f32 with flax's fast variance
(E[x²]−E[x]², clipped at 0, eps 1e-6), matmul inputs bf16 with f32
accumulation, softmax in f32, gelu (tanh approximation) on the compute
dtype.

The shifted-window roll stays OUTSIDE the kernel: LayerNorm/MLP/residual
are per-token and attention sees the same windows either way, so the
whole block commutes with the roll — callers roll the input, run the
unshifted block with the shift mask, and roll back (two cheap fused
copies instead of in-kernel wraparound reads).

``LNParams``/``DenseParams`` are flax param *holders*: they declare (or,
at apply time, fetch) parameters under the exact names/shapes/inits that
``nn.LayerNorm``/``nn.Dense`` would create, so the fused path shares one
checkpoint tree with the XLA path (init always runs the XLA path via
``is_initializing``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class DenseParams(nn.Module):
    """kernel/bias params shaped+named exactly like ``nn.Dense``."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return k, b


class LNParams(nn.Module):
    """scale/bias params shaped+named exactly like ``nn.LayerNorm``."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param(
            "scale", nn.initializers.ones_init(), (features,), jnp.float32
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (features,), jnp.float32
        )
        return s, b


def _layernorm_f32(t, scale, bias):
    """flax LayerNorm numerics: f32 stats, fast variance, eps 1e-6."""
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(tf * tf, axis=-1, keepdims=True) - mu * mu, 0.0)
    h = (tf - mu) * jax.lax.rsqrt(var + 1e-6)
    return h * scale[0].astype(jnp.float32) + bias[0].astype(jnp.float32)


def _fused_block_kernel(
    x_ref,
    ln1s_ref, ln1b_ref,
    qw_ref, qb_ref,
    bias_ref, mask_ref,
    pw_ref, pb_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref,
    w2_ref, b2_ref,
    o_ref,
    *, has_mask,
):
    wz, wh, tww, C = x_ref.shape
    heads = bias_ref.shape[1]
    wlen = bias_ref.shape[2]
    ww = wlen // (wz * wh)
    tw = tww // ww
    hd = C // heads
    scale = hd**-0.5
    dt = x_ref.dtype

    # window layout: (wz, wh, tw·ww, C) → tokens (tw·wlen, C)
    xb = x_ref[...].reshape(wz, wh, tw, ww, C)
    xw = xb.transpose(2, 0, 1, 3, 4).reshape(tw * wlen, C)

    # --- attention half ---
    h = _layernorm_f32(xw, ln1s_ref, ln1b_ref).astype(dt)
    qkv = jax.lax.dot_general(
        h, qw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + qb_ref[...].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(tw, wlen, 3 * C)
    mask = mask_ref[0, 0] if has_mask else None

    def scores(hh):
        q = qkv[:, :, hh * hd : (hh + 1) * hd]
        k = qkv[:, :, C + hh * hd : C + (hh + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0, hh][None].astype(jnp.float32)
        # unshifted blocks carry no mask — adding broadcast zeros would
        # still cost a full VPU pass over the score matrix
        return s + mask[None] if has_mask else s

    # software-pipelined head loop: head h+1's QKᵀ (MXU) is issued
    # before head h's softmax (VPU) so the scheduler can overlap them —
    # the kernel is VPU-bound at C=192
    outs = []
    s_next = scores(0)
    for hh in range(heads):
        s = s_next
        if hh + 1 < heads:
            s_next = scores(hh + 1)
        v = qkv[:, :, 2 * C + hh * hd : 2 * C + (hh + 1) * hd]
        # softmax with the normalization folded into the AV output:
        # dividing (…, wlen, hd) costs wlen/hd≈4.5× fewer VPU elements
        # than dividing the score matrix
        e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        av = jax.lax.dot_general(
            e.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append(av / jnp.sum(e, axis=-1, keepdims=True))
    o = jnp.concatenate(outs, axis=-1).astype(dt).reshape(tw * wlen, C)
    o = jax.lax.dot_general(
        o, pw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o = (o + pb_ref[...].astype(jnp.float32)).astype(dt)
    x1 = xw + o

    # --- MLP half ---
    h2 = _layernorm_f32(x1, ln2s_ref, ln2b_ref).astype(dt)
    m = jax.lax.dot_general(
        h2, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = nn.gelu((m + b1_ref[...].astype(jnp.float32)).astype(dt))
    y = jax.lax.dot_general(
        m, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b2_ref[...].astype(jnp.float32)).astype(dt)
    x2 = x1 + y

    x2 = x2.reshape(tw, wz, wh, ww, C).transpose(1, 2, 0, 3, 4)
    o_ref[...] = x2.reshape(wz, wh, tww, C)


def reference_swin_block(
    x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads
):
    """Pure-XLA composition matching the fused kernel — the parity
    reference and the backward path of the custom VJP below."""
    from skyrim_tpu.ops import windows as W
    from skyrim_tpu.ops.flash_window_attention import (
        reference_window_attention_qkv,
    )

    dt = x.dtype
    Z, H, Wd, C = x.shape
    ln1s, ln1b = (p.reshape(1, C) for p in ln1)
    ln2s, ln2b = (p.reshape(1, C) for p in ln2)

    h = _layernorm_f32(x, ln1s, ln1b).astype(dt)
    qkv = h @ qkv_wb[0].astype(dt) + qkv_wb[1].astype(dt)
    parts = W.window_partition(qkv, window)
    nw = Wd // window[2]
    o = reference_window_attention_qkv(parts, bias, mask, nw, heads)
    o = W.window_reverse(o, window, (Z, H, Wd)).astype(dt)
    o = o @ proj_wb[0].astype(dt) + proj_wb[1].astype(dt)
    x1 = x + o
    h2 = _layernorm_f32(x1, ln2s, ln2b).astype(dt)
    m = nn.gelu(h2 @ mlp_wb[0].astype(dt) + mlp_wb[1].astype(dt))
    return x1 + m @ mlp_wb[2].astype(dt) + mlp_wb[3].astype(dt)


def fused_swin_block_4d(
    x: jax.Array,  # (Z, H, W, C) window-padded activation (pre-rolled if shifted)
    ln1: tuple[jax.Array, jax.Array],  # LayerNorm_0 (scale, bias), (C,)
    qkv_wb: tuple[jax.Array, jax.Array],  # ((C, 3C), (3C,))
    bias: jax.Array,  # (n_types, heads, wlen, wlen) or (heads, wlen, wlen)
    mask: jax.Array | None,  # (nz, nh, wlen, wlen) or None
    proj_wb: tuple[jax.Array, jax.Array],  # ((C, C), (C,))
    ln2: tuple[jax.Array, jax.Array],  # LayerNorm_1 (scale, bias)
    mlp_wb: tuple[jax.Array, ...],  # (W1 (C, hidden), b1, W2 (hidden, C), b2)
    window: tuple[int, int, int],
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Whole pre-norm window-attention block in one HBM pass.

    Equivalent to: x + proj(attn(LN1(x))) followed by + MLP(LN2(·)),
    with windowing fused into the BlockSpec tiling (no partition/reverse
    relayouts).  Returns (Z, H, W, C) in the input layout/dtype.

    Differentiable: reverse-mode runs through the XLA reference
    composition (``reference_swin_block``), so the finetune trainer can
    take gradients with the fused forward.
    """
    return _fused_swin_block_vjp(
        x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb,
        window, heads, interpret,
    )


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_swin_block_vjp(
    x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads, interpret
):
    return _fused_swin_block_impl(
        x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb,
        window, heads, interpret,
    )


def _fused_swin_block_fwd(
    x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads, interpret
):
    out = _fused_swin_block_impl(
        x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb,
        window, heads, interpret,
    )
    return out, (x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb)


def _fused_swin_block_bwd(window, heads, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *args: reference_swin_block(*args, window, heads), *res
    )
    return vjp(g)


_fused_swin_block_vjp.defvjp(_fused_swin_block_fwd, _fused_swin_block_bwd)


def _fused_swin_block_impl(
    x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads, interpret
):
    interpret = interpret or jax.default_backend() == "cpu"
    Z, H, Wd, C = x.shape
    wz, wh, ww = window
    wlen = wz * wh * ww
    nz, nh, nw = Z // wz, H // wh, Wd // ww
    hidden = mlp_wb[0].shape[1]
    if bias.ndim == 3:
        bias = bias[None]
    n_types = bias.shape[0]
    assert n_types in (1, nz * nh)
    has_mask = mask is not None
    if mask is None:
        mz = mh = 1
        mask = jnp.zeros((1, 1, wlen, wlen), jnp.float32)  # unread dummy
    else:
        mz, mh = mask.shape[:2]
        assert (mz, mh) == (nz, nh)

    dt = x.dtype
    ln1s, ln1b = (p.reshape(1, C) for p in ln1)
    ln2s, ln2b = (p.reshape(1, C) for p in ln2)
    qw = qkv_wb[0].astype(dt)
    qb = qkv_wb[1].reshape(1, 3 * C).astype(jnp.float32)
    pw = proj_wb[0].astype(dt)
    pb = proj_wb[1].reshape(1, C).astype(jnp.float32)
    w1 = mlp_wb[0].astype(dt)
    b1 = mlp_wb[1].reshape(1, hidden).astype(jnp.float32)
    w2 = mlp_wb[2].astype(dt)
    b2 = mlp_wb[3].reshape(1, C).astype(jnp.float32)

    import os

    isz = x.dtype.itemsize
    weights_b = (qw.size + pw.size + w1.size + w2.size) * isz
    tw_env = os.environ.get("SKYRIM_ATTN_TW")
    tw = None
    if tw_env and nw % int(tw_env) == 0:
        tw = int(tw_env)
    else:
        # same tile heuristic as fused_window_attention_4d, with the MLP
        # intermediate and resident weights added to the VMEM budget.
        # Wide trunks (FuXi's C=1536 → ~57 MiB of resident weights alone)
        # cannot keep the whole block in VMEM — measured: the kernel then
        # runs minutes/step vs ~0.5 s on the XLA path, so they take the
        # graceful fallback below (at that width the block is MXU-bound
        # and XLA's GEMM pipeline is the right tool; the fused kernel's
        # HBM-pass savings only matter for bandwidth-bound widths).
        budget = int(os.environ.get("SKYRIM_ATTN_VMEM_MB", "48")) * 2**20
        for cand in (10, 8, 12, 6, 16, 4, 15, 30, 32, 5, 3, 2, 1):
            io_b = cand * wlen * 2 * C * isz * 2  # x + out, double-buffered
            qkv_b = cand * wlen * 3 * C * isz
            mlp_b = cand * wlen * hidden * isz
            scores_b = cand * wlen * wlen * 4 * 2.5
            bias_b = heads * wlen * wlen * bias.dtype.itemsize * 2
            legal = (cand * ww) % 8 == 0 or cand == nw
            waste_ok = cand <= nw and ((-nw) % cand) * 4 <= nw  # ≤25% waste
            if legal and waste_ok and (
                io_b + qkv_b + mlp_b + scores_b + bias_b + weights_b < budget
            ):
                tw = cand
                break
    if tw is None:
        # no legal lon tile fits VMEM for this geometry — run the XLA
        # composition instead of crashing in the Mosaic lowering
        return reference_swin_block(
            x, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads
        )
    ntw = -(-nw // tw)

    def const(*_):
        return (0, 0)

    return pl.pallas_call(
        _partial(_fused_block_kernel, has_mask=has_mask),
        grid=(nz, nh, ntw),
        in_specs=[
            pl.BlockSpec((wz, wh, tw * ww, C), lambda z, h, t: (z, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, heads, wlen, wlen),
                (lambda z, h, t: (0, 0, 0, 0)) if n_types == 1
                else (lambda z, h, t: (z * nh + h, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wlen, wlen),
                (lambda z, h, t: (0, 0, 0, 0)) if (mz, mh) == (1, 1)
                else (lambda z, h, t: (z, h, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wz, wh, tw * ww, C), lambda z, h, t: (z, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, H, Wd, C), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(
                24 * Z * H * Wd * C * C
                + 4 * (nz * nh * nw) * heads * wlen * wlen * (C // heads)
            ),
            bytes_accessed=2 * Z * H * Wd * C * isz + weights_b,
            transcendentals=(nz * nh * nw) * heads * wlen * wlen
            + Z * H * Wd * hidden,
        ),
    )(x, ln1s, ln1b, qw, qb, bias, mask, pw, pb, ln2s, ln2b, w1, b1, w2, b2)
