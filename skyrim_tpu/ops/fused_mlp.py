"""Fused row-wise MLP kernels (Pallas) — GraphCast's node/edge math.

GraphCast applies 2-layer MLPs (Dense → swish → Dense → LayerNorm) over
~1M grid rows and ~3M edge rows per step; XLA materializes each stage
in HBM (the LayerNorm stats fusions alone measured ~25 ms/step with
utils/op_stats).  These kernels run whole rows through the MLP in VMEM:

- ``fused_mlp``:   x → Dense → swish → Dense [→ LayerNorm]
- ``fused_finish``: x (+pre-bias) → swish → Dense → LayerNorm
  (FactoredEdgeMLP.finish — the per-edge message path, whose first
  Dense layer is factored/cached outside)

Rows are independent: the grid ceils and out-of-range rows read garbage
that never escapes (their writes are dropped).  Both carry custom VJPs
through XLA reference compositions (pattern of ops/fused_block.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from skyrim_tpu.ops.fused_block import _layernorm_f32


def _rows_tile(n_rows: int, row_bytes: int, budget: int = 8 * 2**20) -> int:
    t = max(256, min(n_rows, budget // max(1, row_bytes)))
    return min(-(-t // 256) * 256, max(n_rows, 256))


def _mlp_kernel(*refs, use_ln, use_x2, use_res, x_t):
    it = iter(refs)
    x_ref = next(it)
    x2_ref = next(it) if use_x2 else None
    res_ref = next(it) if use_res else None
    w1a_ref = next(it)
    w1b_ref = next(it) if use_x2 else None
    b1_ref = next(it)
    w2_ref = next(it)
    b2_ref = next(it)
    lns_ref = next(it)
    lnb_ref = next(it)
    o_ref = next(it)
    dt = x_ref.dtype
    # x_t: x arrives feature-major (Cin, R) — contract dim 0 against dim
    # 0 of W1, an MXU-native transposed operand (no relayout anywhere)
    h = jax.lax.dot_general(
        x_ref[...], w1a_ref[...],
        (((0 if x_t else 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if use_x2:
        # split first layer instead of a materialized concat([x, x2])
        h = h + jax.lax.dot_general(
            x2_ref[...], w1b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # swish in pure f32: Mosaic rejects the mixed-dtype constant
    # broadcast nn.swish(bf16) lowers to
    h = h + b1_ref[...].astype(jnp.float32)
    h = (h * jax.lax.logistic(h)).astype(dt)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b2_ref[...].astype(jnp.float32)).astype(dt)
    if use_ln:
        y = _layernorm_f32(y, lns_ref, lnb_ref).astype(dt)
    if use_res:
        y = res_ref[...] + y
    o_ref[...] = y


def reference_mlp(x, w1b1, w2b2, ln, x2=None, residual=None,
                  x_transposed=False):
    dt = x.dtype
    if x_transposed:
        x = x.T
    if x2 is not None:
        x = jnp.concatenate([x, x2], axis=-1)
    h = nn.swish(x @ w1b1[0].astype(dt) + w1b1[1].astype(dt))
    y = h @ w2b2[0].astype(dt) + w2b2[1].astype(dt)
    if ln is not None:
        y = _layernorm_f32(
            y, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
        ).astype(dt)
    if residual is not None:
        y = residual + y
    return y


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _mlp_vjp(x, w1b1, w2b2, ln, x2, residual, x_t, interpret):
    return _mlp_impl(x, w1b1, w2b2, ln, x2, residual, x_t, interpret)


def _mlp_fwd(x, w1b1, w2b2, ln, x2, residual, x_t, interpret):
    out = _mlp_impl(x, w1b1, w2b2, ln, x2, residual, x_t, interpret)
    return out, (x, w1b1, w2b2, ln, x2, residual)


def _mlp_bwd(x_t, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: reference_mlp(*a, x_transposed=x_t), *res
    )
    return vjp(g)


_mlp_vjp.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp(x, w1b1, w2b2, ln=None, x2=None, residual=None,
              x_transposed: bool = False, interpret: bool = False):
    """[residual +] (Dense → swish → Dense [→ LayerNorm]) over rows,
    one HBM pass.

    x: (N, Cin) — or (Cin, N) with ``x_transposed`` (the first GEMM
    contracts the leading dim; MXU handles the transposed operand
    natively, so callers skip their relayout).  w1b1: ((Cin[+Cin2], H),
    (H,)); w2b2: ((H, Cout), (Cout,)); ln: optional (scale, bias) over
    Cout.  ``x2`` feeds the first layer's trailing kernel rows
    (≡ concat([x, x2]) without materializing it); ``residual`` is added
    to the output in-kernel.  Output is (N, Cout) either way.
    """
    return _mlp_vjp(x, w1b1, w2b2, ln, x2, residual, x_transposed, interpret)


def _mlp_impl(x, w1b1, w2b2, ln, x2, residual, x_t, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    if x_t:
        Cin, N = x.shape
    else:
        N, Cin = x.shape
    H = w1b1[0].shape[1]
    Cout = w2b2[0].shape[1]
    dt = x.dtype
    use_ln = ln is not None
    use_x2 = x2 is not None
    use_res = residual is not None
    Cin2 = x2.shape[1] if use_x2 else 0
    w1a = w1b1[0][:Cin].astype(dt)
    w1b = w1b1[0][Cin:].astype(dt) if use_x2 else None
    b1 = w1b1[1].reshape(1, H).astype(jnp.float32)
    w2 = w2b2[0].astype(dt)
    b2 = w2b2[1].reshape(1, Cout).astype(jnp.float32)
    lns = (ln[0] if use_ln else jnp.ones((Cout,))).reshape(1, Cout)
    lnb = (ln[1] if use_ln else jnp.zeros((Cout,))).reshape(1, Cout)
    row_bytes = (Cin + Cin2 + 2 * H + 3 * Cout) * dt.itemsize
    R = _rows_tile(N, row_bytes)
    grid = (-(-N // R),)

    def const(_):
        return (0, 0)

    def rows(r):
        return (r, 0)

    def cols(r):
        return (0, r)

    args = [x]
    in_specs = [
        pl.BlockSpec((Cin, R), cols, memory_space=pltpu.VMEM)
        if x_t else
        pl.BlockSpec((R, Cin), rows, memory_space=pltpu.VMEM)
    ]
    if use_x2:
        args.append(x2)
        in_specs.append(pl.BlockSpec((R, Cin2), rows, memory_space=pltpu.VMEM))
    if use_res:
        args.append(residual)
        in_specs.append(pl.BlockSpec((R, Cout), rows, memory_space=pltpu.VMEM))
    args.append(w1a)
    in_specs.append(pl.BlockSpec((Cin, H), const, memory_space=pltpu.VMEM))
    if use_x2:
        args.append(w1b)
        in_specs.append(pl.BlockSpec((Cin2, H), const, memory_space=pltpu.VMEM))
    args += [b1, w2, b2, lns, lnb]
    in_specs += [
        pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, Cout), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cout), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cout), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cout), const, memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        partial(_mlp_kernel, use_ln=use_ln, use_x2=use_x2, use_res=use_res,
                x_t=x_t),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, Cout), rows, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Cout), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * ((Cin + Cin2) * H + H * Cout),
            bytes_accessed=N * (Cin + Cin2 + 2 * Cout) * dt.itemsize,
            transcendentals=N * H,
        ),
    )(*args)


def _finish_kernel(x_ref, b0_ref, w_ref, b_ref, lns_ref, lnb_ref, o_ref):
    dt = x_ref.dtype
    h = x_ref[...].astype(jnp.float32) + b0_ref[...].astype(jnp.float32)
    h = (h * jax.lax.logistic(h)).astype(dt)
    y = jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b_ref[...].astype(jnp.float32)).astype(dt)
    o_ref[...] = _layernorm_f32(y, lns_ref, lnb_ref).astype(dt)


def reference_finish(x, b0, wb, ln):
    dt = x.dtype
    h = nn.swish(x + b0.astype(dt))
    y = h @ wb[0].astype(dt) + wb[1].astype(dt)
    return _layernorm_f32(
        y, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
    ).astype(dt)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _finish_vjp(x, b0, wb, ln, interpret):
    return _finish_impl(x, b0, wb, ln, interpret)


def _finish_fwd(x, b0, wb, ln, interpret):
    return _finish_impl(x, b0, wb, ln, interpret), (x, b0, wb, ln)


def _finish_bwd(interpret, res, g):
    _, vjp = jax.vjp(reference_finish, *res)
    return vjp(g)


_finish_vjp.defvjp(_finish_fwd, _finish_bwd)


def fused_finish(x, b0, wb, ln, interpret: bool = False):
    """swish(x + b0) → Dense → LayerNorm over rows, one HBM pass
    (FactoredEdgeMLP.finish).  x: (N, L); b0: (L,); wb: ((L, L), (L,));
    ln: (scale, bias) over L."""
    return _finish_vjp(x, b0, wb, ln, interpret)


def _finish_impl(x, b0, wb, ln, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    N, L = x.shape
    Cout = wb[0].shape[1]
    dt = x.dtype
    w = wb[0].astype(dt)
    b = wb[1].reshape(1, Cout).astype(jnp.float32)
    b0r = b0.reshape(1, L).astype(jnp.float32)
    lns = ln[0].reshape(1, Cout)
    lnb = ln[1].reshape(1, Cout)
    row_bytes = (2 * L + 2 * Cout) * dt.itemsize
    R = _rows_tile(N, row_bytes)
    grid = (-(-N // R),)

    def const(_):
        return (0, 0)

    return pl.pallas_call(
        _finish_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, L), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Cout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, Cout), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Cout), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * L * Cout,
            bytes_accessed=N * (L + Cout) * dt.itemsize,
            transcendentals=N * L,
        ),
    )(x, b0r, w, b, lns, lnb)
