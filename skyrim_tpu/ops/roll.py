"""Single-pass 3-axis roll (Pallas) for the shifted-window frame change.

``jnp.roll(x, (s0, s1, s2), (0, 1, 2))`` lowers in XLA as per-axis
slice+concat chains that materialize intermediates (~1.7 ms per roll at
Pangu stage-1 size; 16 rolls/step).  Here the (z, lat) shifts ride the
BlockSpec index map (whole lon rows, modular block indices) and the lon
shift is an in-VMEM rotate — one read and one write of the array.

Used by PanguBlock / SwinBlock2D for the shift-roll around the fused
block kernel.  Gradient: the adjoint of a roll is the opposite roll
(custom VJP, exact).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_kernel(x_ref, o_ref, *, sw):
    row = x_ref[0, 0]  # (W, C)
    if sw:
        W = row.shape[0]
        s = sw % W
        row = jnp.concatenate([row[s:], row[:s]], axis=0)
    o_ref[0, 0] = row


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def roll3d(x, shifts, interpret=False):
    """out[z, h, w] = x[(z+s0)%Z, (h+s1)%H, (w+s2)%W] on (Z, H, W, C)
    — i.e. ``jnp.roll(x, (-s0, -s1, -s2), (0, 1, 2))``."""
    return _roll_impl(x, shifts, interpret)


def _roll_fwd(x, shifts, interpret):
    return _roll_impl(x, shifts, interpret), None


def _roll_bwd(shifts, interpret, _, g):
    inv = tuple(-s for s in shifts)
    return (_roll_impl(g, inv, interpret),)


roll3d.defvjp(_roll_fwd, _roll_bwd)


def _roll_impl(x, shifts, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    Z, H, Wd, C = x.shape
    s0, s1, s2 = (int(s) for s in shifts)

    def index_map(z, h):
        return ((z + s0) % Z, (h + s1) % H, 0, 0)

    return pl.pallas_call(
        partial(_roll_kernel, sw=s2 % Wd),
        grid=(Z, H),
        in_specs=[
            pl.BlockSpec((1, 1, Wd, C), index_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Wd, C), lambda z, h: (z, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x)


def shift_roll(x, shift, forward: bool, interpret: bool = False):
    """The shifted-window frame change: ``forward`` ≡
    jnp.roll(x, (-shift0, -shift1, -shift2)); else the inverse."""
    s = tuple(int(v) for v in shift)
    if not any(s):
        return x
    if not forward:
        s = tuple(-v for v in s)
    return roll3d(x, s, interpret)
