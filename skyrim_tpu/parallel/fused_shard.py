"""Fused Pallas kernels under longitude domain decomposition.

Round-1 left a perf/scale contradiction: the fused whole-block kernels
(ops/fused_block.py) are custom calls that XLA GSPMD cannot partition,
so any >1-device mesh silently reverted to the unfused XLA composition
(~25% slower per chip on Pangu-class models).  This module removes the
contradiction the TPU-native way: the whole model step runs inside ONE
``jax.shard_map`` that is *manual* over the ``lon`` mesh axis, every
Pallas kernel executes on its local longitude shard, and the only
communication is a ring **cover gather** around window-attention blocks
(plus XLA collectives GSPMD would have inserted anyway).

Why a cover gather and not halo-exchange-the-roll: attention windows are
independent, so a shard whose boundary cuts a window simply *computes
the covering whole windows* (a ≤1-window overlap fetched from ring
neighbors over ICI with ``ppermute``) and discards the overlap rows.
Redundant compute is ≤ 2·(ww−1)/W_local — ~2% at production Pangu
geometry — and there is **zero** re-sharding all-to-all.  When the local
width already divides the window (e.g. lon=6 on Pangu stage 1) the
gather degenerates to nothing.

The shifted-window roll folds into the same gather: rolling by ``s``
along the periodic lon axis only changes *which* global window range a
shard must cover, i.e. the dynamic-slice offsets — the ring exchange
itself is identical.  Level/latitude roll components stay local (those
dims are not sharded on this path).

Models opt in with ``lon_manual = True`` (Pangu, FengWu — the V1
window-attention family; FuXi's Swin-V2 default ``attn_v2=True`` routes
through GSPMD and only opts in here with ``attn_v2=False``).  Spectral
models (AFNO/SFNO) keep the GSPMD path by design: their token mixing is
*global* (DFT/SHT), which XLA partitions with the appropriate
all-to-all — a cover gather has no meaning there.

Replaces: nothing in the reference (it is single-GPU, SURVEY.md §2.10);
this is the net-new scaling story of BASELINE.md (≥80% efficiency).
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from skyrim_tpu.parallel.mesh import AXES


@dataclasses.dataclass(frozen=True)
class LonManualCtx:
    """Active while tracing inside a shard_map that is manual over lon."""

    axis: str  # mesh axis name ("lon")
    n: int  # number of lon shards


_state = threading.local()


def current() -> LonManualCtx | None:
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def lon_manual(axis: str, n: int):
    prev = current()
    _state.ctx = LonManualCtx(axis, n) if n > 1 else None
    try:
        yield
    finally:
        _state.ctx = prev


def supports_lon_manual(model, mesh: Mesh) -> bool:
    """True when the whole-step manual path applies: the model opted in,
    spatial sharding is lon-only, and every internal width divides."""
    if not getattr(model, "lon_manual", False):
        return False
    if mesh.shape.get(AXES.lat, 1) != 1:
        return False
    n = mesh.shape.get(AXES.lon, 1)
    if n == 1:
        return True
    div = getattr(model, "lon_shard_divisor", None)
    return div is not None and div % n == 0


# --------------------------------------------------------------------------
# ring primitives (only valid inside the manual region)
# --------------------------------------------------------------------------


def ring_extend(x: jax.Array, left: int, right: int, axis: int) -> jax.Array:
    """Extend the local lon chunk with ``left``/``right`` neighbor tokens.

    Periodic ring over the manual lon axis (``lax.ppermute`` — rides ICI
    between physical neighbors).  Extents may exceed the local width;
    the exchange then walks multiple hops (static count).
    """
    ctx = current()
    assert ctx is not None, "ring_extend outside a lon-manual region"
    n = ctx.n
    Wl = x.shape[axis]

    def perm(shift):
        # rank i sends to i+shift ⇒ every rank receives from rank −shift
        return [(i, (i + shift) % n) for i in range(n)]

    pieces = []
    hops = -(-left // Wl) if left else 0
    for hop in range(hops, 0, -1):  # outermost (furthest) first
        take = min(Wl, left - (hop - 1) * Wl)
        sl = jax.lax.slice_in_dim(x, Wl - take, Wl, axis=axis)
        pieces.append(jax.lax.ppermute(sl, ctx.axis, perm(hop)))
    pieces.append(x)
    hops = -(-right // Wl) if right else 0
    for hop in range(1, hops + 1):
        take = min(Wl, right - (hop - 1) * Wl)
        sl = jax.lax.slice_in_dim(x, 0, take, axis=axis)
        pieces.append(jax.lax.ppermute(sl, ctx.axis, perm(-hop)))
    if len(pieces) == 1:
        return x
    return jnp.concatenate(pieces, axis=axis)


def ring_roll(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """Global periodic roll of a lon-sharded axis (|shift| ≤ local width)."""
    ctx = current()
    assert ctx is not None
    Wl = x.shape[axis]
    s = shift % (Wl * ctx.n)
    if s == 0:
        return x
    if s <= Wl:
        ext = ring_extend(x, s, 0, axis)
        return jax.lax.slice_in_dim(ext, 0, Wl, axis=axis)
    # large rolls: extend right side instead (equivalent, fewer hops)
    back = Wl * ctx.n - s
    assert back <= Wl, f"roll {shift} too large for local width {Wl}"
    ext = ring_extend(x, 0, back, axis)
    return jax.lax.slice_in_dim(ext, back, back + Wl, axis=axis)


def local_lon_slice(x: jax.Array, axis: int) -> jax.Array:
    """Slice a replicated global array down to this shard's lon chunk.

    Used for replicated parameters that carry the full grid (e.g.
    Pangu's constant masks) inside the manual region.
    """
    ctx = current()
    if ctx is None:
        return x
    Wg = x.shape[axis]
    Wl = Wg // ctx.n
    idx = jax.lax.axis_index(ctx.axis)
    return jax.lax.dynamic_slice_in_dim(x, idx * Wl, Wl, axis=axis)


# --------------------------------------------------------------------------
# the sharded fused window block
# --------------------------------------------------------------------------


def manual_swin_block(
    x: jax.Array,  # (Z, H, Wl, C) LOCAL lon chunk, z/lat window-padded
    ln1,
    qkv_wb,
    bias,
    mask,
    proj_wb,
    ln2,
    mlp_wb,
    window: tuple[int, int, int],
    heads: int,
    shift: tuple[int, int, int] = (0, 0, 0),
) -> jax.Array:
    """Whole (optionally shifted) Swin block on a lon-sharded activation.

    Equivalent to roll(shift) → fused_swin_block_4d → roll(−shift) on the
    global array.  Index algebra (rolled coords v map to x coords v+s2;
    start = d·Wl; a = start−s2; mis = a mod ww):

    - the rolled range this shard must produce is [a, a+Wl);
    - its window-aligned cover is [a−mis, a−mis+Wc), Wc = (⌈Wl/ww⌉+1)·ww;
    - in x coordinates that cover starts at start−mis — so a left ring
      extension of ww−1 tokens and a right one of Wc−Wl always contain
      it, for ANY shift, and the shifted roll costs nothing extra;
    - the shard's own tokens sit at offset mis inside the cover output.

    The lon component of the roll folds into the cover slice offsets;
    z/lat components are local rolls (those dims are not sharded).
    Must be called inside a lon-manual region.
    """
    from skyrim_tpu.ops.fused_block import fused_swin_block_4d
    from skyrim_tpu.ops.roll import shift_roll

    ctx = current()
    assert ctx is not None
    Z, H, Wl, C = x.shape
    ww = window[2]
    s0, s1, s2 = shift
    n = ctx.n
    Wg = Wl * n
    assert Wg % ww == 0, f"global lon tokens {Wg} not a window multiple"

    if n == 1 or (Wl % ww == 0 and s2 % ww == 0):
        # single shard, or window-aligned shards with an aligned (or no)
        # lon shift: the block is fully local up to a plain lon roll
        if n > 1 and s2:
            x = ring_roll(x, -s2, axis=2)
        h = shift_roll(x, (s0, s1, 0 if n > 1 else s2), forward=True) \
            if any(shift) else x
        h = fused_swin_block_4d(
            h, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads
        )
        h = shift_roll(h, (s0, s1, 0 if n > 1 else s2), forward=False) \
            if any(shift) else h
        return ring_roll(h, s2, axis=2) if (n > 1 and s2) else h

    Wc = min((-(-Wl // ww) + 1) * ww, Wg)
    left_ext = ww - 1
    right_ext = Wc - Wl
    ext = ring_extend(x, left_ext, right_ext, axis=2)

    d = jax.lax.axis_index(ctx.axis)
    start = d * Wl
    mis = jnp.mod(start - s2, ww)  # ∈ [0, ww)
    cover = jax.lax.dynamic_slice_in_dim(ext, left_ext - mis, Wc, axis=2)

    # z/lat roll components are local (those dims are unsharded)
    h = shift_roll(cover, (s0, s1, 0), forward=True) if (s0 or s1) else cover
    h = fused_swin_block_4d(
        h, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads
    )
    h = shift_roll(h, (s0, s1, 0), forward=False) if (s0 or s1) else h

    return jax.lax.dynamic_slice_in_dim(h, mis, Wl, axis=2)


def reference_manual_swin_block(
    x_global, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads,
    shift=(0, 0, 0),
):
    """Single-device semantics the manual block must match (parity)."""
    from skyrim_tpu.ops.fused_block import reference_swin_block

    h = x_global
    if any(shift):
        h = jnp.roll(h, tuple(-s for s in shift), axis=(0, 1, 2))
    h = reference_swin_block(
        h, ln1, qkv_wb, bias, mask, proj_wb, ln2, mlp_wb, window, heads
    )
    if any(shift):
        h = jnp.roll(h, shift, axis=(0, 1, 2))
    return h
