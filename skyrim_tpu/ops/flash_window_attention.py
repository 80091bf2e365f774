"""Fused window attention (Pallas) — the Pangu/FuXi/FengWu hot kernel.

The XLA path materializes the (nWin, heads, wlen, wlen) attention tensor
in HBM (~1.9 GB f32 per Pangu stage-1 block), making window attention
HBM-bound.  This kernel fuses QKᵀ + earth bias + shift mask + softmax +
AV per window with scores living only in VMEM — FlashAttention-style but
without streaming (a whole 144-token window fits VMEM easily), so no
running-max bookkeeping is needed.

Layout: one grid step per window; all heads of the window are processed
in-register.  The earth-specific bias carries one table per (z, lat)
window type (lon windows share it — periodic axis) and is selected per
tile via a BlockSpec index map; the shift mask is factored
(nz, nh, wlen, wlen) — the lon axis is periodic and needs no mask
(ops/windows.py) — and selected by the window's (z, lat) block indices
the same way.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_XLA_FALLBACK = 0


import contextlib


@contextlib.contextmanager
def xla_fallback():
    """Force the pure-XLA model paths while tracing.

    XLA GSPMD cannot auto-partition Pallas custom-calls, so the sharded
    entry points (parallel/sharding.py, the dp-sharded trainer) trace
    their step functions inside this context — the XLA composition
    partitions cleanly and GSPMD inserts the halo/all-to-all collectives.
    Single-device paths keep the fused kernels.  (Explicit shard_map
    wrapping of the kernels with parallel/halo.py exchange is the
    future fast path.)
    """
    global _XLA_FALLBACK
    _XLA_FALLBACK += 1
    try:
        yield
    finally:
        _XLA_FALLBACK -= 1


def use_pallas() -> bool:
    """Fused kernels on accelerators; XLA parity path on CPU/debug.

    ``SKYRIM_FORCE_PALLAS=1`` keeps the fused kernels on CPU too (they
    flip to interpret mode there) — used by the sharded-parity tests to
    exercise the shard_map+Pallas path on the virtual CPU mesh.
    """
    import os

    if _XLA_FALLBACK:
        return False
    if os.environ.get("SKYRIM_NO_PALLAS"):
        return False
    if os.environ.get("SKYRIM_FORCE_PALLAS"):
        return True
    return jax.default_backend() != "cpu"


def _fused_kernel(qkv_ref, bias_ref, mask_ref, o_ref):
    """Packed-qkv window attention: (tw, wlen, 3C) → (tw, wlen, C).

    The head split is done with static LANE slices inside VMEM — the
    XLA path's (nW, wlen, 3, heads, hd) reshape + (nW, heads, wlen, hd)
    transposes are HBM round-trips of the full activation (~90 ms/step
    at Pangu scale, measured); here they cost nothing.
    """
    tw, wlen, c3 = qkv_ref.shape
    C = c3 // 3
    heads = bias_ref.shape[1]
    hd = C // heads
    scale = hd**-0.5
    mask = mask_ref[0, 0]  # (wlen, wlen) additive
    outs = []
    for h in range(heads):
        q = qkv_ref[:, :, h * hd : (h + 1) * hd]
        k = qkv_ref[:, :, C + h * hd : C + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * C + h * hd : 2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0, h][None].astype(jnp.float32) + mask[None]
        s = jax.nn.softmax(s, axis=-1)
        outs.append(
            jax.lax.dot_general(
                s.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def fused_window_attention(
    qkv: jax.Array,  # (nWin, wlen, 3C) packed projection output
    bias: jax.Array,  # (n_types, heads, wlen, wlen)
    mask: jax.Array | None,  # (nz, nh, wlen, wlen) or None
    n_lon_windows: int,
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention straight off the packed qkv GEMM output.

    Returns (nWin, wlen, C) with heads re-merged — directly consumable
    by the output projection, no HBM relayouts on either side.
    """
    n_win, wlen, c3 = qkv.shape
    C = c3 // 3
    if bias.ndim == 3:
        bias = bias[None]
    n_types = bias.shape[0]
    if mask is None:
        nz = nh = 1
        mask = jnp.zeros((1, 1, wlen, wlen), jnp.float32)
    else:
        nz, nh = mask.shape[:2]
    nw = n_lon_windows
    assert n_win == nz * nh * nw or (nz, nh) == (1, 1)
    assert n_types == 1 or n_win == n_types * nw

    import os

    tw_env = os.environ.get("SKYRIM_ATTN_TW")
    tw = 1
    if tw_env and nw % int(tw_env) == 0:
        tw = int(tw_env)
    else:
        for cand in (32, 30, 16, 15, 12, 10, 8, 6, 5, 4, 3, 2):
            qkv_b = cand * wlen * c3 * qkv.dtype.itemsize * 2
            out_b = cand * wlen * C * qkv.dtype.itemsize * 2
            scores_b = cand * wlen * wlen * 4 * 2.5
            bias_b = heads * wlen * wlen * bias.dtype.itemsize * 2
            if nw % cand == 0 and qkv_b + out_b + scores_b + bias_b < 40 * 2**20:
                tw = cand
                break
    n_tiles = n_win // tw
    nw_tiles = nw // tw

    def mask_index(t):
        if (nz, nh) == (1, 1):
            return (0, 0, 0, 0)
        return (t // (nh * nw_tiles), (t // nw_tiles) % nh, 0, 0)

    def bias_index(t):
        if n_types == 1:
            return (0, 0, 0, 0)
        return (t // nw_tiles, 0, 0, 0)

    return pl.pallas_call(
        _fused_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tw, wlen, c3), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, wlen, wlen), bias_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wlen, wlen), mask_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, wlen, C), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_win, wlen, C), qkv.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_win * heads * wlen * wlen * (C // heads),
            bytes_accessed=n_win * wlen * (c3 + C) * qkv.dtype.itemsize,
            transcendentals=n_win * heads * wlen * wlen,
        ),
    )(qkv, bias, mask)


def _fused_kernel_4d(qkv_ref, bias_ref, mask_ref, o_ref):
    """Windowing + attention fused: block (wz, wh, tw·ww, 3C) → (…, C).

    The window partition/reverse (HBM relayouts of the full activation,
    ~44 ms/step at Pangu scale) become VMEM-local reshapes here: the
    BlockSpec already delivers exactly (z-window, h-window, tw lon
    windows) tiles straight from the (Z, H, W, 3C) array.
    """
    wz, wh, tww, c3 = qkv_ref.shape
    heads = bias_ref.shape[1]
    wlen = bias_ref.shape[2]
    ww = wlen // (wz * wh)
    tw = tww // ww
    C = c3 // 3
    hd = C // heads
    scale = hd**-0.5
    xb = qkv_ref[...].reshape(wz, wh, tw, ww, c3)
    xw = xb.transpose(2, 0, 1, 3, 4).reshape(tw, wlen, c3)
    mask = mask_ref[0, 0]
    outs = []
    for h in range(heads):
        q = xw[:, :, h * hd : (h + 1) * hd]
        k = xw[:, :, C + h * hd : C + (h + 1) * hd]
        v = xw[:, :, 2 * C + h * hd : 2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0, h][None].astype(jnp.float32) + mask[None]
        s = jax.nn.softmax(s, axis=-1)
        outs.append(
            jax.lax.dot_general(
                s.astype(xw.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    o = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)  # (tw, wlen, C)
    o = o.reshape(tw, wz, wh, ww, C).transpose(1, 2, 0, 3, 4)
    o_ref[...] = o.reshape(wz, wh, tww, C)


def fused_window_attention_4d(
    qkv: jax.Array,  # (Z, H, W, 3C) packed projection output, window-padded
    bias: jax.Array,  # (n_types, heads, wlen, wlen) or (heads, wlen, wlen)
    mask: jax.Array | None,  # (nz, nh, wlen, wlen) or None
    window: tuple[int, int, int],
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Window partition + attention + reverse in one kernel.

    Reads (wz, wh, tw·ww, 3C) tiles straight out of the 4D activation
    (no HBM partition/reverse), splits heads via lane slices, and writes
    the attention output back in (Z, H, W, C) layout.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    Z, H, Wd, c3 = qkv.shape
    C = c3 // 3
    wz, wh, ww = window
    wlen = wz * wh * ww
    nz, nh, nw = Z // wz, H // wh, Wd // ww
    if bias.ndim == 3:
        bias = bias[None]
    n_types = bias.shape[0]
    assert n_types in (1, nz * nh)
    if mask is None:
        mz = mh = 1
        mask = jnp.zeros((1, 1, wlen, wlen), jnp.float32)
    else:
        mz, mh = mask.shape[:2]
        assert (mz, mh) == (nz, nh)

    import os

    tw_env = os.environ.get("SKYRIM_ATTN_TW")
    tw = 1
    if tw_env and nw % int(tw_env) == 0:
        tw = int(tw_env)
    else:
        # Preference ~8-12 windows/tile: measured sweet spot on v5e — big
        # enough to amortize grid overhead, small enough to double-buffer
        # comfortably (tw=10 ran 4.4x faster than tw=30 at Pangu stage-1
        # geometry).  tw need NOT divide nw: the grid rounds up and the
        # final partial tile's out-of-range windows read garbage that
        # stays contained (attention never mixes windows) and their
        # writes fall outside the array and are dropped.
        for cand in (10, 8, 12, 6, 16, 4, 15, 30, 32, 5, 3, 2):
            qkv_b = cand * wlen * c3 * qkv.dtype.itemsize * 2
            out_b = cand * wlen * C * qkv.dtype.itemsize * 2
            scores_b = cand * wlen * wlen * 4 * 2.5
            bias_b = heads * wlen * wlen * bias.dtype.itemsize * 2
            # Mosaic: a block's 2nd-minor dim must be 8-divisible unless
            # it spans the whole axis
            legal = (cand * ww) % 8 == 0 or cand == nw
            waste_ok = cand <= nw and ((-nw) % cand) * 4 <= nw  # ≤25% waste
            if legal and waste_ok and (
                qkv_b + out_b + scores_b + bias_b < 40 * 2**20
            ):
                tw = cand
                break
    ntw = -(-nw // tw)

    return pl.pallas_call(
        _fused_kernel_4d,
        grid=(nz, nh, ntw),
        in_specs=[
            pl.BlockSpec((wz, wh, tw * ww, c3), lambda z, h, t: (z, h, t, 0),
                         memory_space=pltpu.VMEM),
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
        ],
        out_specs=pl.BlockSpec((wz, wh, tw * ww, C), lambda z, h, t: (z, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, H, Wd, C), qkv.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (nz * nh * nw) * heads * wlen * wlen * (C // heads),
            bytes_accessed=Z * H * Wd * (c3 + C) * qkv.dtype.itemsize,
            transcendentals=(nz * nh * nw) * heads * wlen * wlen,
        ),
    )(qkv, bias, mask)


def reference_window_attention_qkv(qkv, bias, mask, n_lon_windows, heads):
    """Pure-XLA parity path for fused_window_attention (packed qkv)."""
    n_win, wlen, c3 = qkv.shape
    C = c3 // 3
    hd = C // heads
    parts = qkv.reshape(n_win, wlen, 3, heads, hd)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    out = reference_window_attention(q, k, v, bias, mask, n_lon_windows)
    return out.transpose(0, 2, 1, 3).reshape(n_win, wlen, C)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    tw, heads = q_ref.shape[:2]
    hd = q_ref.shape[-1]
    wlen = q_ref.shape[2]
    scale = hd**-0.5
    # batched over the (windows-in-tile × heads) leading dims: one grid
    # step computes the whole tile with scores living only in VMEM
    # keep matmul INPUTS in bf16 (f32 inputs run the MXU ~8× slower);
    # accumulation stays f32 via preferred_element_type
    q = q_ref[...].reshape(tw * heads, wlen, hd)
    k = k_ref[...].reshape(tw * heads, wlen, hd)
    v = v_ref[...].reshape(tw * heads, wlen, hd)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = s.reshape(tw, heads, wlen, wlen)
    s = s + bias_ref[0].astype(jnp.float32)[None]
    s = s + mask_ref[0, 0][None, None]
    s = jax.nn.softmax(s, axis=-1).reshape(tw * heads, wlen, wlen)
    o = jax.lax.dot_general(
        s.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.reshape(tw, heads, wlen, hd).astype(o_ref.dtype)


def flash_window_attention(
    q: jax.Array,  # (nWin, heads, wlen, hd)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (n_types, heads, wlen, wlen) or (heads, wlen, wlen)
    mask: jax.Array | None,  # (nz, nh, wlen, wlen) or None
    n_lon_windows: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention over independent windows. Returns (nWin, heads, wlen, hd).

    ``bias`` may carry a leading window-type axis (earth-specific bias:
    one table per (z, lat) window position, shared along the periodic
    lon axis); a 3-D bias is broadcast to every window.
    """
    n_win, heads, wlen, hd = q.shape
    if bias.ndim == 3:
        bias = bias[None]
    n_types = bias.shape[0]
    if mask is None:
        nz = nh = 1
        mask = jnp.zeros((1, 1, wlen, wlen), jnp.float32)
    else:
        nz, nh = mask.shape[:2]
    nw = n_lon_windows
    assert n_win == nz * nh * nw or (nz, nh) == (1, 1), (
        f"windows {n_win} != {nz}x{nh}x{nw}"
    )
    assert n_types == 1 or n_win == n_types * nw, (
        f"windows {n_win} != {n_types} types x {nw} lon windows"
    )

    # Tile consecutive lon windows per grid step: they share the mask
    # block (lon is periodic/unmasked), and bigger tiles amortize grid
    # and DMA overhead.  TW must divide nw so a tile never straddles a
    # (z, lat) mask boundary.
    import os

    tw_env = os.environ.get("SKYRIM_ATTN_TW")
    tw = 1
    if tw_env and nw % int(tw_env) == 0:
        tw = int(tw_env)
    else:
        for cand in (32, 30, 16, 15, 12, 10, 8, 6, 5, 4, 3, 2):
            # VMEM budget: f32 scores (×~2.5 for softmax temps) dominate,
            # plus double-buffered q/k/v/out blocks.  Big tiles matter:
            # per-grid-step overhead (~µs) swamps the compute of small
            # tiles, so we raise the kernel's VMEM limit below and aim
            # for the largest tile that fits.
            scores_b = cand * heads * wlen * wlen * 4 * 2.5
            qkvo_b = 4 * cand * heads * wlen * hd * q.dtype.itemsize * 2
            bias_b = heads * wlen * wlen * bias.dtype.itemsize * 2
            if nw % cand == 0 and scores_b + qkvo_b + bias_b < 48 * 2**20:
                tw = cand
                break
    n_tiles = n_win // tw
    nw_tiles = nw // tw

    def mask_index(t):
        if (nz, nh) == (1, 1):
            return (0, 0, 0, 0)
        return (t // (nh * nw_tiles), (t // nw_tiles) % nh, 0, 0)

    def bias_index(t):
        # tiles never straddle a (z, lat) window boundary (tw | nw), so
        # the whole tile shares one window-type bias block
        if n_types == 1:
            return (0, 0, 0, 0)
        return (t // nw_tiles, 0, 0, 0)

    return pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tw, heads, wlen, hd), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, heads, wlen, hd), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, heads, wlen, hd), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, wlen, wlen), bias_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wlen, wlen), mask_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, heads, wlen, hd), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_win * heads * wlen * wlen * hd,
            bytes_accessed=4 * n_win * heads * wlen * hd * q.dtype.itemsize,
            transcendentals=n_win * heads * wlen * wlen,
        ),
    )(q, k, v, bias, mask)


def reference_window_attention(q, k, v, bias, mask, n_lon_windows):
    """Pure-XLA reference (the unfused path) for parity tests."""
    n_win, heads, wlen, hd = q.shape
    s = jnp.einsum(
        "whqd,whkd->whqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (hd**-0.5)
    if bias.ndim == 3:
        bias = bias[None]
    nt = bias.shape[0]
    s = s.reshape(nt, n_win // nt, heads, wlen, wlen) + bias[:, None].astype(
        jnp.float32
    )
    s = s.reshape(n_win, heads, wlen, wlen)
    if mask is not None:
        nz, nh = mask.shape[:2]
        nw = n_lon_windows
        s = s.reshape(nz, nh, nw, heads, wlen, wlen) + mask[:, :, None, None]
        s = s.reshape(n_win, heads, wlen, wlen)
    s = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whqk,whkd->whqd", s, v.astype(jnp.float32)).astype(q.dtype)
