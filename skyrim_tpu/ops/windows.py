"""3D shifted-window utilities for earth transformers (Pangu/FuXi/FengWu).

TPU-first notes:
- partition/reverse are pure reshapes/transposes (free for XLA);
- the cyclic shift is ``jnp.roll`` (lowered to two slices + concat);
- attention masks and earth-bias gather indices are computed ONCE in
  numpy at trace time (static tables), so nothing data-dependent ever
  reaches the compiled graph;
- longitude is periodic on the globe, so shifted windows along lon need
  NO mask (the wrap is physically real) — masks only apply along the
  pressure-level and latitude axes.

Replaces the windowing machinery of the ONNX Pangu model the reference
wraps (reference skyrim/core/models/pangu.py:45-46, SURVEY.md §2.9).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

Window3 = tuple[int, int, int]


def pad_to_windows(x: jnp.ndarray, window: Window3) -> tuple[jnp.ndarray, tuple[int, int, int]]:
    """Pad (Z, H, W, C) so each spatial dim divides its window size.

    Inside a lon-manual shard_map region (parallel/fused_shard.py) the W
    dim is a *local* chunk of a periodic axis whose GLOBAL width already
    divides the window — local padding would insert garbage into the
    ring, so lon is never padded there (the cover gather handles window
    misalignment at shard boundaries).
    """
    from skyrim_tpu.parallel import fused_shard as _FS

    Z, H, W, _ = x.shape
    wz, wh, ww = window
    pz, ph, pw = (-Z) % wz, (-H) % wh, (-W) % ww
    if _FS.current() is not None:
        pw = 0
    if pz or ph or pw:
        x = jnp.pad(x, ((0, pz), (0, ph), (0, pw), (0, 0)))
    return x, (pz, ph, pw)


def window_partition(x: jnp.ndarray, window: Window3) -> jnp.ndarray:
    """(Z, H, W, C) → (nWin, wz*wh*ww, C); dims must divide the window."""
    Z, H, W, C = x.shape
    wz, wh, ww = window
    x = x.reshape(Z // wz, wz, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)
    return x.reshape(-1, wz * wh * ww, C)


def window_reverse(
    win: jnp.ndarray, window: Window3, dims: tuple[int, int, int]
) -> jnp.ndarray:
    """Inverse of window_partition."""
    Z, H, W = dims
    wz, wh, ww = window
    C = win.shape[-1]
    x = win.reshape(Z // wz, H // wh, W // ww, wz, wh, ww, C)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)
    return x.reshape(Z, H, W, C)


@lru_cache(maxsize=64)
def shift_attention_mask(
    dims: tuple[int, int, int],
    window: Window3,
    shift: Window3,
    valid: tuple[int, int, int] | None = None,
) -> np.ndarray | None:
    """Additive attention mask (nWinZ, nWinH, wlen, wlen).

    Standard Swin region-id construction along Z (pressure levels) and H
    (latitude); W (longitude) is periodic so rolled windows there are
    valid and unmasked — hence the mask is independent of the lon window
    index and is returned factored over (z-window, h-window) only (the
    dense per-window mask at Pangu scale would be ~300 MB).  ``valid``
    gives the unpadded extents — padded cells are masked as keys so real
    tokens never attend to padding.  Returns None if nothing is masked.
    """
    Z, H, _Wlon = dims
    wz, wh, ww = window
    sz, sh, _ = shift
    vz, vh, _ = valid if valid is not None else dims
    if sz == 0 and sh == 0 and (vz, vh) == (Z, H):
        return None

    def regions(size, w, s):
        # Region ids in SHIFTED coordinates (classic Swin): positions
        # below size-w are contiguous originals; the last window mixes a
        # contiguous run [size-w, size-s) with wrapped tokens [size-s, ·).
        ids = np.zeros(size, dtype=np.int64)
        if s == 0:
            return ids
        ids[size - w : size - s] = 1
        ids[size - s :] = 2
        return ids

    rz = regions(Z, wz, sz)
    rh = regions(H, wh, sh)

    def valid_axis(size, v, s):
        m = np.zeros(size, dtype=bool)
        m[:v] = True
        return np.roll(m, -s)  # data is padded, then rolled, then partitioned

    valz = valid_axis(Z, vz, sz)
    valh = valid_axis(H, vh, sh)

    # per-axis window partitions: (nWin, w)
    rz_w = rz.reshape(-1, wz)
    rh_w = rh.reshape(-1, wh)
    vz_w = valz.reshape(-1, wz)
    vh_w = valh.reshape(-1, wh)
    nz, nh = rz_w.shape[0], rh_w.shape[0]

    # token region id within a (z, h) window pair: combine axes
    # (wlen ordered z-major, then h, then w — matching window_partition)
    reg = (rz_w[:, None, :, None, None] * 16 + rh_w[None, :, None, :, None])
    val = vz_w[:, None, :, None, None] & vh_w[None, :, None, :, None]
    reg = np.broadcast_to(reg, (nz, nh, wz, wh, ww)).reshape(nz, nh, -1)
    val = np.broadcast_to(val, (nz, nh, wz, wh, ww)).reshape(nz, nh, -1)

    blocked = (reg[:, :, :, None] != reg[:, :, None, :]) | (~val[:, :, None, :])
    mask = np.where(blocked, -1e9, 0.0).astype(np.float32)
    if not mask.any():
        return None
    return mask


@lru_cache(maxsize=32)
def earth_bias_index(window: Window3) -> np.ndarray:
    """Static gather index (wlen, wlen) into the earth-specific bias table.

    Pangu's bias is absolute in pressure-level and latitude within the
    window (translation symmetry is broken along those axes on a sphere)
    and relative in longitude: table length wz²·wh²·(2·ww−1).
    """
    wz, wh, ww = window
    zi = np.arange(wz)
    hi = np.arange(wh)
    wi = np.arange(ww)
    z1, h1, w1 = np.meshgrid(zi, hi, wi, indexing="ij")
    pos = np.stack([z1.ravel(), h1.ravel(), w1.ravel()], axis=-1)  # (wlen, 3)
    dz = pos[:, None, 0] * wz + pos[None, :, 0]  # absolute pair in z: wz²
    dh = pos[:, None, 1] * wh + pos[None, :, 1]  # absolute pair in h: wh²
    dw = pos[:, None, 2] - pos[None, :, 2] + (ww - 1)  # relative in w: 2ww−1
    idx = (dz * (wh * wh) + dh) * (2 * ww - 1) + dw
    return idx.astype(np.int32)


def earth_bias_table_size(window: Window3) -> int:
    wz, wh, ww = window
    return wz * wz * wh * wh * (2 * ww - 1)


@lru_cache(maxsize=32)
def swin_rel_index(window2: tuple[int, int]) -> np.ndarray:
    """Standard Swin 2D relative-position index: (wlen, wlen) rows into
    the ((2wh−1)(2ww−1),) relative table.  Used by the Swin-V2 CPB bias
    (published FuXi blocks are Swin-V2, Chen et al. 2023 §Methods)."""
    wh, ww = window2
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"), -1
    ).reshape(-1, 2)
    rel = coords[:, None] - coords[None, :]  # (wlen, wlen, 2)
    return (rel[..., 0] + wh - 1) * (2 * ww - 1) + (rel[..., 1] + ww - 1)


@lru_cache(maxsize=32)
def swin_v2_log_coords(window2: tuple[int, int]) -> np.ndarray:
    """Swin-V2 continuous-position-bias MLP input: ((2wh−1)(2ww−1), 2)
    log-spaced normalized relative coordinates (Liu et al. 2022 eq. 4:
    sign(Δ)·log2(1+|8·Δ/(w−1)|)/log2(8))."""
    wh, ww = window2
    dh = np.arange(-(wh - 1), wh, dtype=np.float64)
    dw = np.arange(-(ww - 1), ww, dtype=np.float64)
    t = np.stack(np.meshgrid(dh, dw, indexing="ij"), -1)
    t[..., 0] /= max(wh - 1, 1)
    t[..., 1] /= max(ww - 1, 1)
    t *= 8.0
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / np.log2(8.0)
    return t.reshape(-1, 2).astype(np.float32)
