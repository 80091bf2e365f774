import jax.numpy as jnp
import numpy as np

from skyrim_tpu.ops import windows as W


def test_partition_reverse_roundtrip():
    x = jnp.arange(4 * 12 * 24 * 3, dtype=jnp.float32).reshape(4, 12, 24, 3)
    win = (2, 6, 12)
    parts = W.window_partition(x, win)
    assert parts.shape == (2 * 2 * 2, 2 * 6 * 12, 3)
    back = W.window_reverse(parts, win, (4, 12, 24))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pad_to_windows():
    x = jnp.zeros((3, 7, 24, 2))
    xp, pads = W.pad_to_windows(x, (2, 6, 12))
    assert xp.shape == (4, 12, 24, 2)
    assert pads == (1, 5, 0)


def test_no_mask_when_unshifted_and_unpadded():
    assert W.shift_attention_mask((4, 12, 24), (2, 6, 12), (0, 0, 0)) is None


def test_mask_shape_and_factoring():
    dims, win = (4, 18, 24), (2, 6, 12)
    shift = (1, 3, 6)
    m = W.shift_attention_mask(dims, win, shift, valid=(4, 16, 24))
    assert m is not None
    nz, nh = dims[0] // win[0], dims[1] // win[1]
    assert m.shape == (nz, nh, 144, 144)
    # first (non-edge) window pair: mask only from z-shift regions
    # last h-window must contain masked pairs (wrap + padding)
    assert (m[-1, -1] < 0).any()


def test_mask_blocks_wrapped_pairs():
    """1-axis check: wrapped and contiguous tokens must not attend."""
    dims, win, shift = (2, 12, 12), (2, 6, 12), (0, 3, 0)
    m = W.shift_attention_mask(dims, win, shift)
    assert m is not None
    nz, nh = 1, 2
    m = m.reshape(nz, nh, 2, 6, 12, 2, 6, 12)  # (.., wz,wh,ww, wz,wh,ww)
    # in last h-window: h-positions 0..2 are originals (rows 6..8),
    # h-positions 3..5 are wrapped (rows 0..2 of original)
    blocked = m[0, 1, 0, 0, 0, 0, 3, 0]
    allowed = m[0, 1, 0, 0, 0, 0, 1, 0]
    assert blocked < 0 and allowed == 0


def test_mask_padding_blocked_as_keys():
    dims, win = (2, 12, 12), (2, 6, 12)
    m = W.shift_attention_mask(dims, win, (0, 0, 0), valid=(2, 9, 12))
    assert m is not None
    m = m.reshape(1, 2, 2, 6, 12, 2, 6, 12)
    # query = real token (h-pos 0 of window 1 = row 6), key = pad row 10
    assert m[0, 1, 0, 0, 0, 0, 4, 0] < 0
    # real-real pair unmasked
    assert m[0, 1, 0, 0, 0, 0, 2, 0] == 0


def test_earth_bias_index():
    win = (2, 6, 12)
    idx = W.earth_bias_index(win)
    wlen = 2 * 6 * 12
    assert idx.shape == (wlen, wlen)
    assert idx.min() >= 0
    assert idx.max() < W.earth_bias_table_size(win)
    # relative-lon symmetry: translating both tokens in lon keeps index
    # token order: z-major, then h, then w
    t0, t1 = 0, 1  # same z,h; lon 0 vs 1
    t2, t3 = 2, 3  # lon 2 vs 3
    assert idx[t0, t1] == idx[t2, t3]
    # absolute-lat: shifting both tokens in lat changes the index
    a0, a1 = 0, 12  # h=0 vs h=1 (same z, lon 0)
    b0, b1 = 12, 24
    assert idx[a0, a0] != idx[a1, a1] or idx[b0, b0] != idx[a0, a0]
