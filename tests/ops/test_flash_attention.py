import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.ops.flash_window_attention import (
    flash_window_attention,
    fused_window_attention,
    reference_window_attention,
    reference_window_attention_qkv,
)


def _inputs(n_win=8, heads=2, wlen=16, hd=8, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.normal(size=(n_win, heads, wlen, hd)), jnp.float32)
        for _ in range(3)
    )
    bias = jnp.asarray(rng.normal(size=(heads, wlen, wlen)) * 0.1, jnp.float32)
    mask = None
    if with_mask:
        nz, nh, nw = 2, 2, 2
        m = np.zeros((nz, nh, wlen, wlen), np.float32)
        m[-1, -1, :, wlen // 2 :] = -1e9  # block some keys in edge windows
        mask = jnp.asarray(m)
    return q, k, v, bias, mask


def test_parity_with_mask():
    q, k, v, bias, mask = _inputs()
    ref = reference_window_attention(q, k, v, bias, mask, n_lon_windows=2)
    out = flash_window_attention(q, k, v, bias, mask, n_lon_windows=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_parity_no_mask():
    q, k, v, bias, _ = _inputs(with_mask=False)
    ref = reference_window_attention(q, k, v, bias, None, n_lon_windows=8)
    out = flash_window_attention(q, k, v, bias, None, n_lon_windows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_parity_per_type_bias():
    """Earth-specific bias: one (wlen, wlen) table per (z, lat) window type."""
    q, k, v, _, mask = _inputs()
    n_win, heads, wlen, _ = q.shape
    n_types, nw = 4, 2  # 2 z-windows × 2 lat-windows, 2 lon windows
    rng = np.random.default_rng(3)
    bias = jnp.asarray(rng.normal(size=(n_types, heads, wlen, wlen)) * 0.1, jnp.float32)
    ref = reference_window_attention(q, k, v, bias, mask, n_lon_windows=nw)
    out = flash_window_attention(q, k, v, bias, mask, n_lon_windows=nw, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # per-type bias must actually differ from broadcasting type 0 everywhere
    ref0 = reference_window_attention(q, k, v, bias[0], mask, n_lon_windows=nw)
    assert not np.allclose(np.asarray(ref), np.asarray(ref0))


def test_fused_packed_qkv_parity():
    """Fused packed-qkv kernel vs the head-split XLA reference."""
    n_win, heads, wlen, hd = 8, 2, 16, 8
    C = heads * hd
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.normal(size=(n_win, wlen, 3 * C)), jnp.float32)
    n_types, nw = 4, 2
    bias = jnp.asarray(rng.normal(size=(n_types, heads, wlen, wlen)) * 0.1, jnp.float32)
    m = np.zeros((2, 2, wlen, wlen), np.float32)
    m[-1, -1, :, wlen // 2 :] = -1e9
    mask = jnp.asarray(m)
    ref = reference_window_attention_qkv(qkv, bias, mask, nw, heads)
    out = fused_window_attention(qkv, bias, mask, nw, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and the packed reference agrees with the unpacked one
    parts = qkv.reshape(n_win, wlen, 3, heads, hd)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ref2 = reference_window_attention(q, k, v, bias, mask, nw)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(ref2.transpose(0, 2, 1, 3).reshape(n_win, wlen, C)),
        atol=1e-6,
    )


def test_fused_no_mask_shared_bias():
    n_win, heads, wlen, hd = 8, 2, 16, 8
    C = heads * hd
    rng = np.random.default_rng(6)
    qkv = jnp.asarray(rng.normal(size=(n_win, wlen, 3 * C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(heads, wlen, wlen)) * 0.1, jnp.float32)
    ref = reference_window_attention_qkv(qkv, bias, None, 8, heads)
    out = fused_window_attention(qkv, bias, None, 8, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_4d_parity():
    """4D windowing-in-kernel path vs partition + packed reference + reverse."""
    from skyrim_tpu.ops import windows as W
    from skyrim_tpu.ops.flash_window_attention import fused_window_attention_4d

    window = (2, 3, 4)
    wlen = 24
    Z, H, Wd = 4, 6, 16  # 2 x 2 x 4 windows
    heads, C = 2, 16
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(Z, H, Wd, 3 * C)), jnp.float32)
    n_types = (Z // 2) * (H // 3)
    bias = jnp.asarray(rng.normal(size=(n_types, heads, wlen, wlen)) * 0.1, jnp.float32)
    m = np.zeros((2, 2, wlen, wlen), np.float32)
    m[-1, 0, :, : wlen // 3] = -1e9
    mask = jnp.asarray(m)
    parts = W.window_partition(qkv, window)
    ref = reference_window_attention_qkv(parts, bias, mask, Wd // 4, heads)
    ref = W.window_reverse(ref, window, (Z, H, Wd))
    out = fused_window_attention_4d(qkv, bias, mask, window, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_inputs():
    q, k, v, bias, mask = _inputs(seed=1)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = reference_window_attention(qb, kb, vb, bias, mask, n_lon_windows=2)
    out = flash_window_attention(qb, kb, vb, bias, mask, n_lon_windows=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_masked_keys_have_zero_weight():
    """Fully blocking all but one key must make output equal that value row."""
    n_win, heads, wlen, hd = 1, 1, 8, 4
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(n_win, heads, wlen, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n_win, heads, wlen, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n_win, heads, wlen, hd)), jnp.float32)
    bias = jnp.zeros((heads, wlen, wlen), jnp.float32)
    m = np.full((1, 1, wlen, wlen), -1e9, np.float32)
    m[..., 3] = 0.0  # only key 3 visible
    out = flash_window_attention(
        q, k, v, jnp.asarray(bias), jnp.asarray(m), n_lon_windows=1, interpret=True
    )
    expected = np.broadcast_to(np.asarray(v)[0, 0, 3], (wlen, hd))
    np.testing.assert_allclose(np.asarray(out)[0, 0], expected, atol=1e-5)
