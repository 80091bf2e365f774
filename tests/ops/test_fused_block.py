"""Parity tests for the fully-fused transformer block kernel.

The fused path must match the XLA PanguBlock path bit-for-bit in
structure (same param tree) and numerically (same LayerNorm/matmul/
softmax semantics).  On CPU the kernel runs in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.models.pangu import PanguBlock


def _run_block(shifted, monkeypatch, use_fused, seed=0, dtype=jnp.float32):
    """Apply a PanguBlock on random data via the XLA or fused path."""
    import skyrim_tpu.models.pangu as pangu_mod

    monkeypatch.setattr(pangu_mod, "_use_pallas", lambda: use_fused)
    Z, H, Wd, C = 4, 12, 24, 32
    window = (2, 6, 12)
    valid = (3, 11, 24)  # unpadded extents → shift mask is non-trivial
    block = PanguBlock(
        dim=C, heads=4, window=window, shifted=shifted,
        mlp_ratio=4.0, valid=valid,
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(Z, H, Wd, C)), dtype)
    params = block.init(jax.random.key(seed), x)
    return params, np.asarray(block.apply(params, x).astype(jnp.float32))


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_block_matches_xla(shifted, monkeypatch):
    p_ref, ref = _run_block(shifted, monkeypatch, use_fused=False)
    p_fused, out = _run_block(shifted, monkeypatch, use_fused=True)
    # identical param trees (same paths, shapes, and init values)
    ref_leaves = jax.tree_util.tree_leaves_with_path(p_ref)
    fused = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(p_fused)
    }
    assert len(ref_leaves) == len(fused)
    for k, v in ref_leaves:
        ks = jax.tree_util.keystr(k)
        assert ks in fused, ks
        np.testing.assert_array_equal(np.asarray(v), np.asarray(fused[ks]))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


def _run_swin2d(shifted, monkeypatch, use_fused, seed=0):
    """FuXi/FengWu SwinBlock2D via the XLA or fused path."""
    import skyrim_tpu.ops.flash_window_attention as fwa
    from skyrim_tpu.models.fuxi import SwinBlock2D

    monkeypatch.setattr(fwa, "use_pallas", lambda: use_fused)
    H, Wd, C = 18, 24, 32
    block = SwinBlock2D(
        dim=C, heads=4, window=(6, 12), shifted=shifted, valid_h=17
    )
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(H, Wd, C)), jnp.float32)
    params = block.init(jax.random.key(seed), x)
    return params, np.asarray(block.apply(params, x))


@pytest.mark.parametrize("shifted", [False, True])
def test_swin2d_fused_matches_xla(shifted, monkeypatch):
    p_ref, ref = _run_swin2d(shifted, monkeypatch, use_fused=False)
    p_fused, out = _run_swin2d(shifted, monkeypatch, use_fused=True)
    ref_leaves = jax.tree_util.tree_leaves_with_path(p_ref)
    fused = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(p_fused)
    }
    assert len(ref_leaves) == len(fused)
    for k, v in ref_leaves:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(fused[jax.tree_util.keystr(k)])
        )
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_block_grad(shifted, monkeypatch):
    """custom VJP: grads through the fused path match the XLA path
    (the finetune trainer differentiates the model on TPU)."""

    def loss_for(use_fused):
        import skyrim_tpu.models.pangu as pangu_mod

        monkeypatch.setattr(pangu_mod, "_use_pallas", lambda: use_fused)
        Z, H, Wd, C = 2, 6, 12, 16
        block = PanguBlock(
            dim=C, heads=2, window=(2, 6, 12), shifted=shifted,
            mlp_ratio=2.0, valid=(2, 5, 12),
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(Z, H, Wd, C)), jnp.float32)
        params = block.init(jax.random.key(0), x)

        def loss(p):
            y = block.apply(p, x)
            return jnp.mean(y * y)

        return jax.grad(loss)(params)

    g_ref = loss_for(False)
    g_fused = loss_for(True)
    ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(g_fused):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[jax.tree_util.keystr(k)]),
            atol=1e-5, rtol=1e-4, err_msg=jax.tree_util.keystr(k),
        )


def test_fused_block_bf16(monkeypatch):
    """bf16 path stays finite and close to the XLA bf16 path."""
    _, ref = _run_block(True, monkeypatch, use_fused=False, dtype=jnp.bfloat16)
    _, out = _run_block(True, monkeypatch, use_fused=True, dtype=jnp.bfloat16)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
