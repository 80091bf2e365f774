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


def test_pangu_net_fused_matches_xla(monkeypatch):
    """Whole-net parity: blocks + DownSample/UpSample + grand GEMMs all
    through the fused kernels vs the pure-XLA path."""
    from skyrim_tpu.models.pangu import PanguConfig, PanguModel

    cfg = PanguConfig(
        lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2),
    )

    def run(use_fused):
        import skyrim_tpu.models.pangu as pangu_mod

        monkeypatch.setattr(pangu_mod, "_use_pallas", lambda: use_fused)
        model = PanguModel("pangu6", cfg=cfg)
        params = model.init_params(jax.random.key(0))
        x = np.random.default_rng(0).normal(size=(1, 69, 49, 96)).astype(
            np.float32
        )
        return params, np.asarray(model.apply(params, x))

    p_ref, ref = run(False)
    p_fused, out = run(True)
    for (k, v), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_fused),
    ):
        assert jax.tree_util.keystr(k) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    assert np.isfinite(out).all()
    # bf16 compute inside: outputs are denormalized physical values, so
    # compare in relative terms
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.02)


def test_pangu_fused_path_differentiable(monkeypatch):
    """The whole fused Pangu forward (block + resample kernels) must be
    differentiable — the finetune trainer takes grads on TPU where the
    fused path is live.  Grads must match the XLA path."""
    from skyrim_tpu.models.pangu import PanguConfig, PanguModel

    cfg = PanguConfig(
        lat=25, lon=48, embed_dim=16, depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2),
    )
    x = np.random.default_rng(0).normal(size=(1, 69, 25, 48)).astype(
        np.float32
    )

    def grads(use_fused):
        import skyrim_tpu.models.pangu as pangu_mod

        monkeypatch.setattr(pangu_mod, "_use_pallas", lambda: use_fused)
        model = PanguModel("pangu6", cfg=cfg)
        params = model.init_params(jax.random.key(0))
        params = {k: v for k, v in params.items() if k != "cache"}

        def loss(p):
            return jnp.mean(model.apply(p, x) ** 2)

        return jax.grad(loss)(params)

    g_ref = grads(False)
    g_fused = grads(True)
    ref = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    checked = 0
    for k, v in jax.tree_util.tree_leaves_with_path(g_fused):
        r = np.asarray(ref[jax.tree_util.keystr(k)])
        np.testing.assert_allclose(
            np.asarray(v), r, atol=5e-4, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k),
        )
        checked += 1
    assert checked > 20


def test_roll3d_parity():
    from skyrim_tpu.ops.roll import roll3d, shift_roll

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 9, 24, 16)), jnp.float32)
    for s in [(1, 3, 6), (0, 3, 6), (3, 8, 23), (0, 0, 5)]:
        out = roll3d(x, s, interpret=True)
        ref = jnp.roll(x, tuple(-v for v in s), (0, 1, 2))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # inverse composes to identity; grads are the opposite roll
    y = shift_roll(shift_roll(x, (1, 3, 6), True), (1, 3, 6), False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda a: jnp.sum(roll3d(a, (1, 3, 6), True) ** 2))(x)
    gr = jax.grad(
        lambda a: jnp.sum(jnp.roll(a, (-1, -3, -6), (0, 1, 2)) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-6)


def test_fused_resample_parity():
    from skyrim_tpu.ops.resample import (
        fused_downsample,
        fused_upsample,
        reference_downsample,
        reference_upsample,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 14, 24, 16)), jnp.float32)
    ln = (jnp.asarray(rng.normal(size=(64,)), jnp.float32),
          jnp.asarray(rng.normal(size=(64,)), jnp.float32))
    wb = (jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32),
          jnp.asarray(rng.normal(size=(32,)), jnp.float32))
    out = fused_downsample(x, ln, wb, interpret=True)
    ref = reference_downsample(x, ln, wb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    xu = jnp.asarray(rng.normal(size=(3, 7, 12, 32)), jnp.float32)
    wbu = (jnp.asarray(rng.normal(size=(32, 64)) * 0.1, jnp.float32),
           jnp.asarray(rng.normal(size=(64,)), jnp.float32))
    lnu = (jnp.asarray(rng.normal(size=(16,)), jnp.float32),
           jnp.asarray(rng.normal(size=(16,)), jnp.float32))
    out = fused_upsample(xu, wbu, lnu, interpret=True)
    ref = reference_upsample(xu, wbu, lnu)
    assert out.shape == (3, 14, 24, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # grads flow through the custom VJPs
    g = jax.grad(lambda x: jnp.sum(fused_downsample(x, ln, wb, True) ** 2))(x)
    gr = jax.grad(lambda x: jnp.sum(reference_downsample(x, ln, wb) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_fused_block_bf16(monkeypatch):
    """bf16 path stays finite and close to the XLA bf16 path."""
    _, ref = _run_block(True, monkeypatch, use_fused=False, dtype=jnp.bfloat16)
    _, out = _run_block(True, monkeypatch, use_fused=True, dtype=jnp.bfloat16)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
