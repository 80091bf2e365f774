"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.parallel.halo import halo_pad
from skyrim_tpu.parallel.mesh import AXES, make_mesh
from skyrim_tpu.parallel.sharding import (
    dp_ensemble_rollout,
    shard_state,
    sharded_scan_rollout,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_wildcard():
    mesh = make_mesh(dp=2, lat=-1, lon=1)
    assert mesh.shape[AXES.dp] == 2
    assert mesh.shape[AXES.lat] == 4
    with pytest.raises(ValueError):
        make_mesh(dp=3, lat=1, lon=1)


def test_halo_pad_lat():
    mesh = make_mesh(dp=1, lat=4, lon=2)
    H, W = 16, 8
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    x = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(AXES.lat, AXES.lon))
    )
    out = np.asarray(halo_pad(x, mesh, halo_lat=1))
    # global output: each of 4 lat shards grew by 2 rows
    assert out.shape == (H + 2 * 4, W)
    ref = np.arange(H * W, dtype=np.float32).reshape(H, W)
    # shard 1 (rows 4..7 of the original) carries halo rows 3 and 8
    shard1 = out[6:12]
    np.testing.assert_array_equal(shard1[0], ref[3])
    np.testing.assert_array_equal(shard1[1:5], ref[4:8])
    np.testing.assert_array_equal(shard1[5], ref[8])
    # first shard's top halo (pole edge) is zero
    np.testing.assert_array_equal(out[0], np.zeros(W))


def test_halo_pad_lon_periodic():
    mesh = make_mesh(dp=1, lat=2, lon=4)
    H, W = 8, 16
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    x = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(AXES.lat, AXES.lon))
    )
    out = np.asarray(halo_pad(x, mesh, halo_lon=2))
    assert out.shape == (H, W + 2 * 2 * 4)
    ref = np.arange(H * W, dtype=np.float32).reshape(H, W)
    # first lon shard (cols 0..3) should carry left halo = cols 14,15 (wrap)
    shard0 = out[:, :8]
    np.testing.assert_array_equal(shard0[:, 0:2], ref[:, 14:16])
    np.testing.assert_array_equal(shard0[:, 2:6], ref[:, 0:4])
    np.testing.assert_array_equal(shard0[:, 6:8], ref[:, 4:6])


def test_sharded_rollout_matches_single_device():
    from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

    cfg = SFNOConfig(lat=33, lon=64, in_channels=4, embed_dim=16, num_layers=2, scale_factor=4)
    model = FourCastNetV2Model(cfg)
    params = model.init_params(jax.random.key(0))
    x0 = np.random.default_rng(0).normal(size=(1, 4, 33, 64)).astype(np.float32)

    from skyrim_tpu.rollout import scan_rollout

    state = model.init_state(params, x0)
    _, ys_single = scan_rollout(model, params, state, n_steps=2)

    mesh = make_mesh(dp=1, lat=4, lon=2)
    run = sharded_scan_rollout(model, mesh, n_steps=2)
    state2 = shard_state(mesh, model.init_state(params, x0))
    _, ys_sharded = run(params, state2)
    np.testing.assert_allclose(
        np.asarray(ys_single), np.asarray(ys_sharded), atol=2e-2, rtol=1e-4
    )


def test_dp_ensemble_rollout():
    from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

    cfg = SFNOConfig(lat=17, lon=32, in_channels=3, embed_dim=8, num_layers=1, scale_factor=4)
    model = FourCastNetV2Model(cfg)
    params = model.init_params(jax.random.key(0))
    mesh = make_mesh(dp=4, lat=2, lon=1)
    B = 4
    ics = np.random.default_rng(1).normal(size=(B, 1, 3, 17, 32)).astype(np.float32)
    run = dp_ensemble_rollout(model, mesh, n_steps=2)
    out = np.asarray(run(params, ics))
    assert out.shape == (B, 2, 3, 17, 32)
    # per-member results equal the unbatched rollout
    from skyrim_tpu.rollout import scan_rollout

    state = model.init_state(params, ics[2])
    _, ys = scan_rollout(model, params, state, n_steps=2)
    np.testing.assert_allclose(out[2], np.asarray(ys), atol=2e-2, rtol=1e-4)


def test_xla_fallback_context(monkeypatch):
    """GSPMD cannot partition Pallas custom-calls: the sharded entry
    points trace inside xla_fallback(), which must force the XLA paths
    even on an accelerator backend."""
    import contextlib

    import skyrim_tpu.ops.flash_window_attention as fwa
    from skyrim_tpu.parallel.sharding import _maybe_xla_fallback

    monkeypatch.setattr(fwa.jax, "default_backend", lambda: "tpu")
    assert fwa.use_pallas()
    with fwa.xla_fallback():
        assert not fwa.use_pallas()
        with fwa.xla_fallback():  # re-entrant
            assert not fwa.use_pallas()
        assert not fwa.use_pallas()
    assert fwa.use_pallas()

    # >1-device meshes get the fallback; single-device keeps kernels
    from skyrim_tpu.parallel.mesh import make_mesh, single_device_mesh

    multi = make_mesh(2, 1, 4)
    with _maybe_xla_fallback(multi):
        assert not fwa.use_pallas()
    single = single_device_mesh()
    ctx = _maybe_xla_fallback(single)
    assert isinstance(ctx, contextlib.nullcontext().__class__)
