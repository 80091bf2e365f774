"""The lon-manual shard_map path: fused Pallas kernels under sharding.

Round-1's multi-device meshes silently reverted to the unfused XLA path
(VERDICT item 1); these tests pin the replacement: window blocks run
their fused kernels (interpret mode on the CPU mesh, forced via
SKYRIM_FORCE_PALLAS) on local lon chunks with a ring cover gather, and
whole-model sharded rollouts match the single-device fused rollouts.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from skyrim_tpu.parallel import fused_shard as FS
from skyrim_tpu.parallel.mesh import AXES, make_mesh


def _lon_mesh(n):
    return make_mesh(dp=1, lat=1, lon=n, devices=jax.devices()[:n])


# ---------------------------------------------------------------- ring ops


@pytest.mark.parametrize("left,right", [(2, 3), (5, 0), (0, 7), (11, 18)])
def test_ring_extend_matches_periodic_pad(left, right):
    n = 4
    mesh = _lon_mesh(n)
    Wl = 6
    x = np.arange(n * Wl, dtype=np.float32).reshape(1, n * Wl)

    def body(xl):
        with FS.lon_manual(AXES.lon, n):
            return FS.ring_extend(xl, left, right, axis=1)

    out = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=P(None, AXES.lon), out_specs=P(None, AXES.lon),
            check_vma=False,
        )
    )(x)
    out = np.asarray(out).reshape(n, -1)  # per-shard extended chunks
    for d in range(n):
        lo = d * Wl - left
        want = np.array([x[0, i % (n * Wl)] for i in range(lo, (d + 1) * Wl + right)])
        np.testing.assert_array_equal(out[d], want)


@pytest.mark.parametrize("shift", [-5, -1, 0, 3, 6])
def test_ring_roll_matches_jnp_roll(shift):
    n = 4
    mesh = _lon_mesh(n)
    x = np.arange(24, dtype=np.float32).reshape(1, 24)

    def body(xl):
        with FS.lon_manual(AXES.lon, n):
            return FS.ring_roll(xl, shift, axis=1)

    out = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=P(None, AXES.lon), out_specs=P(None, AXES.lon),
            check_vma=False,
        )
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.roll(x, shift, axis=1))


def test_local_lon_slice():
    n = 4
    mesh = _lon_mesh(n)
    g = np.arange(3 * 24, dtype=np.float32).reshape(3, 24)

    def body():
        with FS.lon_manual(AXES.lon, n):
            return FS.local_lon_slice(jnp.asarray(g), axis=-1)

    out = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(), out_specs=P(None, AXES.lon),
                      check_vma=False)
    )()
    np.testing.assert_array_equal(np.asarray(out), g)


# ------------------------------------------------------- fused block parity


def _block_weights(rng, C, hidden, wlen, heads, n_types, masked):
    k = iter(jax.random.split(rng, 12))
    ln1 = (jnp.ones(C), jnp.zeros(C))
    ln2 = (jnp.ones(C) * 1.1, jnp.zeros(C) + 0.05)
    qkv = (jax.random.normal(next(k), (C, 3 * C)) * 0.2, jnp.zeros(3 * C))
    proj = (jax.random.normal(next(k), (C, C)) * 0.2, jnp.zeros(C))
    mlp = (
        jax.random.normal(next(k), (C, hidden)) * 0.2,
        jnp.zeros(hidden),
        jax.random.normal(next(k), (hidden, C)) * 0.2,
        jnp.zeros(C),
    )
    bias = jax.random.normal(next(k), (n_types, heads, wlen, wlen)) * 0.05
    mask = None
    if masked:
        m = np.zeros((1, 1, wlen, wlen), np.float32)
        m[..., : wlen // 3] = -1e9
        mask = jnp.asarray(m)
    return ln1, qkv, bias, mask, proj, ln2, mlp


@pytest.mark.parametrize("n,shift", [(2, (0, 0, 0)), (4, (0, 0, 0)),
                                     (4, (1, 3, 6)), (8, (0, 2, 6))])
def test_manual_swin_block_matches_global(n, shift, monkeypatch):
    monkeypatch.setenv("SKYRIM_FORCE_PALLAS", "1")
    mesh = _lon_mesh(n)
    Z, H, Wd, C = 2, 6, 24, 8
    window = (2, 6, 12)
    heads = 2
    wlen = 2 * 6 * 12
    n_types = (Z // 2) * (H // 6)
    rng = jax.random.key(0)
    ln1, qkv, bias, mask, proj, ln2, mlp = _block_weights(
        rng, C, 2 * C, wlen, heads, n_types, masked=any(shift)
    )
    x = jax.random.normal(jax.random.key(1), (Z, H, Wd, C), jnp.float32)

    want = FS.reference_manual_swin_block(
        x, ln1, qkv, bias, mask, proj, ln2, mlp, window, heads, shift
    )

    def body(xl, ln1, qkv, bias, proj, ln2, mlp):
        with FS.lon_manual(AXES.lon, n):
            return FS.manual_swin_block(
                xl, ln1, qkv, bias, mask, proj, ln2, mlp, window, heads, shift
            )

    xspec = P(None, None, AXES.lon, None)
    rep = jax.tree.map(lambda _: P(), (ln1, qkv, bias, proj, ln2, mlp))
    got = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(xspec, *rep), out_specs=xspec,
            check_vma=False,
        )
    )(x, ln1, qkv, bias, proj, ln2, mlp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# -------------------------------------------------- whole-model fused parity


@pytest.mark.parametrize("family", ["pangu", "fuxi", "fengwu"])
def test_sharded_rollout_fused_path(family, monkeypatch):
    """The VERDICT-1 'done' bar: sharded parity with the FUSED path live
    (interpret-mode Pallas inside shard_map on the CPU mesh)."""
    monkeypatch.setenv("SKYRIM_FORCE_PALLAS", "1")
    from tests.parallel.test_all_models_sharded import FAMILIES
    from skyrim_tpu.parallel.sharding import (
        _step_mode,
        shard_state,
        sharded_scan_rollout,
    )
    from skyrim_tpu.rollout import scan_rollout

    model = FAMILIES[family]()
    params = model.init_params(jax.random.key(0))
    nc = len(model.channels)
    H, W = model.grid.shape
    x0 = (
        np.random.default_rng(0)
        .normal(size=(model.n_history, nc, H, W))
        .astype(np.float32)
    )

    n_steps = 10  # the product is a 40-step rollout; 10 steps bounds drift
    state = model.init_state(params, x0)
    _, ys_single = scan_rollout(model, params, state, n_steps=n_steps)

    mesh = make_mesh(dp=2, lat=1, lon=4)
    assert _step_mode(model, mesh) == "manual"
    run = sharded_scan_rollout(model, mesh, n_steps=n_steps)
    state2 = shard_state(mesh, model.init_state(params, x0))
    _, ys_sharded = run(params, state2)

    a, b = np.asarray(ys_single), np.asarray(ys_sharded)
    assert a.shape == b.shape
    # drift bound: the sharded rollout may differ from single-device only
    # by bf16 reduction-order noise, which must stay bounded at EVERY
    # step of the autoregressive feedback, not just the first — each
    # step's scale-normalized error ≤ 1e-2.
    for t in range(a.shape[0]):
        scale = np.abs(a[t]).mean() + 1e-6
        np.testing.assert_allclose(
            a[t] / scale, b[t] / scale, atol=1e-2,
            err_msg=f"sharded drift exceeded bound at rollout step {t}",
        )


def test_dp_ensemble_fused_path(monkeypatch):
    monkeypatch.setenv("SKYRIM_FORCE_PALLAS", "1")
    from tests.parallel.test_all_models_sharded import FAMILIES
    from skyrim_tpu.parallel.sharding import dp_ensemble_rollout
    from skyrim_tpu.rollout import scan_rollout

    model = FAMILIES["pangu"]()
    params = model.init_params(jax.random.key(0))
    nc = len(model.channels)
    H, W = model.grid.shape
    B = 2
    x0 = (
        np.random.default_rng(0)
        .normal(size=(B, model.n_history, nc, H, W))
        .astype(np.float32)
    )

    mesh = make_mesh(dp=2, lat=1, lon=4)
    run = dp_ensemble_rollout(model, mesh, n_steps=2)
    ys = np.asarray(run(params, x0))

    for b in range(B):
        state = model.init_state(params, x0[b])
        _, want = scan_rollout(model, params, state, n_steps=2)
        w = np.asarray(want)
        scale = np.abs(w).mean() + 1e-6
        np.testing.assert_allclose(ys[b] / scale, w / scale, atol=5e-3)
