import jax
import numpy as np
import pytest

from skyrim_tpu.models.fengwu import FengWuConfig, FengWuModel
from skyrim_tpu.models.fuxi import FuXiConfig, FuXiModel
from skyrim_tpu.rollout import scan_rollout

FUXI_TINY = FuXiConfig(
    lat=49, lon=96, in_channels=6, embed_dim=32, depth=2, num_heads=2,
    stage_steps=2, n_stages=3,
)
FENGWU_TINY = FengWuConfig(
    lat=49, lon=96, levels=3, surface_channels=2, level_vars=2,
    modal_dim=8, fuser_dim=24, depth=2, num_heads=2,
)


@pytest.fixture(scope="module")
def tiny_fuxi():
    m = FuXiModel(FUXI_TINY)
    return m, m.init_params(jax.random.key(0))


def test_fuxi_apply(tiny_fuxi):
    m, params = tiny_fuxi
    x = np.random.default_rng(0).normal(size=(2, 6, 49, 96)).astype(np.float32)
    y = jax.jit(m.apply)(params, x)
    assert y.shape == (1, 6, 49, 96)
    assert np.isfinite(np.asarray(y)).all()


def test_fuxi_cascade_switches_stage(tiny_fuxi):
    """With stage_steps=2, steps 0-1 use stage 0, steps 2-3 stage 1, etc."""
    m, params = tiny_fuxi
    x = np.random.default_rng(1).normal(size=(2, 6, 49, 96)).astype(np.float32)
    state = m.init_state(params, x)
    _, ys = scan_rollout(m, params, state, n_steps=5)
    assert ys.shape == (5, 6, 49, 96)

    # recompute step 2 manually with stage-1 params on the rolled state
    _, ys01 = scan_rollout(m, params, m.init_state(params, x), n_steps=2)
    hist = np.stack([np.asarray(ys01[0]), np.asarray(ys01[1])])
    direct = np.asarray(
        jax.jit(lambda p, v: m._forward(p, params, v))(params["stages"][1], hist)
    )
    np.testing.assert_allclose(np.asarray(ys[2]), direct, atol=1e-4)


def test_fuxi_default_contract():
    m = FuXiModel()
    assert len(m.channels) == 70
    assert m.n_history == 2


@pytest.fixture(scope="module")
def tiny_fengwu():
    m = FengWuModel(FENGWU_TINY)
    return m, m.init_params(jax.random.key(0))


def test_fengwu_apply_and_rollout(tiny_fengwu):
    m, params = tiny_fengwu
    nc = FENGWU_TINY.in_channels
    x = np.random.default_rng(2).normal(size=(2, nc, 49, 96)).astype(np.float32)
    y = jax.jit(m.apply)(params, x)
    assert y.shape == (1, nc, 49, 96)
    state = m.init_state(params, x)
    _, ys = scan_rollout(m, params, state, n_steps=3)
    assert ys.shape == (3, nc, 49, 96)
    assert np.isfinite(np.asarray(ys)).all()


def test_fengwu_default_contract():
    m = FengWuModel()
    assert len(m.channels) == 69
    assert m.channels[:4] == ("u10m", "v10m", "t2m", "msl")
