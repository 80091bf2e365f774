import jax
import numpy as np
import pytest

from skyrim_tpu.models.pangu import PanguConfig, PanguModel
from skyrim_tpu.rollout import scan_rollout

TINY = PanguConfig(lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2))


@pytest.fixture(scope="module")
def tiny_pangu():
    model = PanguModel("pangu", cfg=TINY)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_channels():
    assert len(PanguModel("pangu6", cfg=TINY).channels) == 69


def test_apply_shape(tiny_pangu):
    model, params = tiny_pangu
    x = np.random.default_rng(0).normal(size=(1, 69, 49, 96)).astype(np.float32)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 69, 49, 96)
    assert np.isfinite(np.asarray(y)).all()


def test_hierarchical_scheduling(tiny_pangu):
    """Step 4 must come from the 24h net applied to the t=0 anchor."""
    model, params = tiny_pangu
    x = np.random.default_rng(1).normal(size=(69, 49, 96)).astype(np.float32)
    state = model.init_state(params, x)
    _, ys = scan_rollout(model, params, state, n_steps=4)
    # direct 24h prediction from the IC
    direct24 = np.asarray(
        jax.jit(lambda p, v: model._forward(p["net24"], p, v))(params, x)
    )
    np.testing.assert_allclose(np.asarray(ys[3]), direct24, atol=1e-4)
    # and step 1 is the 6h net
    direct6 = np.asarray(
        jax.jit(lambda p, v: model._forward(p["net6"], p, v))(params, x)
    )
    np.testing.assert_allclose(np.asarray(ys[0]), direct6, atol=1e-4)


def test_pangu6_variant(tiny_pangu):
    model = PanguModel("pangu6", cfg=TINY)
    params = model.init_params(jax.random.key(0))
    assert "net24" not in params
    x = np.random.default_rng(2).normal(size=(69, 49, 96)).astype(np.float32)
    state = model.init_state(params, x)
    _, ys = scan_rollout(model, params, state, n_steps=2)
    assert ys.shape == (2, 69, 49, 96)


def test_param_structure(tiny_pangu):
    model, params = tiny_pangu
    assert "net6" in params and "net24" in params and "norm" in params
    n = model.param_count(params["net6"])
    assert n > 10_000


def test_init_state_accepts_start_time(tiny_pangu):
    """GlobalModel passes start_time= to every model's init_state; the
    hierarchical Pangu override must accept it (regression)."""
    import datetime
    import inspect

    from skyrim_tpu.models import _MODEL_MODULES, MODELS

    for name in _MODEL_MODULES:
        sig = inspect.signature(MODELS[name].init_state)
        assert "start_time" in sig.parameters, name

    model, params = tiny_pangu
    x = np.random.default_rng(0).normal(size=(69, 49, 96)).astype(np.float32)
    s = model.init_state(params, x, start_time=datetime.datetime(2024, 5, 7))
    assert abs(float(s.time_days) - 19850.0) < 1e-3
