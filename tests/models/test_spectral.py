import jax
import numpy as np
import pytest

from skyrim_tpu.models.afno import AFNOConfig, FourCastNetModel
from skyrim_tpu.models.sfno import SFNOConfig, FourCastNetV2Model
from skyrim_tpu.rollout import scan_rollout

AFNO_TINY = AFNOConfig(lat=64, lon=128, in_channels=5, patch=8, embed_dim=32, depth=2, num_blocks=4)
SFNO_TINY = SFNOConfig(lat=65, lon=128, in_channels=5, embed_dim=32, num_blocks=2, scale_factor=4)


def test_afno_apply_and_rollout():
    model = FourCastNetModel(AFNO_TINY)
    params = model.init_params(jax.random.key(0))
    x = np.random.default_rng(0).normal(size=(1, 5, 64, 128)).astype(np.float32)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 5, 64, 128)
    assert np.isfinite(np.asarray(y)).all()
    state = model.init_state(params, x)
    _, ys = scan_rollout(model, params, state, n_steps=3)
    assert ys.shape == (3, 5, 64, 128)


def test_afno_full_channels_default():
    m = FourCastNetModel()
    assert len(m.channels) == 26
    assert m.grid.nlat == 720  # south pole excluded (fourcastnet.py:15-18)


def test_sfno_apply_and_rollout():
    model = FourCastNetV2Model(SFNO_TINY)
    params = model.init_params(jax.random.key(0))
    x = np.random.default_rng(1).normal(size=(1, 5, 65, 128)).astype(np.float32)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 5, 65, 128)
    assert np.isfinite(np.asarray(y)).all()
    state = model.init_state(params, x)
    _, ys = scan_rollout(model, params, state, n_steps=3)
    assert ys.shape == (3, 5, 65, 128)


def test_sfno_full_channels_default():
    m = FourCastNetV2Model()
    assert len(m.channels) == 73
    assert m.grid.nlat == 721


def test_sfno_residual_identity_at_zero_weights():
    """With a zeroed network the residual step must return the input."""
    model = FourCastNetV2Model(SFNO_TINY)
    params = model.init_params(jax.random.key(0))
    params["net"] = jax.tree.map(lambda a: a * 0, params["net"])
    x = np.random.default_rng(2).normal(size=(1, 5, 65, 128)).astype(np.float32)
    y = np.asarray(jax.jit(model.apply)(params, x))
    np.testing.assert_allclose(y[0], x[0], atol=2e-2)
