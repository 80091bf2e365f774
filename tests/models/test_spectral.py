import jax
import numpy as np
import pytest

from skyrim_tpu.models.afno import AFNOConfig, FourCastNetModel
from skyrim_tpu.models.sfno import SFNOConfig, FourCastNetV2Model
from skyrim_tpu.rollout import scan_rollout

AFNO_TINY = AFNOConfig(lat=64, lon=128, in_channels=5, patch=8, embed_dim=32, depth=2, num_blocks=4)
SFNO_TINY = SFNOConfig(lat=65, lon=128, in_channels=5, embed_dim=32, num_layers=2, scale_factor=4)


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


def test_sfno_spectral_filter_mixes_channels():
    """The fcnv2_sm filter is a channel-mixing complex MLP in spectral
    space (not a per-degree diagonal gain): perturbing ONE input channel
    must change OTHER channels' outputs even with the pointwise layers
    bypassed.  Guards against regressing to the round-1 diagonal filter."""
    import jax.numpy as jnp
    from skyrim_tpu.models.sfno import SpectralAttention

    cfg = SFNO_TINY
    filt = SpectralAttention(
        cfg, (16, 32), "legendre-gauss", (16, 32), "legendre-gauss"
    )
    rng = np.random.default_rng(3)
    x = rng.normal(size=(16, 32, cfg.embed_dim)).astype(np.float32)
    v = filt.init(jax.random.key(1), jnp.asarray(x))
    # init scale is the official 1/embed² (tiny); amplify so the cross-
    # channel signal clears float noise
    v = jax.tree.map(lambda a: a * 64.0, v)
    y0 = np.asarray(filt.apply(v, jnp.asarray(x)))
    x2 = x.copy()
    x2[..., 0] += 1.0  # bump channel 0 only
    y1 = np.asarray(filt.apply(v, jnp.asarray(x2)))
    cross = np.abs(y1[..., 1:] - y0[..., 1:]).max()
    assert cross > 1e-6, "spectral filter failed to mix channels"


def test_sfno_param_count_fcnv2_sm():
    """Full config must land in the published fcnv2_sm class: 288.7 M
    params, 265.8 M of which is the full-res position embedding
    (1, 256, 721, 1440) — vs the 3.5 M round-1 stand-in."""
    import jax.tree_util as jtu

    model = FourCastNetV2Model()
    shapes = jax.eval_shape(model.init_params, jax.random.key(0))
    n = sum(int(np.prod(l.shape)) for l in jtu.tree_leaves(shapes))
    assert n == 288_676_754
    pe = shapes["net"]["pos_embed"]
    assert pe.shape == (721, 1440, 256)
