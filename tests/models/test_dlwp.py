import jax
import numpy as np
import pytest

from skyrim_tpu.models.dlwp import DLWPModel
from skyrim_tpu.rollout import scan_rollout, stream_rollout


@pytest.fixture(scope="module")
def small_dlwp():
    """Tiny DLWP on a coarse grid for fast CPU tests."""
    from skyrim_tpu.grid import LatLonGrid

    model = DLWPModel(face_size=16, features=(8, 16))
    model.grid = LatLonGrid(73, 144)
    model._to_cs = __import__("skyrim_tpu.grid", fromlist=["g"]).latlon_to_cubed_sphere_patch(16, 73, 144)
    model._to_ll = __import__("skyrim_tpu.grid", fromlist=["g"]).cubed_sphere_to_latlon_patch(16, 73, 144)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_apply_shapes(small_dlwp):
    model, params = small_dlwp
    x = np.random.default_rng(0).normal(size=(2, 7, 73, 144)).astype(np.float32)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (2, 7, 73, 144)
    assert np.isfinite(np.asarray(y)).all()


def test_scan_rollout(small_dlwp):
    model, params = small_dlwp
    x = np.random.default_rng(0).normal(size=(2, 7, 73, 144)).astype(np.float32)
    state = model.init_state(params, x)
    final, ys = scan_rollout(model, params, state, n_steps=4)
    assert ys.shape == (4, 7, 73, 144)
    assert int(final.step) == 4


def test_stream_matches_scan(small_dlwp):
    model, params = small_dlwp
    x = np.random.default_rng(1).normal(size=(2, 7, 73, 144)).astype(np.float32)
    state = model.init_state(params, x)
    _, ys = scan_rollout(model, params, state, n_steps=3)
    state2 = model.init_state(params, x)
    frames = list(stream_rollout(model, params, state2, n_steps=3))
    assert len(frames) == 3
    for a, b in zip(np.asarray(ys), frames):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_history_fill_single_frame(small_dlwp):
    model, params = small_dlwp
    x = np.random.default_rng(2).normal(size=(7, 73, 144)).astype(np.float32)
    state = model.init_state(params, x)
    assert state.x.shape == (2, 7, 73, 144)
    np.testing.assert_array_equal(np.asarray(state.x[0]), np.asarray(state.x[1]))


def test_determinism(small_dlwp):
    model, params = small_dlwp
    x = np.random.default_rng(3).normal(size=(2, 7, 73, 144)).astype(np.float32)
    y1 = np.asarray(jax.jit(model.apply)(params, x))
    y2 = np.asarray(jax.jit(model.apply)(params, x))
    np.testing.assert_array_equal(y1, y2)
