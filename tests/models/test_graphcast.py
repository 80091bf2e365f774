import jax
import numpy as np
import pytest

from skyrim_tpu.models.graphcast import GraphCastConfig, GraphCastModel
from skyrim_tpu.ops.graph import build_graphs
from skyrim_tpu.rollout import scan_rollout

TINY = GraphCastConfig(
    lat=19, lon=36, in_channels=4, latent=16, processor_rounds=2,
    mesh_refinements=2, edge_chunks=2,
)


def test_build_graphs_tables():
    g = build_graphs(19, 36, 2)
    assert g["n_mesh"] == 162
    assert g["n_grid"] == 19 * 36
    # every grid point receives from exactly 3 mesh vertices
    assert len(g["m2g_dst"]) == 3 * g["n_grid"]
    # sorted destinations for segment_sum
    assert (np.diff(g["mesh_dst"]) >= 0).all()
    assert (np.diff(g["g2m_dst"]) >= 0).all()
    assert (np.diff(g["m2g_dst"]) >= 0).all()
    # multimesh includes coarse + fine edges over one node set
    assert g["mesh_src"].max() < 162
    # edge features finite, length positive
    assert np.isfinite(g["mesh_efeat"]).all()
    assert (g["mesh_efeat"][:, 0] > 0).all()
    # every mesh node gets at least one grid→mesh edge
    assert len(np.unique(g["g2m_dst"])) == 162


def test_m2g_barycentric_containment():
    """mesh→grid sources must be near the grid point (containing triangle)."""
    g = build_graphs(19, 36, 2)
    from skyrim_tpu.grid import icosahedral_multimesh

    mesh = icosahedral_multimesh(2)
    # max distance from a grid point to its source vertices is bounded by
    # the finest edge length
    tri = g["m2g_src"].reshape(-1, 3)
    assert (g["m2g_efeat"][:, 0] <= 1.5 * g["finest_edge"]).all()


@pytest.fixture(scope="module")
def tiny_gc():
    model = GraphCastModel(TINY)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_apply_shape(tiny_gc):
    model, params = tiny_gc
    x = np.random.default_rng(0).normal(size=(2, 4, 19, 36)).astype(np.float32)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 4, 19, 36)
    assert np.isfinite(np.asarray(y)).all()


def test_rollout_with_two_frame_history(tiny_gc):
    model, params = tiny_gc
    x = np.random.default_rng(1).normal(size=(2, 4, 19, 36)).astype(np.float32)
    state = model.init_state(params, x)
    assert state.x.shape == (2, 4, 19, 36)
    _, ys = scan_rollout(model, params, state, n_steps=3)
    assert ys.shape == (3, 4, 19, 36)
    assert np.isfinite(np.asarray(ys)).all()


def test_residual_identity_at_zero_net(tiny_gc):
    model, params = tiny_gc
    zeroed = dict(params)
    zeroed["net"] = jax.tree.map(lambda a: a * 0, params["net"])
    x = np.random.default_rng(2).normal(size=(2, 4, 19, 36)).astype(np.float32)
    y = np.asarray(jax.jit(model.apply)(zeroed, x))
    np.testing.assert_allclose(y[0], x[-1], atol=2e-2)
