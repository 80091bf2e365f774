"""Sharded-rollout parity across the whole model zoo.

Every model family must produce (near-)identical outputs when its
rollout state is domain-decomposed over a multi-device mesh — this is
the multi-chip guarantee behind `__graft_entry__.dryrun_multichip` and
the net-new scaling story of SURVEY.md §2.10 (the reference is strictly
single-GPU).  Runs on the virtual 8-device CPU mesh (conftest).
"""

import jax
import numpy as np
import pytest

from skyrim_tpu.parallel.mesh import make_mesh
from skyrim_tpu.parallel.sharding import shard_state, sharded_scan_rollout
from skyrim_tpu.rollout import scan_rollout


def _pangu():
    from skyrim_tpu.models.pangu import PanguConfig, PanguModel

    cfg = PanguConfig(
        lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2)
    )
    return PanguModel("pangu", cfg=cfg)


def _afno():
    from skyrim_tpu.models.afno import AFNOConfig, FourCastNetModel

    return FourCastNetModel(
        AFNOConfig(lat=64, lon=128, in_channels=5, patch=8, embed_dim=32, depth=2,
                   num_blocks=4)
    )


def _sfno():
    from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

    return FourCastNetV2Model(
        SFNOConfig(lat=65, lon=128, in_channels=5, embed_dim=32, num_layers=2,
                   scale_factor=4)
    )


def _fuxi():
    from skyrim_tpu.models.fuxi import FuXiConfig, FuXiModel

    return FuXiModel(
        FuXiConfig(lat=49, lon=96, in_channels=6, embed_dim=32, depth=2,
                   num_heads=2, stage_steps=2, n_stages=3, attn_v2=False)
    )


def _fuxi_v2():
    # the production default: Swin-V2 cores, GSPMD sharding path
    from skyrim_tpu.models.fuxi import FuXiConfig, FuXiModel

    return FuXiModel(
        FuXiConfig(lat=49, lon=96, in_channels=6, embed_dim=32, depth=2,
                   num_heads=2, stage_steps=2, n_stages=3)
    )


def _fengwu():
    from skyrim_tpu.models.fengwu import FengWuConfig, FengWuModel

    return FengWuModel(
        FengWuConfig(lat=49, lon=96, levels=3, surface_channels=2, level_vars=2,
                     modal_dim=8, fuser_dim=24, depth=2, num_heads=2)
    )


def _graphcast():
    from skyrim_tpu.models.graphcast import GraphCastConfig, GraphCastModel

    return GraphCastModel(
        GraphCastConfig(lat=19, lon=36, in_channels=4, latent=16,
                        processor_rounds=2, mesh_refinements=2, edge_chunks=2)
    )


def _dlwp():
    from skyrim_tpu.models.dlwp import DLWPModel

    return DLWPModel(face_size=16, features=(8, 16))


FAMILIES = {
    "pangu": _pangu,
    "fourcastnet": _afno,
    "fourcastnet_v2": _sfno,
    "fuxi": _fuxi,
    "fuxi_v2": _fuxi_v2,
    "fengwu": _fengwu,
    "graphcast": _graphcast,
    "dlwp": _dlwp,
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_sharded_rollout_matches_single_device(family):
    model = FAMILIES[family]()
    params = model.init_params(jax.random.key(0))
    nc = len(model.channels)
    H, W = model.grid.shape
    x0 = (
        np.random.default_rng(0)
        .normal(size=(model.n_history, nc, H, W))
        .astype(np.float32)
    )

    state = model.init_state(params, x0)
    _, ys_single = scan_rollout(model, params, state, n_steps=2)

    # lon always divides; lat only sometimes (compatible_spec degrades it)
    mesh = make_mesh(dp=2, lat=1, lon=4)
    run = sharded_scan_rollout(model, mesh, n_steps=2)
    state2 = shard_state(mesh, model.init_state(params, x0))
    _, ys_sharded = run(params, state2)

    a, b = np.asarray(ys_single), np.asarray(ys_sharded)
    assert a.shape == b.shape
    scale = np.abs(a).mean() + 1e-6
    np.testing.assert_allclose(a / scale, b / scale, atol=5e-3)
