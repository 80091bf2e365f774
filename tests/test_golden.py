"""Golden-value numerical regression tests.

The reference has no numerical regression coverage (SURVEY.md §4 "what's
not tested"); these pin each architecture's forward pass on fixed seeds
so refactors (kernel swaps, dtype changes, fusion rewrites) are caught.
Regenerate deliberately via the script in the git history when an
intentional numerical change lands.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

GOLDEN = json.loads((Path(__file__).parent / "golden_values.json").read_text())


def _build(name):
    from skyrim_tpu.grid import (
        LatLonGrid,
        cubed_sphere_to_latlon_patch,
        latlon_to_cubed_sphere_patch,
    )
    from skyrim_tpu.models.afno import AFNOConfig, FourCastNetModel
    from skyrim_tpu.models.dlwp import DLWPModel
    from skyrim_tpu.models.fengwu import FengWuConfig, FengWuModel
    from skyrim_tpu.models.fuxi import FuXiConfig, FuXiModel
    from skyrim_tpu.models.graphcast import GraphCastConfig, GraphCastModel
    from skyrim_tpu.models.pangu import PanguConfig, PanguModel
    from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

    if name == "pangu":
        return PanguModel("pangu6", cfg=PanguConfig(
            lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2)))
    if name == "sfno":
        return FourCastNetV2Model(SFNOConfig(
            lat=49, lon=96, in_channels=5, embed_dim=16, num_layers=2, scale_factor=4))
    if name == "afno":
        return FourCastNetModel(AFNOConfig(
            lat=48, lon=96, in_channels=5, patch=8, embed_dim=16, depth=2, num_blocks=2))
    if name == "fuxi":
        return FuXiModel(FuXiConfig(
            lat=49, lon=96, in_channels=5, embed_dim=16, depth=2, num_heads=2))
    if name == "fengwu":
        return FengWuModel(FengWuConfig(
            lat=49, lon=96, levels=3, surface_channels=2, level_vars=2,
            modal_dim=8, fuser_dim=24, depth=2, num_heads=2))
    if name == "graphcast":
        return GraphCastModel(GraphCastConfig(
            lat=19, lon=36, in_channels=4, latent=16, processor_rounds=2,
            mesh_refinements=2, edge_chunks=2))
    if name == "dlwp":
        m = DLWPModel(face_size=16, features=(8, 16))
        m.grid = LatLonGrid(73, 144)
        m._to_cs = latlon_to_cubed_sphere_patch(16, 73, 144)
        m._to_ll = cubed_sphere_to_latlon_patch(16, 73, 144)
        return m
    raise KeyError(name)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_forward(name):
    g = GOLDEN[name]
    model = _build(name)
    params = model.init_params(jax.random.key(7))
    rng = np.random.default_rng(13)
    x = rng.normal(size=model.state_shape).astype(np.float32)
    y = np.asarray(jax.jit(model.apply)(params, x), np.float64)
    assert list(y.shape) == g["shape"]
    flat = y.reshape(-1)
    # bf16 compute → tolerances scaled to the output std
    tol = 3e-2 * (abs(g["std"]) + 1e-6)
    assert abs(flat.mean() - g["mean"]) < tol, (flat.mean(), g["mean"])
    assert abs(flat.std() - g["std"]) < tol
    np.testing.assert_allclose(
        flat[np.asarray(g["samples_idx"])], g["samples"], atol=10 * tol
    )
