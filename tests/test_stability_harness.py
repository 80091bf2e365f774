"""Hermetic (CPU, tiny-config) coverage of the stability harness."""

import jax
import numpy as np
import pytest

from skyrim_tpu.models.pangu import PanguConfig, PanguModel
from skyrim_tpu.utils.stability import (
    climatological_norm,
    climatological_params,
    precision_divergence,
    stability_rollout,
    synthetic_ic,
)


@pytest.fixture(scope="module")
def tiny_pangu():
    cfg = PanguConfig(
        lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2)
    )
    model = PanguModel("pangu6", cfg=cfg)
    params = climatological_params(model, jax.random.key(0))
    return model, params


def test_climatological_norm_matches_ic_scales(tiny_pangu):
    """normalize(climatological_norm, synthetic IC) lands near N(0,1):
    the IC generator and the norm stats share one climatology."""
    model, params = tiny_pangu
    x0 = synthetic_ic(model)
    norm = climatological_norm(model.channels)
    mean = np.asarray(norm["mean"]).reshape(-1, 1, 1)
    std = np.asarray(norm["std"]).reshape(-1, 1, 1)
    z = (x0[0] - mean) / std
    rms = float(np.sqrt(np.mean(z**2)))
    assert 0.2 < rms < 3.0, f"normalized IC rms {rms}"


def test_stability_rollout_stats(tiny_pangu):
    model, params = tiny_pangu
    x0 = synthetic_ic(model)
    r = stability_rollout(model, params, x0, 4)
    assert r["n_steps"] == 4
    assert len(r["rms"]) == 4 and len(r["amax"]) == 4
    assert r["all_finite"]
    assert all(np.isfinite(v) for v in r["rms"])
    assert r["growth_per_step_geo"] < 1.5


def test_precision_divergence_small_at_step1(tiny_pangu):
    model, params = tiny_pangu
    x0 = synthetic_ic(model)
    d = precision_divergence(model, params, x0, 2)
    assert len(d["rel_l2"]) == 2
    # bf16-vs-fp32 after one step is rounding-scale, not structural
    assert 0.0 < d["rel_l2"][0] < 0.05


def test_perturbation_control_scales_with_eps(tiny_pangu):
    """The same-precision control curve starts at ~eps scale (linear
    regime) and stays finite — the chaos-vs-precision separator."""
    from skyrim_tpu.utils.stability import perturbation_control

    model, params = tiny_pangu
    x0 = synthetic_ic(model)
    c = perturbation_control(model, params, x0, 3, eps=1e-4)
    assert len(c["rel_l2"]) == 3
    assert all(np.isfinite(v) for v in c["rel_l2"])
    # step-1 relative divergence is the same order as the IC perturbation
    assert 1e-6 < c["rel_l2"][0] < 1e-1
    assert c["implied_bf16_floor_last_step"] > 0


def test_delta_decomposition_shapes(tiny_pangu):
    """State/increment RMS decomposition is finite and well-formed.

    The fit statistics are DESCRIPTIVE — which regime (random walk vs
    contraction) applies depends on the model's architecture and is
    interpreted against the full-res artifacts, not asserted here."""
    from skyrim_tpu.utils.stability import delta_decomposition

    model, params = tiny_pangu
    x0 = synthetic_ic(model)
    d = delta_decomposition(model, params, x0, 8)
    assert len(d["rms"]) == 8 and len(d["rms_delta"]) == 8
    assert all(np.isfinite(v) for v in d["rms"] + d["rms_delta"])
    assert np.isfinite(d["walk_fit_rel_err"])
    assert all(v > 0 for v in d["rms_delta"])


def test_delta_decomposition_frames_out_two():
    """The carry handles multi-frame models (DLWP emits 2 frames/call)."""
    from skyrim_tpu.grid import (
        LatLonGrid,
        cubed_sphere_to_latlon_patch,
        latlon_to_cubed_sphere_patch,
    )
    from skyrim_tpu.models.dlwp import DLWPModel
    from skyrim_tpu.utils.stability import delta_decomposition

    model = DLWPModel(face_size=16, features=(8, 16))
    model.grid = LatLonGrid(73, 144)
    model._to_cs = latlon_to_cubed_sphere_patch(16, 73, 144)
    model._to_ll = cubed_sphere_to_latlon_patch(16, 73, 144)
    params = climatological_params(model, jax.random.key(0))
    x0 = synthetic_ic(model)
    d = delta_decomposition(model, params, x0, 4)
    assert len(d["rms"]) == 2  # per-call stats: 4 frames / 2 per call
    assert all(np.isfinite(v) for v in d["rms"] + d["rms_delta"])
