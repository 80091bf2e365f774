import datetime

import jax
import numpy as np
import pytest

from skyrim_tpu.core.ic_ensemble import (
    ensemble_mean,
    ensemble_spread,
    ic_ensemble_forecast,
    perturb_members,
)

T0 = datetime.datetime(2024, 5, 1, 0)


def test_perturb_members_control_unchanged():
    x0 = np.random.default_rng(0).normal(size=(1, 3, 9, 18)).astype(np.float32)
    members = perturb_members(x0, 4, scale=0.05)
    assert members.shape == (4, 1, 3, 9, 18)
    np.testing.assert_array_equal(members[0], x0)
    # perturbations scale with per-channel std
    for m in range(1, 4):
        assert not np.array_equal(members[m], x0)
        rel = np.abs(members[m] - x0) / x0.std(axis=(-2, -1), keepdims=True)
        assert rel.max() < 0.5  # 0.05 × ~N(0,1)


def test_ic_ensemble_forecast_contract(monkeypatch):
    """End-to-end on a tiny SFNO registered as a fake model."""
    from skyrim_tpu.models import MODELS
    from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

    class TinySFNO(FourCastNetV2Model):
        name = "tiny_sfno"

        def __init__(self):
            super().__init__(
                SFNOConfig(lat=17, lon=32, in_channels=3, embed_dim=8,
                           num_layers=1, scale_factor=4)
            )
            self.channels = ("t2m", "u10m", "v10m")

    MODELS["tiny_sfno"] = TinySFNO
    try:
        out = ic_ensemble_forecast(
            "tiny_sfno", T0, n_steps=2, n_members=4,
            perturb_scale=0.01, ic_source="synthetic",
        )
    finally:
        MODELS.pop("tiny_sfno", None)

    assert out.dims == ("number", "time", "channel", "lat", "lon")
    assert out.sizes["number"] == 4 and out.sizes["time"] == 2
    mean = ensemble_mean(out)
    spread = ensemble_spread(out)
    assert mean.dims == ("time", "channel", "lat", "lon")
    assert spread.data.min() >= 0
    assert spread.data.max() > 0  # members genuinely differ
