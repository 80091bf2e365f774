"""Core orchestration tests using a boring fake backend (the reference's
BoringModel pattern, tests/core/test_base.py:7-27)."""

import datetime

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.core import GlobalModel, GlobalPrediction, Skyrim, adjust_lead_time
from skyrim_tpu.core.ensemble import GlobalEnsemble
from skyrim_tpu.grid import LatLonGrid
from skyrim_tpu.io.save import SaveConfig
from skyrim_tpu.models import MODELS
from skyrim_tpu.models.base import PrognosticModel, make_norm_params


class BoringModel(PrognosticModel):
    """Persistence + 1: y = x + 1. No parameters worth speaking of."""

    name = "boring"
    channels = ("t2m", "u10m", "v10m", "z500")
    grid = LatLonGrid(19, 36)
    n_history = 1

    def init_params(self, rng):
        return {"norm": make_norm_params(len(self.channels)), "bias": jnp.float32(1.0)}

    def apply(self, params, x):
        return (x[-1] + params["bias"])[None]


class BoringModelB(BoringModel):
    name = "boring_b"
    channels = ("t2m", "u10m", "msl")  # overlaps boring on t2m/u10m

    def apply(self, params, x):
        return (x[-1] + 3 * params["bias"])[None]


@pytest.fixture(autouse=True)
def register_boring(monkeypatch):
    MODELS["boring"] = BoringModel
    MODELS["boring_b"] = BoringModelB
    import skyrim_tpu.models as m
    import skyrim_tpu.core.skyrim as s

    monkeypatch.setattr(
        s, "AVAILABLE_MODELS", m.AVAILABLE_MODELS + ["boring", "boring_b"]
    )
    yield
    MODELS.pop("boring", None)
    MODELS.pop("boring_b", None)


T0 = datetime.datetime(2024, 5, 1, 0)


def test_adjust_lead_time():
    assert adjust_lead_time(25) == 24
    assert adjust_lead_time(6) == 6
    assert adjust_lead_time(5) == 0


def test_global_model_forecast():
    gm = GlobalModel("boring", ic_source="synthetic")
    out = gm.forecast(T0, n_steps=3)
    assert out.sizes == {"time": 4, "channel": 4, "lat": 19, "lon": 36}
    # y_n = IC + n
    np.testing.assert_allclose(out.data[3], out.data[0] + 3, rtol=1e-5)
    assert out.coords["time"][0] == np.datetime64(T0.isoformat(), "ns")


def test_global_model_predict_one_step():
    gm = GlobalModel("boring", ic_source="synthetic")
    out = gm.predict_one_step(T0)
    assert out.sizes["time"] == 2
    np.testing.assert_allclose(out.data[1], out.data[0] + 1, rtol=1e-5)


def test_global_model_rollout_saves_steps(tmp_path):
    gm = GlobalModel("boring", ic_source="synthetic")
    cfg = SaveConfig(output_dir=str(tmp_path))
    final, paths = gm.rollout(T0, n_steps=3, save=True, save_config=cfg)
    assert len(paths) == 3
    # first file labeled with the real source, later ones with "file"
    assert "__synthetic__" in paths[0]
    assert "__file__" in paths[1] and "__file__" in paths[2]
    assert final.sizes["time"] == 1


def test_global_model_rollout_no_save():
    gm = GlobalModel("boring", ic_source="synthetic")
    final, paths = gm.rollout(T0, n_steps=2, save=False)
    assert paths == []
    assert final is not None


def test_restart_from_saved_rollout(tmp_path):
    gm = GlobalModel("boring", ic_source="synthetic")
    cfg = SaveConfig(output_dir=str(tmp_path))
    _, paths = gm.rollout(T0, n_steps=1, save=True, save_config=cfg)
    gm2 = GlobalModel("boring", ic_source=f"file:{paths[-1]}")
    out = gm2.forecast(T0 + datetime.timedelta(hours=6), n_steps=1)
    base = gm.forecast(T0, n_steps=2)
    np.testing.assert_allclose(out.data[-1], base.data[-1], rtol=1e-5)


def test_skyrim_facade_predict(tmp_path):
    sky = Skyrim("boring", ic_source="synthetic")
    pred, paths = sky.predict(
        "20240501", "0000", lead_time=13, save=True,
        save_config=SaveConfig(output_dir=str(tmp_path)),
    )
    # 13h floored to 12h = 2 steps
    assert len(paths) == 2
    assert isinstance(pred, GlobalPrediction)


def test_skyrim_invalid_model():
    with pytest.raises(ValueError, match="invalid model"):
        Skyrim("not_a_model")


def test_prediction_point_and_wind():
    gm = GlobalModel("boring", ic_source="synthetic")
    pred = GlobalPrediction(gm.forecast(T0, n_steps=1))
    ws = pred.wind_speed(41.0, 29.0)
    u, v = pred.point_wind_uv(41.0, 29.0)
    np.testing.assert_allclose(ws, np.sqrt(u**2 + v**2))
    sl = pred.slice(channel="t2m", n_step=0)
    assert sl.dims == ("lat", "lon")


def test_ensemble_mean_over_common_channels():
    ens = GlobalEnsemble(["boring", "boring_b"], ic_source="synthetic")
    out = ens.forecast(T0, n_steps=1)
    # intersection of channels, sorted
    assert list(out.coords["channel"]) == ["t2m", "u10m"]
    # members share the same synthetic IC; mean of (+1) and (+3) = IC + 2
    # (fetch is deterministic per (time, channel))
    gm = GlobalModel("boring", ic_source="synthetic")
    base = gm.forecast(T0, n_steps=1).sel(channel=["t2m", "u10m"])
    np.testing.assert_allclose(out.data[-1], base.data[0] + 2, rtol=1e-5)


def test_ensemble_rollout_saves(tmp_path):
    ens = GlobalEnsemble(["boring", "boring_b"], ic_source="synthetic")
    final, paths = ens.rollout(
        T0, n_steps=2, save=True, save_config=SaveConfig(output_dir=str(tmp_path))
    )
    # 2 per member + 1 mean
    assert len(paths) == 5
    assert final.sizes["time"] == 1


def test_ensemble_rollout_no_save():
    ens = GlobalEnsemble(["boring", "boring_b"], ic_source="synthetic")
    final, paths = ens.rollout(T0, n_steps=1, save=False)
    assert paths == []
    assert final is not None
