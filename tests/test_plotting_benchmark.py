import datetime
import gzip
import json

import numpy as np
import pytest

from skyrim_tpu.field import Field


def _step_field(i):
    t = datetime.datetime(2024, 5, 1, 6 * (i + 1))
    rng = np.random.default_rng(i)
    data = rng.normal(280, 10, (1, 3, 19, 36)).astype(np.float32)
    return Field.from_canonical(
        data, [t], ["t2m", "u10m", "v10m"], np.linspace(90, -90, 19),
        np.arange(36) * 10.0,
    )


def test_generate_rollout_gif(tmp_path):
    from skyrim_tpu.plotting import generate_rollout_gif

    steps = [_step_field(i) for i in range(3)]
    out = generate_rollout_gif(steps, "t2m", str(tmp_path / "roll.gif"))
    data = (tmp_path / "roll.gif").read_bytes()
    assert data[:6] in (b"GIF87a", b"GIF89a")
    assert len(data) > 1000


def test_plot_wind_speed(tmp_path):
    from skyrim_tpu.plotting import plot_wind_speed

    steps = [_step_field(i) for i in range(3)]
    out = plot_wind_speed(steps, 41.0, 29.0, output_path=str(tmp_path / "ws.png"))
    assert (tmp_path / "ws.png").exists()


def test_openmeteo_forecast_parsing():
    from skyrim_tpu.data import openmeteo

    payload = {
        "hourly": {
            "time": ["2024-05-01T00:00", "2024-05-01T01:00"],
            "temperature_2m": [15.0, 16.0],
            "pressure_msl": [1013.0, 1012.5],
        }
    }

    def fake_transport(url, **kw):
        assert "latitude=41.0" in url and "models=ecmwf_ifs" in url
        return json.dumps(payload).encode()

    openmeteo.forecast.cache_clear()
    df = openmeteo.forecast(
        41.0, 29.0, "2024-05-01", "2024-05-01", ("t2m", "msl"),
        transport=fake_transport,
    )
    assert list(df.columns) == ["t2m", "msl"]
    assert df["t2m"].iloc[1] == 16.0


def test_observations_parsing():
    from skyrim_tpu.data import observations as obs

    stations = [
        {"id": "17060", "location": {"latitude": 40.9, "longitude": 29.2}},
        {"id": "99999", "location": {"latitude": -33.0, "longitude": 151.0}},
    ]
    csv_rows = "\n".join(
        f"2024-05-01,{h},15.{h},10.0,60,0.0,,180,18.0,,1013.2,,3" for h in range(24)
    )

    def fake_transport(url, **kw):
        if "stations" in url:
            return gzip.compress(json.dumps(stations).encode())
        assert "17060" in url  # nearest station chosen
        return gzip.compress(csv_rows.encode())

    obs._STATIONS_CACHE = None
    df = obs.observe(
        41.0, 29.0,
        datetime.datetime(2024, 5, 1, 0), datetime.datetime(2024, 5, 1, 23),
        transport=fake_transport,
    )
    assert "o_t2m" in df.columns and "o_si10" in df.columns
    # km/h → m/s
    assert df["o_si10"].iloc[0] == pytest.approx(18.0 / 3.6)
    assert df.attrs["station"]["id"] == "17060"
    obs._STATIONS_CACHE = None
