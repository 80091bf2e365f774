"""NWP user-surface tests: predict/save and snipe with fake transports
(reference test_ens.py:149-187 pattern)."""

import datetime

import numpy as np
import pytest

from skyrim_tpu.data import grib
from skyrim_tpu.data.gfs import GFSModel
from skyrim_tpu.data.schedules import ScheduleError

T0 = datetime.datetime(2024, 5, 7, 0)


class ConstTransport:
    """Any .idx request gets a single-message index; any range returns an
    encoded constant field."""

    def __init__(self, value=7.0):
        self.msg = grib.encode_simple(np.full((721, 1440), value, np.float32))
        self.idx = f"1:0:d=2024050700:UGRD:10 m above ground:anl:".encode()
        self.head_calls = []

    def __call__(self, url, offset=None, length=None):
        if url.endswith(".idx"):
            return self.idx
        data = self.msg
        if offset is not None:
            end = None if length is None else offset + length
            return data[offset:end]
        return data


def test_predict_saves_forecast(tmp_path):
    model = GFSModel(["u10m"], transport=ConstTransport(), cache=False, max_workers=1)
    field, path = model.predict(
        "20240507", "0000", lead_time=12, time_step=6, save=True,
        save_config={"output_dir": str(tmp_path)},
    )
    assert field.sizes["time"] == 3  # steps 0, 6, 12
    from skyrim_tpu.io import load_forecast

    back = load_forecast(path)
    np.testing.assert_allclose(back.data, 7.0, atol=1e-3)
    assert "gfs" in path


def test_forecast_invalid_lead_time():
    model = GFSModel(["u10m"], transport=ConstTransport(), cache=False, max_workers=1)
    with pytest.raises(ScheduleError):
        model.forecast(T0, lead_time=122)  # not in GFS schedule


def test_snipe_collects_cycles(monkeypatch):
    model = GFSModel(["u10m"], transport=ConstTransport(), cache=False, max_workers=1)
    monkeypatch.setattr(GFSModel, "available", lambda self, init: True)
    out = model.snipe("20240507", "0600", max_hours_back=12)
    # valid time 06z reachable from init 06z(+0h) and 00z(+6h)
    inits = sorted(out)
    assert "2024-05-07T00:00:00" in inits and "2024-05-07T06:00:00" in inits
    for f in out.values():
        assert f.sizes["time"] == 1


def test_snipe_skips_unavailable(monkeypatch):
    model = GFSModel(["u10m"], transport=ConstTransport(), cache=False, max_workers=1)
    monkeypatch.setattr(
        GFSModel, "available", lambda self, init: init.hour != 0
    )
    out = model.snipe("20240507", "0600", max_hours_back=12)
    assert "2024-05-07T00:00:00" not in out
    assert "2024-05-07T06:00:00" in out


def test_list_available_channels():
    chans = GFSModel.list_available_channels()
    assert "u10m" in chans and "z500" in chans and len(chans) == 86
