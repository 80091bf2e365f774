import datetime

import numpy as np
import pytest

from skyrim_tpu.field import Field


def test_construction_and_sizes(mock_forecast):
    f = mock_forecast
    assert f.dims == ("time", "channel", "lat", "lon")
    assert f.sizes == {"time": 3, "channel": 4, "lat": 19, "lon": 36}


def test_coord_length_validation():
    with pytest.raises(ValueError):
        Field(np.zeros((2, 3)), ("a", "b"), coords={"a": np.arange(5)})


def test_isel_scalar_drops_dim(mock_forecast):
    f = mock_forecast.isel(time=0)
    assert f.dims == ("channel", "lat", "lon")
    assert "time" not in f.coords


def test_isel_list(mock_forecast):
    f = mock_forecast.isel(channel=[0, 2])
    assert f.sizes["channel"] == 2
    assert list(f.coords["channel"]) == ["t2m", "v10m"]


def test_sel_channel(mock_forecast):
    f = mock_forecast.sel(channel=["z500", "t2m"])
    assert list(f.coords["channel"]) == ["z500", "t2m"]
    np.testing.assert_array_equal(
        f.data[:, 0], mock_forecast.data[:, 3]
    )


def test_sel_nearest_latlon(mock_forecast):
    f = mock_forecast.sel(lat=41.3, lon=28.9, method="nearest")
    assert f.dims == ("time", "channel")
    # nearest grid points: lat 40 (19 pts, 10° spacing), lon 30
    assert f.data.shape == (3, 4)


def test_sel_lon_wraps(mock_forecast):
    f = mock_forecast.sel(lon=-10.0, method="nearest")
    # -10 → 350
    np.testing.assert_array_equal(f.data, mock_forecast.data[..., 35])


def test_sel_lat_slice_descending(mock_forecast):
    f = mock_forecast.sel(lat=slice(60, 30))
    assert f.coords["lat"].max() <= 60 and f.coords["lat"].min() >= 30
    assert f.sizes["lat"] == 4


def test_sel_time(mock_forecast):
    t = datetime.datetime(2024, 5, 1, 6)
    f = mock_forecast.sel(time=t)
    assert f.dims == ("channel", "lat", "lon")


def test_transpose(mock_forecast):
    f = mock_forecast.transpose("channel", "time", "lat", "lon")
    assert f.dims == ("channel", "time", "lat", "lon")
    assert f.shape == (4, 3, 19, 36)


def test_concat_time(mock_forecast):
    a = mock_forecast.isel(time=[0])
    b = mock_forecast.isel(time=[1, 2])
    c = Field.concat([a, b], "time")
    np.testing.assert_array_equal(c.data, mock_forecast.data)
    np.testing.assert_array_equal(c.coords["time"], mock_forecast.coords["time"])


def test_concat_new_dim(mock_forecast):
    c = Field.concat([mock_forecast, mock_forecast], "model")
    assert c.dims[0] == "model"
    assert c.shape[0] == 2


def test_mean(mock_forecast):
    m = mock_forecast.mean("time")
    assert m.dims == ("channel", "lat", "lon")
    np.testing.assert_allclose(m.data, mock_forecast.data.mean(0), rtol=1e-6)


def test_arithmetic(mock_forecast):
    d = mock_forecast - mock_forecast
    assert np.abs(d.data).max() == 0
    s = mock_forecast * 2
    np.testing.assert_allclose(s.data, mock_forecast.data * 2)
