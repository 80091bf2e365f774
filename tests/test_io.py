import datetime

import numpy as np
import pytest

from skyrim_tpu.field import Field
from skyrim_tpu.io import (
    SaveConfig,
    generate_filename,
    generate_forecast_id,
    load_forecast,
    save_forecast,
)
from skyrim_tpu.io.netcdf import read_netcdf, write_netcdf
from skyrim_tpu.io.zarrlite import ZarrStore, open_store, read_zarr, write_zarr


def test_forecast_id_format():
    fid = generate_forecast_id()
    assert len(fid) == 10
    assert all(c.isalnum() for c in fid)
    assert "0" not in fid and "O" not in fid and "I" not in fid and "l" not in fid


def test_generate_filename():
    t0 = datetime.datetime(2024, 5, 7, 0, 0)
    t1 = datetime.datetime(2024, 5, 8, 0, 0)
    name = generate_filename("pangu", t0, t1, "gfs")
    assert name == "pangu__gfs__20240507_00:00__20240508_00:00.nc"


def test_netcdf_roundtrip(tmp_path, mock_forecast):
    path = tmp_path / "f.nc"
    write_netcdf(mock_forecast, path)
    back = read_netcdf(path)
    assert back.dims == mock_forecast.dims
    np.testing.assert_allclose(back.data, mock_forecast.data, rtol=1e-6)
    assert list(back.coords["channel"]) == list(mock_forecast.coords["channel"])
    np.testing.assert_array_equal(back.coords["time"], mock_forecast.coords["time"])
    np.testing.assert_allclose(back.coords["lat"], mock_forecast.coords["lat"])
    assert back.attrs.get("note") == "synthetic"


def test_zarr_roundtrip(tmp_path, mock_forecast):
    store = tmp_path / "f.zarr"
    write_zarr(mock_forecast, store)
    back = read_zarr(store)
    np.testing.assert_allclose(back.data, mock_forecast.data, rtol=1e-6)
    assert list(back.coords["channel"]) == list(mock_forecast.coords["channel"])
    np.testing.assert_array_equal(back.coords["time"], mock_forecast.coords["time"])
    # consolidated metadata present
    assert (store / ".zmetadata").exists()


def test_zarr_append(tmp_path, mock_forecast):
    store = tmp_path / "f.zarr"
    a = mock_forecast.isel(time=[0])
    b = mock_forecast.isel(time=[1])
    c = mock_forecast.isel(time=[2])
    write_zarr(a, store)
    write_zarr(b, store, append=True)
    write_zarr(c, store, append=True)
    back = read_zarr(store)
    assert back.sizes["time"] == 3
    np.testing.assert_allclose(back.data, mock_forecast.data, rtol=1e-6)
    np.testing.assert_array_equal(back.coords["time"], mock_forecast.coords["time"])


def test_zarr_readable_by_stock_zarr(tmp_path, mock_forecast):
    zarr = pytest.importorskip("zarr")
    store = tmp_path / "f.zarr"
    write_zarr(mock_forecast, store)
    g = zarr.open_group(str(store))
    np.testing.assert_allclose(g["forecast"][:], mock_forecast.data, rtol=1e-6)


def test_save_forecast_local_netcdf(tmp_path, mock_forecast):
    t0 = datetime.datetime(2024, 5, 1, 0)
    t1 = datetime.datetime(2024, 5, 1, 18)
    cfg = SaveConfig(output_dir=str(tmp_path))
    path = save_forecast(mock_forecast, "pangu", t0, t1, "gfs", cfg)
    assert path.endswith(".nc")
    back = load_forecast(path)
    assert back.attrs["model"] == "pangu"
    assert back.attrs["forecast_id"] == cfg.forecast_id
    np.testing.assert_allclose(back.data, mock_forecast.data, rtol=1e-6)


def test_save_forecast_local_zarr_appends(tmp_path, mock_forecast):
    t0 = datetime.datetime(2024, 5, 1, 0)
    cfg = SaveConfig(output_dir=str(tmp_path), file_type="zarr")
    for i in range(3):
        step = mock_forecast.isel(time=[i])
        path = save_forecast(step, "pangu", t0, t0, "gfs", cfg)
    back = load_forecast(path)
    assert back.sizes["time"] == 3


def test_save_forecast_filter_vars(tmp_path, mock_forecast):
    t0 = datetime.datetime(2024, 5, 1, 0)
    cfg = SaveConfig(output_dir=str(tmp_path), filter_vars=("t2m",))
    path = save_forecast(mock_forecast, "dlwp", t0, t0, "cds", cfg)
    back = load_forecast(path)
    assert back.sizes["channel"] == 1
    assert list(back.coords["channel"]) == ["t2m"]


def test_fsspec_memory_store(mock_forecast):
    store = open_store("memory://testbucket/f.zarr")
    zs = ZarrStore(store)
    zs.write_field(mock_forecast)
    back = zs.read_field()
    np.testing.assert_allclose(back.data, mock_forecast.data, rtol=1e-6)
