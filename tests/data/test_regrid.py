"""IC regrid + pressure-level interpolation (round-2 VERDICT item 8;
reference skyrim/libs/ic/ifs.py:38-51,161-170 semantics)."""

import numpy as np
import pytest

from skyrim_tpu.data.regrid import (
    interp_pressure_levels,
    regrid_latlon,
    to_canonical_grid,
)


def _linear_field(lat, lon):
    # a field linear in lat and sinusoidal (periodic) in lon so bilinear
    # interpolation over a fine-enough grid is near-exact
    return 2.0 * lat[:, None] + 10 * np.sin(np.deg2rad(lon))[None, :]


def test_regrid_04deg_to_canonical():
    """A synthetic 0.4° field lands on 0.25° within interpolation error."""
    src_lat = np.linspace(90, -90, 451)   # 0.4°
    src_lon = np.arange(0, 360, 0.4)
    dst_lat = np.linspace(90, -90, 721)
    dst_lon = np.arange(0, 360, 0.25)
    f = _linear_field(src_lat, src_lon)
    out = regrid_latlon(f, src_lat, src_lon, dst_lat, dst_lon)
    truth = _linear_field(dst_lat, dst_lon)
    assert out.shape == (721, 1440)
    np.testing.assert_allclose(out, truth, atol=2e-4)


def test_regrid_periodic_longitude():
    """Points past the last lon node wrap through the 360→0 seam."""
    src_lat = np.linspace(90, -90, 19)
    src_lon = np.arange(0, 360, 20.0)  # last node 340
    f = np.tile(np.cos(np.deg2rad(src_lon))[None], (19, 1))
    out = regrid_latlon(f, src_lat, src_lon, src_lat, np.asarray([350.0]))
    # cos(350°) via linear blend of cos(340°) and cos(0°)
    expect = 0.5 * (np.cos(np.deg2rad(340)) + 1.0)
    np.testing.assert_allclose(out[:, 0], expect, atol=1e-12)


def test_regrid_lat_extrapolation():
    """A source missing the poles extrapolates linearly (the reference's
    fill_value='extrapolate')."""
    src_lat = np.linspace(85, -85, 35)  # no poles
    src_lon = np.arange(0, 360, 10.0)
    f = _linear_field(src_lat, src_lon)
    out = regrid_latlon(f, src_lat, src_lon, np.asarray([90.0, -90.0]), src_lon)
    truth = _linear_field(np.asarray([90.0, -90.0]), src_lon)
    np.testing.assert_allclose(out, truth, atol=1e-10)


def test_interp_missing_pressure_level():
    """A source lacking 925 hPa interpolates it from 850/1000."""
    src = np.asarray([1000.0, 850.0, 500.0])
    dst = np.asarray([1000.0, 925.0, 850.0, 500.0])
    vals = np.stack([np.full((4, 8), 10.0), np.full((4, 8), 4.0),
                     np.full((4, 8), 1.0)])
    out = interp_pressure_levels(vals, src, dst)
    assert out.shape == (4, 4, 8)
    np.testing.assert_allclose(out[0], 10.0)
    np.testing.assert_allclose(out[1], 7.0)  # midpoint of 1000/850
    np.testing.assert_allclose(out[2], 4.0)
    np.testing.assert_allclose(out[3], 1.0)


def test_interp_pressure_extrapolates():
    src = np.asarray([925.0, 850.0])
    vals = np.stack([np.full((2, 2), 9.25), np.full((2, 2), 8.5)])
    out = interp_pressure_levels(vals, src, np.asarray([1000.0, 700.0]))
    np.testing.assert_allclose(out[0], 10.0)  # linear beyond 925
    np.testing.assert_allclose(out[1], 7.0)


def test_to_canonical_noop_when_matching():
    lat = np.linspace(90, -90, 721)
    lon = np.arange(0, 360, 0.25)
    f = np.zeros((3, 721, 1440), np.float32)
    out = to_canonical_grid(f, lat, lon)
    assert out is f  # exact no-op, no copy


def test_batched_leading_dims():
    src_lat = np.linspace(90, -90, 19)
    src_lon = np.arange(0, 360, 10.0)
    f = np.stack([_linear_field(src_lat, src_lon)] * 5).reshape(5, 19, 36)
    out = regrid_latlon(f, src_lat, src_lon, np.linspace(90, -90, 37),
                        np.arange(0, 360, 5.0))
    assert out.shape == (5, 37, 72)
