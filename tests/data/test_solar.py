import datetime

import numpy as np
import pytest

from skyrim_tpu.data import solar


LAT = np.linspace(90, -90, 19)
LON = np.arange(0, 360, 10.0)


def test_polar_night_and_day():
    # June solstice: north pole lit all day, south pole dark
    t = datetime.datetime(2024, 6, 21, 12)
    tisr = solar.toa_incident_solar_radiation(t, LAT, LON, integration_hours=1)
    assert tisr[0].min() > 0  # north pole: midnight sun
    assert tisr[-1].max() == 0  # south pole: polar night


def test_subsolar_point_maximum():
    """At 12 UTC the subsolar longitude is ~0°E (Greenwich noon)."""
    t = datetime.datetime(2024, 3, 20, 12)  # equinox
    tisr = solar.toa_incident_solar_radiation(t, LAT, LON, integration_hours=0.5)
    eq = tisr[9]  # equator row
    assert eq.argmax() == 0 or eq.argmax() == len(LON) - 1
    # antipode in darkness
    assert eq[len(LON) // 2] == 0


def test_magnitude_reasonable():
    t = datetime.datetime(2024, 3, 20, 12)
    tisr = solar.toa_incident_solar_radiation(t, LAT, LON, integration_hours=1)
    # peak hourly insolation ≈ solar constant × 3600
    assert 0.8 * 1361 * 3600 < tisr.max() < 1.1 * 1361 * 3600


def test_declination_range():
    for month, day in ((6, 21), (12, 21)):
        d = solar.solar_declination(datetime.datetime(2024, month, day))
        assert abs(abs(np.rad2deg(d)) - 23.44) < 0.6


def test_clock_features():
    t = datetime.datetime(2024, 5, 1, 0)
    f = solar.clock_features(t, LAT, LON)
    assert f.shape == (4, 19, 36)
    np.testing.assert_allclose(f[0] ** 2 + f[1] ** 2, 1.0, atol=1e-6)
    # at 0 UTC, local midnight at lon 0: sin=0, cos=1
    assert abs(f[0][0, 0]) < 1e-6 and f[1][0, 0] == pytest.approx(1.0)
