"""Top-of-atmosphere incident solar radiation (TISR) forcing.

GraphCast's operational inputs include TOA incident solar radiation and
clock/seasonality features (the reference maps it through the ``tp06``
channel slot, graphcast.py:16,40).  Offline environments cannot fetch
it, so this computes it from orbital geometry — the standard spherical
astronomy formulation (solar declination + hour angle + eccentricity
correction), accurate to ~1 W/m² vs ERA5's tisr at 6-hourly scale.
"""

from __future__ import annotations

import datetime

import numpy as np

SOLAR_CONSTANT = 1361.0  # W/m²


def _day_of_year(t: datetime.datetime) -> float:
    start = datetime.datetime(t.year, 1, 1, tzinfo=t.tzinfo)
    return (t - start).total_seconds() / 86400.0


def solar_declination(t: datetime.datetime) -> float:
    """Solar declination (radians), Spencer (1971) Fourier series."""
    g = 2 * np.pi * _day_of_year(t) / 365.25
    return (
        0.006918
        - 0.399912 * np.cos(g) + 0.070257 * np.sin(g)
        - 0.006758 * np.cos(2 * g) + 0.000907 * np.sin(2 * g)
        - 0.002697 * np.cos(3 * g) + 0.00148 * np.sin(3 * g)
    )


def eccentricity_factor(t: datetime.datetime) -> float:
    g = 2 * np.pi * _day_of_year(t) / 365.25
    return (
        1.000110
        + 0.034221 * np.cos(g) + 0.001280 * np.sin(g)
        + 0.000719 * np.cos(2 * g) + 0.000077 * np.sin(2 * g)
    )


def toa_incident_solar_radiation(
    t: datetime.datetime,
    lat_deg: np.ndarray,
    lon_deg: np.ndarray,
    integration_hours: float = 1.0,
) -> np.ndarray:
    """TOA insolation (J/m²) accumulated over ``integration_hours`` ending
    at ``t``, on the (lat, lon) grid. Shape (nlat, nlon)."""
    lat = np.deg2rad(np.asarray(lat_deg))[:, None]
    lon = np.deg2rad(np.asarray(lon_deg))[None, :]
    decl = solar_declination(t)
    e0 = eccentricity_factor(t)

    # integrate cos(zenith) over the window with a few subsamples
    n_sub = max(int(integration_hours * 4), 1)
    total = np.zeros((lat.shape[0], lon.shape[1]))
    for i in range(n_sub):
        ti = t - datetime.timedelta(hours=integration_hours * (i + 0.5) / n_sub)
        frac_day = (ti.hour + ti.minute / 60 + ti.second / 3600) / 24.0
        hour_angle = 2 * np.pi * frac_day - np.pi + lon  # solar hour angle
        cosz = np.sin(lat) * np.sin(decl) + np.cos(lat) * np.cos(decl) * np.cos(
            hour_angle
        )
        total += np.maximum(cosz, 0.0)
    mean_cosz = total / n_sub
    return (SOLAR_CONSTANT * e0 * mean_cosz * integration_hours * 3600).astype(
        np.float32
    )


def toa_incident_solar_radiation_jax(
    time_sec,
    lat_deg: np.ndarray,
    lon_deg: np.ndarray,
    integration_hours: float = 1.0,
):
    """jnp version computable inside a jitted scan from epoch seconds.

    Day-of-year is approximated as (days since 1970-01-01) mod 365.25 —
    1970 starts at day 0 so the phase is exact at epoch and drifts well
    under a day across decades; adequate for a forcing channel.
    """
    import jax.numpy as jnp

    lat = jnp.deg2rad(jnp.asarray(lat_deg))[:, None]
    lon = jnp.deg2rad(jnp.asarray(lon_deg))[None, :]
    days = jnp.asarray(time_sec, jnp.float32) / 86400.0
    g = 2 * jnp.pi * jnp.mod(days, 365.25) / 365.25
    decl = (
        0.006918
        - 0.399912 * jnp.cos(g) + 0.070257 * jnp.sin(g)
        - 0.006758 * jnp.cos(2 * g) + 0.000907 * jnp.sin(2 * g)
        - 0.002697 * jnp.cos(3 * g) + 0.00148 * jnp.sin(3 * g)
    )
    e0 = (
        1.000110
        + 0.034221 * jnp.cos(g) + 0.001280 * jnp.sin(g)
        + 0.000719 * jnp.cos(2 * g) + 0.000077 * jnp.sin(2 * g)
    )
    n_sub = max(int(integration_hours * 4), 1)

    # fori_loop, not a Python loop: unrolled, XLA kept ~2 GB of
    # (nlat, nlon) sub-interval buffers alive inside the rollout scan
    def sub(i, total):
        ts = days - (integration_hours * (i + 0.5) / n_sub) / 24.0
        frac_day = jnp.mod(ts, 1.0)
        hour_angle = 2 * jnp.pi * frac_day - jnp.pi + lon
        cosz = jnp.sin(lat) * jnp.sin(decl) + jnp.cos(lat) * jnp.cos(
            decl
        ) * jnp.cos(hour_angle)
        return total + jnp.maximum(cosz, 0.0)

    import jax

    total = jax.lax.fori_loop(
        0, n_sub, sub, jnp.zeros((lat.shape[0], lon.shape[1]))
    )
    mean_cosz = total / n_sub
    return (SOLAR_CONSTANT * e0 * mean_cosz * integration_hours * 3600).astype(
        jnp.float32
    )


def clock_features_jax(time_sec, lat_deg: np.ndarray, lon_deg: np.ndarray):
    """jnp clock forcings from epoch seconds: (4, nlat, nlon)."""
    import jax.numpy as jnp

    lon = jnp.asarray(lon_deg)[None, :]
    ones = jnp.ones((len(lat_deg), len(lon_deg)), jnp.float32)
    days = jnp.asarray(time_sec, jnp.float32) / 86400.0
    frac_day = jnp.mod(days, 1.0)
    local = jnp.mod(frac_day + lon / 360.0, 1.0)
    year = jnp.mod(days, 365.25) / 365.25
    return jnp.stack(
        [
            jnp.sin(2 * jnp.pi * local) * ones,
            jnp.cos(2 * jnp.pi * local) * ones,
            jnp.sin(2 * jnp.pi * year) * ones * jnp.ones_like(local),
            jnp.cos(2 * jnp.pi * year) * ones * jnp.ones_like(local),
        ]
    ).astype(jnp.float32)


def clock_features(
    t: datetime.datetime, lat_deg: np.ndarray, lon_deg: np.ndarray
) -> np.ndarray:
    """(4, nlat, nlon): sin/cos of local time-of-day and of year progress —
    GraphCast's clock forcings."""
    lon = np.asarray(lon_deg)[None, :]
    ones = np.ones((len(lat_deg), len(lon_deg)), np.float32)
    frac_day = (t.hour + t.minute / 60) / 24.0
    local = (frac_day + lon / 360.0) % 1.0
    year = _day_of_year(t) / 365.25
    return np.stack(
        [
            np.sin(2 * np.pi * local) * ones,
            np.cos(2 * np.pi * local) * ones,
            np.sin(2 * np.pi * year) * ones,
            np.cos(2 * np.pi * year) * ones,
        ]
    ).astype(np.float32)
