"""Test config: hermetic unit tier by default (SURVEY.md §4).

Sharding tests run on a virtual 8-device CPU mesh; set up XLA flags
before jax is imported anywhere.  Tests that need the real TPU are
marked ``tpu`` and excluded by default.
"""

import os

# Force CPU: the axon sitecustomize pins jax_platforms to the real
# (tunneled) TPU via jax.config.update at interpreter start, which beats
# env vars — so override through jax.config before backends initialize.
# TPU tests opt in by running with SKYRIM_TEST_TPU=1 (and are marked `tpu`).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("SKYRIM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mock_forecast():
    """Synthetic canonical forecast Field (reference test_common.py:11-29)."""
    import datetime

    from skyrim_tpu.field import Field

    rs = np.random.default_rng(42)
    times = [datetime.datetime(2024, 5, 1, 0) + datetime.timedelta(hours=6 * i) for i in range(3)]
    channels = ["t2m", "u10m", "v10m", "z500"]
    lat = np.linspace(90, -90, 19)
    lon = np.arange(0, 360, 10.0)
    data = rs.normal(size=(3, 4, 19, 36)).astype(np.float32)
    return Field.from_canonical(data, times, channels, lat, lon, attrs={"note": "synthetic"})
