"""Quickstart: run a forecast, save it, inspect a point, make a GIF.

Runs fully offline using synthetic initial conditions; swap
``ic_source="gfs"`` (or ifs/cds) for operational data.
"""

import datetime

from skyrim_tpu import Skyrim
from skyrim_tpu.io import SaveConfig
from skyrim_tpu.plotting import generate_rollout_gif

model = Skyrim("dlwp", ic_source="synthetic")
pred, paths = model.predict(
    date="20240507",
    time="0000",
    lead_time=24,
    save=True,
    save_config=SaveConfig(output_dir="outputs"),
)

print("saved steps:", *paths, sep="\n  ")
print("t2m @ Istanbul:", pred.point(41.0, 29.0, channel="t2m").data)
# (wind helpers need u10m/v10m channels — e.g. Skyrim("fourcastnet_v2"):
#  pred.wind_speed(41.0, 29.0))
europe_t2m = pred.slice(lat=slice(70, 35), lon=slice(0, 40), channel="t2m")
print("Europe crop:", europe_t2m)

generate_rollout_gif(paths, channel="t2m", output_path="outputs/t2m.gif")
