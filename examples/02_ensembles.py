"""Ensembles two ways:

1. multi-model mean over common channels (the reference's ensemble)
2. device-parallel initial-condition perturbation ensemble (TPU-native)
"""

import datetime

from skyrim_tpu import Skyrim
from skyrim_tpu.core.ic_ensemble import (
    ensemble_mean,
    ensemble_spread,
    ic_ensemble_forecast,
)

start = datetime.datetime(2024, 5, 7, 0)

# --- multi-model ---
ens = Skyrim("dlwp", "fourcastnet_v2", ic_source="synthetic")
mean_forecast = ens.forecast(start, n_steps=2)
print("multi-model mean:", mean_forecast)

# --- IC perturbation ensemble, members parallel over the dp mesh axis ---
members = ic_ensemble_forecast(
    "dlwp", start, n_steps=4, n_members=4, perturb_scale=0.01,
    ic_source="synthetic",
)
print("members:", members)  # (number, time, channel, lat, lon)
print("spread t2m, step 4:",
      float(ensemble_spread(members).sel(channel="t2m").data[-1].mean()))
