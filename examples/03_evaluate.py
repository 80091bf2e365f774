"""Score a forecast against a truth series (ERA5 in production; here the
model's own IC source stands in so the example runs offline)."""

import datetime

from skyrim_tpu import Skyrim
from skyrim_tpu.evaluate import score_table

start = datetime.datetime(2024, 5, 7, 0)
model = Skyrim("dlwp", ic_source="synthetic")
forecast = model.forecast(start, n_steps=4)

# production: truth = CDS(channels).forecast(start, n_steps) hindcast
truth = model.model.data_source.fetch(
    start + 4 * model.model.time_step, n_history=5, time_step=model.model.time_step
)

scores = score_table(forecast, truth)
for ch, vals in scores["rmse"].items():
    print(f"RMSE {ch}: {[round(v, 3) for v in vals]}")
