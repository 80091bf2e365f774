"""Finetune a model on an ERA5-style dataset.

Production datasets come from ``CDS(channels).create_dataset(...)``
(data/cds.py); here a synthetic one is generated so the example runs
offline end-to-end.
"""

import datetime
import json
from pathlib import Path

import jax
import numpy as np

from skyrim_tpu.field import Field
from skyrim_tpu.finetune import FineTuneDataset, TrainConfig, Trainer
from skyrim_tpu.io.netcdf import write_netcdf
from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

root = Path("outputs/ft_dataset")
root.mkdir(parents=True, exist_ok=True)

channels = ["t2m", "u10m", "v10m"]
rng = np.random.default_rng(0)
files = []
for i in range(3):
    times = [datetime.datetime(2024, 5, 1 + i, 6 * k) for k in range(4)]
    f = Field.from_canonical(
        rng.normal(size=(4, 3, 65, 128)).astype(np.float32), times, channels,
        np.linspace(90, -90, 65), np.arange(128) * (360 / 128),
    )
    name = f"slice_{i:05d}.nc"
    write_netcdf(f, root / name)
    files.append(name)
(root / "metadata.json").write_text(json.dumps({"channels": channels, "files": files}))

dataset = FineTuneDataset(root, n_history=1, frames_out=1)
model = FourCastNetV2Model(
    SFNOConfig(lat=65, lon=128, in_channels=3, embed_dim=32, num_blocks=2)
)
model.channels = tuple(channels)
params = model.init_params(jax.random.key(0))

trainer = Trainer(model, params, TrainConfig(batch_size=2, n_epochs=2, learning_rate=3e-3))
history = trainer.fit(dataset)
print("loss history:", history["loss"])
