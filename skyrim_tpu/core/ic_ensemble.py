"""Initial-condition ensembles, device-parallel over the dp mesh axis.

The reference's only ensembles are the sequential multi-model mean and
the downloaded ECMWF ENS product (SURVEY.md §2.10).  This adds the
native kind: perturb the analysis, roll every member out simultaneously
across the ``dp`` mesh axis (parallel/sharding.dp_ensemble_rollout),
and return the (number, time, channel, lat, lon) contract the ENS
product uses — so model ensembles and the ENS product are downstream-
interchangeable.
"""

from __future__ import annotations

import datetime

import jax
import numpy as np

from skyrim_tpu.core.model import GlobalModel
from skyrim_tpu.field import Field
from skyrim_tpu.parallel.mesh import make_mesh, single_device_mesh
from skyrim_tpu.parallel.sharding import dp_ensemble_rollout
from skyrim_tpu.rollout import initial_condition_from_field, rollout_times
from skyrim_tpu.utils.logging import logger


def perturb_members(
    x0: np.ndarray,
    n_members: int,
    scale: float = 0.01,
    seed: int = 0,
) -> np.ndarray:
    """Member ICs: member 0 is the control; others get Gaussian noise
    scaled per channel by that channel's spatial std (the natural unit —
    channels span Pa to kg/kg)."""
    rng = np.random.default_rng(seed)
    stds = x0.std(axis=(-2, -1), keepdims=True)
    members = [x0]
    for _ in range(n_members - 1):
        noise = rng.standard_normal(x0.shape).astype(np.float32)
        members.append(x0 + scale * stds * noise)
    return np.stack(members)


def ic_ensemble_forecast(
    model_name: str,
    start_time: datetime.datetime,
    n_steps: int = 4,
    n_members: int = 4,
    perturb_scale: float = 0.01,
    ic_source: str = "gfs",
    mesh=None,
    seed: int = 0,
    model_kwargs: dict | None = None,
) -> Field:
    """Run an IC-perturbation ensemble; returns (number, time, channel,
    lat, lon)."""
    gm = GlobalModel(model_name, ic_source=ic_source, model_kwargs=model_kwargs)
    model = gm.model
    ic_field = gm.data_source.fetch(start_time, model.n_history, model.time_step)
    x0 = initial_condition_from_field(model, ic_field)
    members = perturb_members(x0, n_members, perturb_scale, seed)

    if mesh is None:
        n_dev = len(jax.devices())
        dp = n_dev if n_members % n_dev == 0 else 1
        mesh = make_mesh(dp=dp, lat=1, lon=n_dev // dp) if n_dev > 1 else single_device_mesh()
    logger.info(
        "IC ensemble: %s × %d members over mesh %s", model_name, n_members,
        dict(mesh.shape),
    )
    run = dp_ensemble_rollout(model, mesh, n_steps)
    outputs = np.asarray(run(gm.params, members))[:, :n_steps]

    times = rollout_times(start_time, model.time_step, n_steps)
    f = Field(
        outputs,
        ("number", "time", "channel", "lat", "lon"),
        coords={
            "number": np.arange(n_members),
            "time": np.asarray([np.datetime64(t.isoformat(), "ns") for t in times]),
            "channel": np.asarray(list(model.channels), dtype=object),
            "lat": model.grid.lat,
            "lon": model.grid.lon,
        },
        attrs={"model": model_name, "perturb_scale": perturb_scale},
    )
    return f


def ensemble_mean(members: Field) -> Field:
    return members.mean("number")


def ensemble_spread(members: Field) -> Field:
    """Per-point ensemble standard deviation."""
    ax = members.axis("number")
    data = members.data.std(axis=ax)
    dims = tuple(d for d in members.dims if d != "number")
    coords = {k: v for k, v in members.coords.items() if k != "number"}
    return Field(data, dims, coords, dict(members.attrs))
