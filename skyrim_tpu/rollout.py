"""Autoregressive rollout engine — one engine for all models.

Replaces both earth2mip's TimeLoop-driven ``run_basic_inference``
(reference skyrim/core/models/utils.py:10-49) and earth2studio's
``run.deterministic`` (reference fuxi.py:86-92) with two TPU-first
drivers over the functional ``PrognosticModel.advance`` protocol:

- ``scan_rollout``: the whole N-step rollout inside one jitted
  ``lax.scan`` — state never leaves the device; used for benchmarking,
  training, and ensemble members.
- ``stream_rollout``: a host generator for forecast production.  The
  advance step is jitted with donated state (flat memory), and the
  device→host copy of step k overlaps the compute of step k+1, so IO
  never serializes the loop (SURVEY.md §7 hard part 5).

Restart support: ``initial_condition_from_field`` builds the state from
any saved forecast (the reference's restart-from-.nc property,
models/utils.py:24-31).
"""

from __future__ import annotations

import datetime
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from skyrim_tpu.field import Field
from skyrim_tpu.models.base import ModelState, Params, PrognosticModel
from skyrim_tpu.utils.logging import logger


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(2,))
def _scan_rollout_impl(model: PrognosticModel, params: Params, state: ModelState, n_steps: int):
    def body(carry, _):
        new_state, y = model.advance(params, carry)
        return new_state, y

    final_state, ys = jax.lax.scan(body, state, None, length=n_steps)
    return final_state, ys


def scan_rollout(
    model: PrognosticModel,
    params: Params,
    state: ModelState,
    n_steps: int,
) -> tuple[ModelState, jax.Array]:
    """Run n_steps (time_step units) fully on device.

    Returns (final_state, outputs (>= n_steps, C, H, W)); models with
    frames_out > 1 may overshoot by up to frames_out - 1 frames — the
    caller slices.
    """
    n_calls = -(-n_steps // model.frames_out)
    final_state, ys = _scan_rollout_impl(model, params, state, n_calls)
    ys = ys.reshape(-1, *ys.shape[2:])
    return final_state, ys


@partial(jax.jit, static_argnums=(0, 3, 4), donate_argnums=(2,))
def _advance_jit(model: PrognosticModel, params: Params, state: ModelState,
                 transfer_dtype=None, channel_idx=None):
    state, y = model.advance(params, state)
    if channel_idx is not None:
        y = y[:, jnp.asarray(channel_idx, jnp.int32)]
    if transfer_dtype is not None:
        y = y.astype(transfer_dtype)
    return state, y


def stream_rollout(
    model: PrognosticModel,
    params: Params,
    state: ModelState,
    n_steps: int,
    transfer_dtype=None,
    channel_idx: tuple | None = None,
) -> Iterator[np.ndarray]:
    """Yield each step's output (C, H, W) as numpy, overlapping D2H with compute.

    ``transfer_dtype`` (e.g. ``jnp.float16``) casts the output on device
    before the fetch — halving device→host bytes for production paths
    whose sink stores reduced precision anyway.  ``channel_idx`` (a
    static tuple of channel positions) selects the transferred subset ON
    DEVICE, so a production variable filter cuts D2H bytes by C_sel/C
    before the tunnel/NIC ever sees them."""
    n_calls = -(-n_steps // model.frames_out)
    emitted = 0
    pending: jax.Array | None = None

    def drain(y):
        nonlocal emitted
        for frame in np.asarray(y):
            if emitted < n_steps:
                emitted += 1
                yield frame

    for _ in range(n_calls):
        state, y = _advance_jit(model, params, state, transfer_dtype,
                                channel_idx)
        y.copy_to_host_async()
        if pending is not None:
            yield from drain(pending)
        pending = y
    if pending is not None:
        yield from drain(pending)


def initial_condition_from_field(model: PrognosticModel, ic: Field) -> np.ndarray:
    """Extract the last n_history frames in the model's channel order.

    Accepts any canonical Field (a fetched IC or a previously saved
    forecast — restart support).  Missing-history replication is handled
    by ``init_state``.
    """
    f = ic.sel(channel=list(model.channels))
    f = f.transpose("time", "channel", "lat", "lon")
    n = min(model.n_history, f.sizes["time"])
    return f.data[-n:].astype(np.float32)


def rollout_times(
    start_time: datetime.datetime, time_step: datetime.timedelta, n_steps: int
) -> list[datetime.datetime]:
    return [start_time + (i + 1) * time_step for i in range(n_steps)]


def outputs_to_field(
    model: PrognosticModel,
    outputs: np.ndarray,
    start_time: datetime.datetime,
    include_ic: np.ndarray | None = None,
) -> Field:
    """Stack rollout outputs (n, C, H, W) into a canonical Field.

    If ``include_ic`` is given (C, H, W), it is prepended at t=start_time,
    matching the reference's forecast() returning n_steps+1 frames
    (reference base.py:94-117).
    """
    outputs = np.asarray(outputs)
    times = rollout_times(start_time, model.time_step, outputs.shape[0])
    if include_ic is not None:
        outputs = np.concatenate([np.asarray(include_ic)[None], outputs], axis=0)
        times = [start_time] + times
    return Field.from_canonical(
        outputs,
        times,
        model.channels,
        model.grid.lat,
        model.grid.lon,
        attrs={"model": model.name},
    )


def perturb_initial_condition(
    ic: np.ndarray,
    model: PrognosticModel,
    channel: str,
    lat: float,
    lon: float,
    value: float,
    mode: str = "set",
) -> np.ndarray:
    """Point-edit a channel at the nearest grid cell — the reference's
    "simulate extreme weather" hook (models/utils.py:70-92).

    mode: "set" replaces, "add" offsets, "scale" multiplies.
    """
    ic = np.array(ic, copy=True)
    c = list(model.channels).index(channel)
    i, j = model.grid.nearest_index(lat, lon)
    sl = (Ellipsis, c, i, j) if ic.ndim == 4 else (c, i, j)
    if mode == "set":
        ic[sl] = value
    elif mode == "add":
        ic[sl] = ic[sl] + value
    elif mode == "scale":
        ic[sl] = ic[sl] * value
    else:
        raise ValueError(f"unknown mode {mode!r}")
    logger.debug("perturbed %s at (%.2f, %.2f) mode=%s", channel, lat, lon, mode)
    return ic


def estimate_pressure_hpa(elevation_m: float) -> float:
    """Barometric pressure at elevation (reference models/utils.py:52-67)."""
    p0, t0, lapse, g, M, R = 1013.25, 288.15, 0.0065, 9.80665, 0.0289644, 8.3144598
    return p0 * (1 - lapse * elevation_m / t0) ** (g * M / (R * lapse))
