"""Prognostic model protocol — the TPU-native TimeLoop equivalent.

The reference drives models through earth2mip's stateful TimeLoop
iterator (reference skyrim/core/models/utils.py:33-40) or the lower
level stepper protocol (graphcast.py:102-120).  Here the protocol is
functional so the whole rollout can live inside ``lax.scan`` on device:

    state = model.init_state(params, x0, t0)
    state, out = model.advance(params, state)     # jit/scan friendly

``ModelState`` is a pytree; models needing extra recurrent state (Pangu's
hierarchical 6h/24h anchor frames, GraphCast's rng) extend it.  All
shapes are static; time is carried as int32 seconds-of-forecast so the
step function stays trace-once.
"""

from __future__ import annotations

import abc
import datetime
from typing import Any, ClassVar

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from skyrim_tpu.channels import CHANNEL_SETS
from skyrim_tpu.grid import GRID_721x1440, LatLonGrid

Params = Any


@struct.dataclass
class ModelState:
    """Generic rollout state: input history + step counter + valid time.

    x: (n_history, C, H, W) — most recent frame last.
    step: int32 scalar, number of advances taken so far.
    rng: PRNG key (used by stochastic models; threaded deterministically).
    time_days: f32 scalar, valid time as days since 1970-01-01 (drives
        time-dependent forcings inside the scan; ~3-minute resolution).
    extra: model-specific pytree (empty dict by default).
    """

    x: jax.Array
    step: jax.Array
    rng: jax.Array
    time_days: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))
    extra: Any = struct.field(default_factory=dict)


class PrognosticModel(abc.ABC):
    """A global weather model: fixed channel set, grid, and time step."""

    name: ClassVar[str]
    channels: tuple[str, ...]
    grid: LatLonGrid = GRID_721x1440
    n_history: int = 1
    #: frames emitted per apply() call (DLWP emits 2 per call)
    frames_out: int = 1
    time_step: datetime.timedelta = datetime.timedelta(hours=6)
    #: dtype used for on-device compute (params stay f32 master where needed)
    compute_dtype: Any = jnp.bfloat16

    # -- architecture -------------------------------------------------------

    @abc.abstractmethod
    def init_params(self, rng: jax.Array) -> Params:
        """Randomly initialized parameter pytree (incl. normalization stats)."""

    @abc.abstractmethod
    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        """One physics step: x (n_history, C, H, W) → (frames_out, C, H, W).

        Input and output are in physical units; normalization is the
        model's own business (stats live inside ``params``).
        """

    def prepare_params(self, params: Params) -> Params:
        """Attach derived, step-invariant caches to a loaded parameter
        tree (identity by default).  Caches live under ``params["cache"]``
        and are stripped from checkpoints (weights/registry) — they are
        pure functions of the weights, rebuilt here on load."""
        return params

    # -- rollout protocol ---------------------------------------------------

    def init_state(
        self,
        params: Params,
        x0: jax.Array,
        rng: jax.Array | None = None,
        start_time: datetime.datetime | None = None,
    ) -> ModelState:
        x0 = jnp.asarray(x0)
        if x0.ndim == 3:
            x0 = x0[None]
        if x0.shape[0] < self.n_history:
            # replicate the earliest frame to fill missing history
            pad = jnp.repeat(x0[:1], self.n_history - x0.shape[0], axis=0)
            x0 = jnp.concatenate([pad, x0], axis=0)
        x0 = x0[-self.n_history :]
        if rng is None:
            rng = jax.random.key(0)
        t_days = 0.0
        if start_time is not None:
            epoch = datetime.datetime(1970, 1, 1, tzinfo=start_time.tzinfo)
            t_days = (start_time - epoch).total_seconds() / 86400.0
        return ModelState(
            x=x0, step=jnp.int32(0), rng=rng, time_days=jnp.float32(t_days)
        )

    @property
    def _step_days(self) -> float:
        return self.time_step.total_seconds() / 86400.0

    def advance(self, params: Params, state: ModelState) -> tuple[ModelState, jax.Array]:
        """Default advance: apply + shift history window.

        Returns (new_state, y) with y (frames_out, C, H, W).
        """
        y = self.apply(params, state.x)
        new_x = jnp.concatenate([state.x, y], axis=0)[-self.n_history :]
        return (
            state.replace(
                x=new_x,
                step=state.step + self.frames_out,
                time_days=state.time_days + self.frames_out * self._step_days,
            ),
            y,
        )

    # -- metadata -----------------------------------------------------------

    @property
    def in_channel_names(self) -> list[str]:
        return list(self.channels)

    @property
    def out_channel_names(self) -> list[str]:
        return list(self.channels)

    @property
    def state_shape(self) -> tuple[int, int, int, int]:
        return (self.n_history, len(self.channels), *self.grid.shape)

    def param_count(self, params: Params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def make_norm_params(n_channels: int, mean=None, std=None) -> dict:
    """Per-channel normalization stats, stored in params so checkpoints
    carry them (the reference's external packages bundle identical stats)."""
    mean = np.zeros((n_channels,), np.float32) if mean is None else np.asarray(mean, np.float32)
    std = np.ones((n_channels,), np.float32) if std is None else np.asarray(std, np.float32)
    return {"mean": jnp.asarray(mean)[:, None, None], "std": jnp.asarray(std)[:, None, None]}


def normalize(norm: dict, x: jax.Array) -> jax.Array:
    return (x - norm["mean"]) / norm["std"]


def denormalize(norm: dict, x: jax.Array) -> jax.Array:
    return x * norm["std"] + norm["mean"]


def model_channels(name: str) -> tuple[str, ...]:
    return CHANNEL_SETS[name]
