"""GlobalModel — the user-facing model adapter.

Behavioral parity with the reference's ``GlobalModel`` ABC + rollout
engine (reference skyrim/core/models/base.py:18-146): builds the model
then its datasource, ``predict_one_step``/``forecast``/``rollout`` with
per-step persistence and the IC-source label switching to "file" after
step 1.  The compute itself runs through the TPU-native rollout engine
(rollout.py) — state stays on device; only per-step outputs stream to
the host for saving.
"""

from __future__ import annotations

import datetime

import numpy as np

from skyrim_tpu.core.prediction import GlobalPrediction
from skyrim_tpu.data import get_data_source
from skyrim_tpu.field import Field
from skyrim_tpu.io.save import SaveConfig, save_forecast
from skyrim_tpu.models import MODELS
from skyrim_tpu.rollout import (
    initial_condition_from_field,
    outputs_to_field,
    stream_rollout,
)
from skyrim_tpu.utils.logging import logger
from skyrim_tpu.utils.timing import timeit
from skyrim_tpu.weights import load_params


def adjust_lead_time(lead_time: int, time_step_hours: int = 6) -> int:
    """Floor to a multiple of the model step (reference base.py:13-15)."""
    return (lead_time // time_step_hours) * time_step_hours


class GlobalModel:
    def __init__(
        self,
        model_name: str,
        ic_source: str = "gfs",
        model_kwargs: dict | None = None,
        params=None,
        rng=None,
    ):
        self.model_name = model_name
        self.ic_source = ic_source
        self.model = self._build_model(model_kwargs or {})
        self.params = params if params is not None else load_params(self.model, rng)
        self.data_source = self.build_datasource()

    @timeit
    def _build_model(self, kwargs):
        return MODELS[self.model_name](**kwargs)

    @timeit
    def build_datasource(self):
        """Keyed by the model's in-channel names (reference base.py:41-48)."""
        return get_data_source(
            self.model.in_channel_names, self.ic_source, grid=self.model.grid
        )

    def release_model(self):
        """Free the parameters' device memory (the reference's TODO,
        base.py:50-55, and the cuda-eviction analog of ensemble.py:40-49)."""
        import jax

        self.params = None
        jax.clear_caches()

    # -- properties mirroring the reference surface -------------------------

    @property
    def time_step(self) -> datetime.timedelta:
        return self.model.time_step

    @property
    def in_channel_names(self) -> list[str]:
        return self.model.in_channel_names

    @property
    def out_channel_names(self) -> list[str]:
        return self.model.out_channel_names

    # -- inference ----------------------------------------------------------

    def _initial_state(self, start_time, initial_condition=None):
        if initial_condition is None:
            ic_field = self.data_source.fetch(
                start_time, self.model.n_history, self.model.time_step
            )
        elif isinstance(initial_condition, (str, Field)):
            ic_field = (
                initial_condition
                if isinstance(initial_condition, Field)
                else GlobalPrediction(initial_condition).prediction
            )
        else:
            ic_field = None
        if ic_field is not None:
            x0 = initial_condition_from_field(self.model, ic_field)
        else:
            x0 = np.asarray(initial_condition, np.float32)
        state = self.model.init_state(self.params, x0, start_time=start_time)
        return state, x0

    def predict_one_step(
        self,
        start_time: datetime.datetime,
        initial_condition=None,
    ) -> Field:
        """One model step → Field with [IC, prediction] frames
        (reference base.py:80-92 semantics: returns n+1 frames)."""
        state, x0 = self._initial_state(start_time, initial_condition)
        frames = list(
            stream_rollout(self.model, self.params, state, self.model.frames_out)
        )
        return outputs_to_field(
            self.model, np.stack(frames), start_time, include_ic=x0[-1]
        )

    def forecast(
        self,
        start_time: datetime.datetime,
        n_steps: int = 4,
        channels: list[str] | None = None,
    ) -> Field:
        """n_steps autoregressive steps, all frames incl. IC
        (reference base.py:94-117)."""
        state, x0 = self._initial_state(start_time)
        frames = list(stream_rollout(self.model, self.params, state, n_steps))
        out = outputs_to_field(
            self.model, np.stack(frames), start_time, include_ic=x0[-1]
        )
        if channels:
            out = out.sel(channel=channels)
        return out

    def rollout(
        self,
        start_time: datetime.datetime,
        n_steps: int = 3,
        save: bool = True,
        save_config: SaveConfig | dict | None = None,
    ) -> tuple[Field, list[str]]:
        """Step-at-a-time rollout persisting every step
        (reference base.py:119-146).  Returns (final prediction Field,
        saved paths).  The IC source label switches to "file" after the
        first step, as in the reference.
        """
        if isinstance(save_config, dict):
            save_config = SaveConfig(**save_config)
        save_config = save_config or SaveConfig()

        state, x0 = self._initial_state(start_time)
        source = self.ic_source
        output_paths: list[str] = []
        pred_field: Field | None = None
        t = start_time
        for frame in stream_rollout(self.model, self.params, state, n_steps):
            pred_time = t + self.model.time_step
            pred_field = Field.from_canonical(
                frame[None],
                [pred_time],
                self.model.channels,
                self.model.grid.lat,
                self.model.grid.lon,
                attrs={"model": self.model_name},
            )
            if save:
                path = save_forecast(
                    pred_field, self.model_name, t, pred_time, source, save_config
                )
                output_paths.append(path)
            t, source = pred_time, "file"
            logger.success(
                "rollout step %s → %s", t - self.model.time_step, pred_time
            )
        return pred_field, output_paths
