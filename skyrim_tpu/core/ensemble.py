"""Multi-model ensemble (reference skyrim/core/models/ensemble.py).

Runs each member's rollout and averages over the intersection of their
output channels (reference ensemble.py:51-67).  Differences from the
reference, per SURVEY.md §7 "defects to fix":

- ``rollout`` signature matches GlobalModel's (the reference passed an
  unsupported ``output_dir=`` kwarg, ensemble.py:89-94);
- saved-path bookkeeping is correct when ``save=False`` (the reference
  left ``ens_output_paths`` unbound, ensemble.py:103-108);
- ``time_step`` comes from the members instead of being hardcoded 6 h.

Members run sequentially with per-member parameter eviction — the TPU
analog of the reference's cuda load/release swap (ensemble.py:29-49);
device-parallel members over a ``dp`` mesh axis run through
``parallel/sharding.py:dp_ensemble_rollout`` (and IC-perturbation
ensembles through ``core/ic_ensemble.py``).
"""

from __future__ import annotations

import datetime

import jax

from skyrim_tpu.core.model import GlobalModel
from skyrim_tpu.field import Field
from skyrim_tpu.io.save import SaveConfig, save_forecast
from skyrim_tpu.utils.logging import logger


class GlobalEnsemble:
    def __init__(self, model_names: list[str], ic_source: str = "gfs", **kwargs):
        self.model_names = list(model_names)
        self.ic_source = ic_source
        self._model_kwargs = kwargs
        self.model_name = "ensemble[" + ",".join(sorted(self.model_names)) + "]"
        self._common_channels: list[str] | None = None
        self._time_step: datetime.timedelta | None = None

    @property
    def time_step(self) -> datetime.timedelta:
        """The members' common cadence; mixed-cadence ensembles are
        rejected (the reference hardcoded 6 h, ensemble.py:21-24)."""
        if self._time_step is None:
            from skyrim_tpu.models import MODELS

            # bare model construction is cheap (no weights are loaded)
            steps = {n: MODELS[n]().time_step for n in self.model_names}
            if len(set(steps.values())) > 1:
                raise ValueError(
                    f"ensemble members disagree on time_step: "
                    f"{ {k: str(v) for k, v in steps.items()} }"
                )
            self._time_step = next(iter(steps.values()))
        return self._time_step

    def _run_member(self, name: str, fn):
        """Instantiate a member, run fn(member), release its parameters."""
        member = GlobalModel(name, ic_source=self.ic_source, **self._model_kwargs)
        if self._time_step is None:
            self._time_step = member.time_step
        elif member.time_step != self._time_step:
            raise ValueError(
                f"ensemble member {name} steps {member.time_step}, "
                f"earlier members step {self._time_step}"
            )
        chans = set(member.out_channel_names)
        self._common_channels = (
            sorted(chans)
            if self._common_channels is None
            else sorted(set(self._common_channels) & chans)
        )
        try:
            return fn(member)
        finally:
            # drop the params reference so the backing HBM is freed
            member.params = None
            jax.clear_caches()

    def _ensemble_mean(self, fields: list[Field]) -> Field:
        common = self._common_channels or []
        aligned = [f.sel(channel=common) for f in fields]
        stacked = Field.concat(aligned, "model")
        return stacked.mean("model")

    def forecast(
        self,
        start_time: datetime.datetime,
        n_steps: int = 4,
        channels: list[str] | None = None,
    ) -> Field:
        preds = [
            self._run_member(n, lambda m: m.forecast(start_time, n_steps))
            for n in self.model_names
        ]
        out = self._ensemble_mean(preds)
        return out.sel(channel=channels) if channels else out

    def rollout(
        self,
        start_time: datetime.datetime,
        n_steps: int = 3,
        save: bool = True,
        save_config: SaveConfig | dict | None = None,
    ) -> tuple[Field, list[str]]:
        if isinstance(save_config, dict):
            save_config = SaveConfig(**save_config)
        save_config = save_config or SaveConfig()

        member_finals: list[Field] = []
        member_paths: list[list[str]] = []
        for name in self.model_names:
            cfg = SaveConfig(**{**save_config.__dict__,
                               "forecast_id": f"{save_config.forecast_id}/{name}"})
            final, paths = self._run_member(
                name, lambda m: m.rollout(start_time, n_steps, save, cfg)
            )
            member_finals.append(final)
            member_paths.append(paths)
            logger.success("ensemble member %s done (%d steps)", name, n_steps)

        ens_final = self._ensemble_mean(member_finals)
        output_paths: list[str] = [p for paths in member_paths for p in paths]
        if save:
            pred_time = start_time + n_steps * self.time_step
            path = save_forecast(
                ens_final,
                self.model_name,
                start_time,
                pred_time,
                self.ic_source,
                SaveConfig(**{**save_config.__dict__,
                              "forecast_id": f"{save_config.forecast_id}/mean"}),
            )
            output_paths.append(path)
        return ens_final, output_paths
