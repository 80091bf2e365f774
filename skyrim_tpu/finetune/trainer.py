"""Finetuning trainer — the reference's reserved-but-unimplemented API
made real (skyrim/libs/finetune/__init__.py:1-13, SURVEY.md §2.8).

TPU-first: a jitted AdamW train step with donated state, dp-sharded
batches over the device mesh, optional multi-step (rollout) loss with
``jax.checkpoint`` rematerialization to trade FLOPs for HBM, and orbax
checkpointing through the weights registry.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skyrim_tpu.finetune.dataset import FineTuneDataset
from skyrim_tpu.models.base import PrognosticModel
from skyrim_tpu.parallel.mesh import AXES, single_device_mesh
from skyrim_tpu.parallel.sharding import compatible_spec
from skyrim_tpu.utils.logging import logger
from skyrim_tpu.weights.registry import save_checkpoint


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    batch_size: int = 1
    n_epochs: int = 1
    rollout_steps: int = 1  # >1 = multi-step (autoregressive) loss
    grad_clip: float = 1.0
    remat: bool = True
    checkpoint_every: int = 0  # steps; 0 = only at end
    seed: int = 0


class Trainer:
    def __init__(
        self,
        model: PrognosticModel,
        params,
        config: TrainConfig | None = None,
        mesh: Mesh | None = None,
    ):
        self.model = model
        self.config = config or TrainConfig()
        self.mesh = mesh or single_device_mesh()
        self.opt = optax.chain(
            optax.clip_by_global_norm(self.config.grad_clip),
            optax.adamw(self.config.learning_rate, weight_decay=self.config.weight_decay),
        )
        if isinstance(params, dict) and "cache" in params:
            # derived step-invariant caches (e.g. GraphCast edge biases) are
            # functions of the weights — training must not treat them as
            # independent leaves; dropping them selects the exact inline
            # recompute path in apply(), and prepare_params rebuilds them
            # for inference after load.
            params = {k: v for k, v in params.items() if k != "cache"}
        rep = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, rep)
        self.opt_state = jax.device_put(self.opt.init(params), rep)
        self._step_fn = self._build_step()
        self.step_count = 0

    def _build_step(self):
        model, cfg, mesh = self.model, self.config, self.mesh
        apply = model.apply
        if cfg.remat:
            apply = jax.checkpoint(apply)

        H, W = model.grid.shape
        nc = len(model.channels)
        bspec = compatible_spec(
            (cfg.batch_size, model.n_history, nc, H, W),
            mesh,
            P(AXES.dp, None, None, AXES.lat, AXES.lon),
        )
        self.batch_sharding = NamedSharding(mesh, bspec)
        rep = NamedSharding(mesh, P())

        def loss_fn(params, xs, ys):
            def rollout_loss(x, y):
                total = 0.0
                state = x
                for k in range(cfg.rollout_steps):
                    pred = apply(params, state)  # (frames_out, C, H, W)
                    tgt = jax.lax.dynamic_slice_in_dim(
                        y, k * model.frames_out, model.frames_out, axis=0
                    )
                    total = total + jnp.mean((pred - tgt) ** 2)
                    state = jnp.concatenate([state, pred], axis=0)[-model.n_history :]
                return total / cfg.rollout_steps

            return jnp.mean(jax.vmap(rollout_loss)(xs, ys))

        def train_step(params, opt_state, xs, ys):
            from skyrim_tpu.parallel.sharding import _maybe_xla_fallback

            with _maybe_xla_fallback(mesh):
                loss, grads = jax.value_and_grad(loss_fn)(params, xs, ys)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(
            train_step,
            in_shardings=(rep, rep, self.batch_sharding, self.batch_sharding),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def fit(self, dataset: FineTuneDataset) -> dict:
        cfg = self.config
        rng = np.random.default_rng(cfg.seed)
        history = []
        needed = cfg.rollout_steps * self.model.frames_out
        if dataset.frames_out < needed:
            raise ValueError(
                f"dataset yields {dataset.frames_out} target frames but the "
                f"rollout loss needs {needed}"
            )
        for epoch in range(cfg.n_epochs):
            t0 = time.perf_counter()
            losses = []
            for xs, ys in dataset.batches(cfg.batch_size, rng):
                xs = jax.device_put(xs, self.batch_sharding)
                ys = jax.device_put(ys, self.batch_sharding)
                self.params, self.opt_state, loss = self._step_fn(
                    self.params, self.opt_state, xs, ys
                )
                self.step_count += 1
                losses.append(loss)
                if (
                    cfg.checkpoint_every
                    and self.step_count % cfg.checkpoint_every == 0
                ):
                    self.save()
            mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            history.append(mean_loss)
            logger.success(
                "epoch %d: loss=%.5f (%.1fs, %d steps)",
                epoch, mean_loss, time.perf_counter() - t0, len(losses),
            )
        self.save()
        return {"loss": history, "steps": self.step_count}

    def save(self) -> str:
        return save_checkpoint(self.model.name, self.params, self.step_count)
