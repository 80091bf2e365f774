"""Scaling-efficiency harness: grid-points/s across mesh sizes.

Measures the sharded rollout at 1 chip → N chips → N hosts and reports
scaling efficiency (BASELINE.md north star: ≥80% from 1 host to N).
On a pod slice run under the multi-host launcher:

    python -m skyrim_tpu.parallel.scaling_bench --model pangu --steps 8

Each mesh config shards the longitude axis (the production spatial axis
at 0.25°, parallel/sharding.py) and, when the batch allows, dp.
Single-host development runs exercise the same code on virtual devices.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from skyrim_tpu.parallel.mesh import make_mesh
from skyrim_tpu.parallel.sharding import shard_state, sharded_scan_rollout
from skyrim_tpu.utils.logging import logger


def bench_mesh(model, params, n_devices: int, n_steps: int) -> dict:
    mesh = make_mesh(dp=1, lat=1, lon=n_devices,
                     devices=np.asarray(jax.devices()[:n_devices]))
    run = sharded_scan_rollout(model, mesh, n_steps)
    x0 = np.zeros(model.state_shape, np.float32)
    state = shard_state(mesh, model.init_state(params, x0))
    # force execution through a scalar fetch (tunneled backends don't
    # block on block_until_ready)
    final, ys = run(params, state)
    float(jnp.mean(ys))
    best = float("inf")
    for _ in range(3):
        state = shard_state(mesh, model.init_state(params, x0))
        t0 = time.perf_counter()
        final, ys = run(params, state)
        float(jnp.mean(ys))
        best = min(best, time.perf_counter() - t0)
    H, W = model.grid.shape
    gps = H * W * len(model.channels) * n_steps / best
    return {"devices": n_devices, "wall_s": round(best, 4), "grid_points_per_s": round(gps, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fourcastnet_v2")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--sizes", default="")
    args = p.parse_args()

    from skyrim_tpu.models import MODELS

    model = MODELS[args.model]()
    params = model.init_params(jax.random.key(0))

    n = len(jax.devices())
    sizes = (
        [int(s) for s in args.sizes.split(",") if s]
        or [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    )
    results = []
    for size in sizes:
        r = bench_mesh(model, params, size, args.steps)
        if results:
            base = results[0]
            r["scaling_efficiency"] = round(
                (r["grid_points_per_s"] / base["grid_points_per_s"])
                / (size / base["devices"]),
                3,
            )
        results.append(r)
        logger.success("mesh lon=%d: %s", size, r)
    print(json.dumps({"model": args.model, "results": results}))


if __name__ == "__main__":
    main()
