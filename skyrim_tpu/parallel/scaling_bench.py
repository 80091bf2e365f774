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


def add_efficiency(results: list[dict]) -> list[dict]:
    """Annotate each entry with scaling efficiency vs the first entry:
    (gps_N / gps_base) / (N / base_devices) — 1.0 is linear scaling,
    the BASELINE.md north star is ≥0.8 host-to-host."""
    if not results:
        return results
    base = results[0]
    for r in results[1:]:
        r["scaling_efficiency"] = round(
            (r["grid_points_per_s"] / base["grid_points_per_s"])
            / (r["devices"] / base["devices"]),
            3,
        )
    return results


def _tiny_model(name: str):
    """Reduced-config model per family — lets the harness run end-to-end
    on the virtual CPU mesh where full-resolution steps take minutes."""
    if name == "pangu":
        from skyrim_tpu.models.pangu import PanguConfig, PanguModel

        return PanguModel("pangu6", cfg=PanguConfig(
            lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1),
            num_heads=(2, 2, 2, 2)))
    if name == "fourcastnet_v2":
        from skyrim_tpu.models.sfno import FourCastNetV2Model, SFNOConfig

        return FourCastNetV2Model(SFNOConfig(
            lat=65, lon=128, in_channels=5, embed_dim=32, num_layers=2,
            scale_factor=4))
    if name == "fourcastnet":
        from skyrim_tpu.models.afno import AFNOConfig, FourCastNetModel

        return FourCastNetModel(AFNOConfig(
            lat=64, lon=128, in_channels=5, patch=8, embed_dim=32, depth=2,
            num_blocks=4))
    raise KeyError(f"no tiny config for {name!r}")


def run_scaling(model, sizes: list[int], n_steps: int) -> list[dict]:
    params = model.init_params(jax.random.key(0))
    results = []
    for size in sizes:
        r = bench_mesh(model, params, size, n_steps)
        results.append(r)
        logger.success("mesh lon=%d: %s", size, r)
    return add_efficiency(results)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fourcastnet_v2")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--sizes", default="")
    p.add_argument("--tiny", action="store_true",
                   help="reduced config (CPU-mesh development runs)")
    p.add_argument("--json-out", default="",
                   help="also write the result JSON to this path")
    args = p.parse_args()

    if args.tiny:
        model = _tiny_model(args.model)
    else:
        from skyrim_tpu.models import MODELS

        model = MODELS[args.model]()

    n = len(jax.devices())
    sizes = (
        [int(s) for s in args.sizes.split(",") if s]
        or [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    )
    results = run_scaling(model, sizes, args.steps)
    dev = jax.devices()[0]
    out = {
        "model": args.model,
        "tiny_config": args.tiny,
        "grid": list(model.grid.shape),
        "steps": args.steps,
        "platform": dev.platform,
        "device_kind": str(getattr(dev, "device_kind", dev)),
        "note": (
            "virtual CPU mesh: all 'devices' share one host's cores, so "
            "collectives are memcpy and compute oversubscribes — this "
            "validates the harness + sharded code path, NOT ICI scaling; "
            "the ≥80% BASELINE.md target is a pod-slice measurement"
        ) if dev.platform == "cpu" else "",
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
