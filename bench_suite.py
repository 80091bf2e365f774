"""Bench every model family at full resolution on the current device.

Writes BENCH_SUITE.json: per-model step wall-clock, grid-points/s, and
10-day rollout projection.  (bench.py stays the driver's single-line
flagship metric; this is the full matrix.)
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TEN_DAY_STEPS = 40


def bench_model(name: str, n_steps: int = 8) -> dict:
    from skyrim_tpu.models import MODELS

    base = name.split("(")[0]
    model = MODELS[base]() if base != "pangu" else MODELS[base]("pangu6")
    params = model.init_params(jax.random.key(0))
    if hasattr(model, "trim_stages"):
        # cascade models: keep only stages an n_steps rollout reaches
        # (a 16 GB chip holds one ~1.4 B stage comfortably, not three)
        params = model.trim_stages(params, n_steps)
    if name.endswith("(int8-serve)"):
        # serving quantization: trunk GEMMs as int8 MXU dots, weights
        # never materialized in bf16 (quantize.split_dense_int8)
        params = model.quantize_params(params, serve_int8=True)
    x0 = np.zeros(model.state_shape, np.float32)
    state0 = jax.tree.map(jnp.asarray, model.init_state(params, x0))

    @partial(jax.jit, static_argnums=(2,))
    def rollout_sum(params, state, n_calls):
        def body(c, _):
            s, y = model.advance(params, c)
            return s, jnp.mean(y.astype(jnp.float32))
        _, ms = jax.lax.scan(body, state, None, length=n_calls)
        return jnp.mean(ms)

    def timed(n):
        n_calls = -(-n // model.frames_out)
        float(rollout_sum(params, state0, n_calls))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rollout_sum(params, state0, n_calls))
            best = min(best, time.perf_counter() - t0)
        return best, n_calls * model.frames_out

    t_long, n_long = timed(n_steps)
    t_short, n_short = timed(max(n_steps // 4, 1))
    per_step = max((t_long - t_short) / max(n_long - n_short, 1), 1e-9)
    H, W = model.grid.shape
    try:
        from skyrim_tpu.utils.hlo_bytes import step_physical_bytes
        from skyrim_tpu.utils.roofline import floor_bytes, roofline, step_cost

        flops, bytes_ = step_cost(model, params, state0)
        try:
            phys = float(step_physical_bytes(model, params, state0))
        except Exception:
            phys = None
        # advance() emits frames_out frames; per_step is per frame —
        # normalize the per-advance cost figures to match
        fo = model.frames_out
        roof = roofline(per_step, flops / fo, bytes_ / fo,
                        bytes_floor=floor_bytes(model, params, state0) / fo,
                        bytes_physical=None if phys is None else phys / fo)
    except Exception as e:
        roof = {"error": str(e)[:120]}
    return {
        "model": name,
        "step_wall_s": round(per_step, 4),
        "grid_points_per_s": round(H * W * len(model.channels) / per_step, 1),
        "ten_day_s": round(per_step * TEN_DAY_STEPS, 2),
        "params_m": round(model.param_count(params) / 1e6, 1),
        "grid": [H, W, len(model.channels)],
        "roofline": roof,
    }


if __name__ == "__main__":
    import sys

    names = sys.argv[1:] or [
        "dlwp", "fourcastnet", "fourcastnet_v2", "pangu", "fuxi",
        "fuxi(int8-serve)", "fengwu", "graphcast",
    ]
    # merge into an existing matrix so partial reruns (one model) keep
    # the other entries instead of truncating the committed artifact
    try:
        with open("BENCH_SUITE.json") as fh:
            results = json.load(fh)
    except Exception:
        results = {"models": []}
    if not isinstance(results.get("models"), list):
        results["models"] = []
    results["device"] = str(jax.devices()[0])
    by_name = {m.get("model"): i for i, m in enumerate(results["models"])}
    for name in names:
        try:
            r = bench_model(name)
            print(json.dumps(r))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            r = {"model": name, "error": str(e)[:200]}
        if name in by_name:
            results["models"][by_name[name]] = r
        else:
            by_name[name] = len(results["models"])
            results["models"].append(r)
    with open("BENCH_SUITE.json", "w") as fh:
        json.dump(results, fh, indent=2)
