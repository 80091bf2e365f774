"""Benchmark: grid-points/s/chip on the flagship model at 0.25°.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no quantitative perf numbers (BASELINE.md); its
only quotable bound is the Modal marketing claim "forecast in < 2
minutes" on an A100 (reference README.md:11).  vs_baseline is therefore
the ratio of that 120 s budget to our measured 10-day (40×6 h) rollout
wall-clock — >1.0 means faster than the reference's claim.

Run on the real TPU chip (default env). SKYRIM_BENCH_MODEL overrides
the flagship; SKYRIM_BENCH_STEPS the timed step count.
"""

from __future__ import annotations

import json
import os
import sys
import time

FLAGSHIP = os.environ.get("SKYRIM_BENCH_MODEL", "pangu")
N_STEPS = int(os.environ.get("SKYRIM_BENCH_STEPS", "8"))
TEN_DAY_STEPS = 40  # 10 days at 6 h


def main() -> None:
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from skyrim_tpu.models import MODELS

    try:
        model = MODELS[FLAGSHIP]()
    except Exception:
        model = MODELS["dlwp"]()
    params = model.init_params(jax.random.key(0))
    x0 = np.zeros(model.state_shape, np.float32)

    # Scalar-reduced rollout: on this tunneled platform only a real
    # device→host fetch reliably forces execution, so the benched
    # function returns one scalar (mean of all outputs).
    @partial(jax.jit, static_argnums=(2,))
    def rollout_sum(params, state, n_calls):
        def body(carry, _):
            new_state, y = model.advance(params, carry)
            return new_state, jnp.mean(y.astype(jnp.float32))
        _, ms = jax.lax.scan(body, state, None, length=n_calls)
        return jnp.mean(ms)

    # materialize the state on device ONCE — the 300MB IC transfer
    # through the tunnel must not pollute the timings
    state0 = jax.tree.map(jnp.asarray, model.init_state(params, x0))

    def timed(n_steps: int) -> float:
        n_calls = -(-n_steps // model.frames_out)
        float(rollout_sum(params, state0, n_calls))  # compile warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(rollout_sum(params, state0, n_calls))
            best = min(best, time.perf_counter() - t0)
        return best

    # marginal per-step time cancels the constant tunnel/dispatch overhead
    t_long = timed(N_STEPS)
    t_short = timed(max(N_STEPS // 4, 1))
    n_long = -(-N_STEPS // model.frames_out) * model.frames_out
    n_short = -(-max(N_STEPS // 4, 1) // model.frames_out) * model.frames_out
    per_step = max((t_long - t_short) / max(n_long - n_short, 1), 1e-9)

    H, W = model.grid.shape
    gps = H * W * len(model.channels) / per_step
    ten_day_s = per_step * TEN_DAY_STEPS
    # ALSO run the actual 40-step (10-day) rollout end-to-end — the
    # BASELINE.md wall-clock target is a measurement, not a projection
    ten_day_measured_s = timed(TEN_DAY_STEPS)
    n_frames = n_long
    # reference bound: "forecast in < 2 minutes" (README.md:11); compared
    # against the measured on-device 40-step rollout — the e2e block
    # below additionally measures the full IC→zarr production flow in
    # both full-f32 and deployment (f16 + variable-subset) configs
    vs_baseline = 120.0 / ten_day_measured_s

    # --- e2e production path: IC → stream_rollout → per-step zarr -------
    # Measures the product flow the reference markets ("forecast in
    # < 2 minutes", reference README.md:11).  The overlap design claim
    # (rollout.py: compute ∥ D2H ∥ save) is proven by the per-step e2e
    # wall landing near max(component walls), not their sum.  The
    # tunneled dev TPU caps D2H at ~33 MB/s (measured below) — a real
    # TPU VM moves the same bytes ~100× faster, so the 40-step number
    # is also extrapolated with the measured compute+save but on-host
    # transfer assumptions stated.
    e2e = {}
    try:
        import shutil
        import tempfile
        import zlib as _zlib

        from skyrim_tpu.io.save import SaveConfig, stream_save_forecast

        n_e2e = int(os.environ.get("SKYRIM_BENCH_E2E_STEPS", "6"))
        frame_bytes = H * W * len(model.channels) * 4

        # component: D2H of one output frame (per-step transfer)
        xdev = jnp.zeros((len(model.channels), H, W), jnp.float32) + 1.0
        float(jnp.sum(xdev))
        t0 = time.perf_counter()
        host_frame = np.asarray(xdev)
        t_d2h = time.perf_counter() - t0

        # component: compress+write of one frame (host-side save)
        tmp = tempfile.mkdtemp(prefix="skyrim_e2e_")
        t0 = time.perf_counter()
        _zlib.compress(host_frame.tobytes(), 1)
        t_save = time.perf_counter() - t0

        # measured e2e: n_e2e steps streamed to a local zarr store
        ic = np.zeros(model.state_shape, np.float32)
        stream_save_forecast(  # warm the stream jit + store creation
            model, params, ic, __import__("datetime").datetime(2024, 1, 1),
            n_steps=1, config=SaveConfig(forecast_id="warm", output_dir=tmp))
        t0 = time.perf_counter()
        stream_save_forecast(
            model, params, ic, __import__("datetime").datetime(2024, 1, 1),
            n_steps=n_e2e,
            config=SaveConfig(forecast_id="bench", output_dir=tmp))
        t_e2e = time.perf_counter() - t0

        # production config: f16 on-device cast + served-variable
        # subset selected on device (both cut D2H bytes BEFORE the
        # tunnel/NIC) — the config a deployment actually runs with;
        # the full-f32 full-state numbers above stay as the upper bound
        prod_vars = tuple(
            v for v in (
                "msl", "u10m", "v10m", "t2m",
                "z500", "t500", "u500", "v500", "q500",
                "z850", "t850", "u850", "v850", "q850",
            ) if v in model.channels
        )
        prod_cfg = SaveConfig(
            forecast_id="bench_prod", output_dir=tmp,
            filter_vars=prod_vars,
        )
        # leftover executables/buffers from the full-f32 tier measured a
        # 3x slowdown on the production tier in-process (HBM pressure on
        # the tunneled chip); a cache clear restores isolated-run timing
        jax.clear_caches()
        stream_save_forecast(  # warm the production-shape jit
            model, params, ic, __import__("datetime").datetime(2024, 1, 1),
            n_steps=1, save_dtype="float16",
            config=SaveConfig(forecast_id="warm_prod", output_dir=tmp,
                              filter_vars=prod_vars))
        # the production claim is the TEN-DAY forecast: measure all 40
        # steps end-to-end (IC upload included), not a projection
        t0 = time.perf_counter()
        stream_save_forecast(
            model, params, ic, __import__("datetime").datetime(2024, 1, 1),
            n_steps=TEN_DAY_STEPS, save_dtype="float16", config=prod_cfg)
        t_e2e_prod = time.perf_counter() - t0
        shutil.rmtree(tmp, ignore_errors=True)

        e2e_step = t_e2e / n_e2e
        prod_step = t_e2e_prod / TEN_DAY_STEPS
        bound = max(per_step, t_d2h, t_save)
        e2e = {
            "steps_measured": n_e2e,
            "wall_s": round(t_e2e, 2),
            "e2e_step_s": round(e2e_step, 3),
            "components_step_s": {
                "compute": round(per_step, 3),
                "d2h": round(t_d2h, 3),
                "save": round(t_save, 3),
            },
            "overlap_bound_step_s": round(bound, 3),
            "overlap_ratio": round(e2e_step / bound, 2),
            "d2h_bandwidth_MBps": round(frame_bytes / t_d2h / 1e6, 1),
            "e2e_ten_day_s": round(e2e_step * TEN_DAY_STEPS, 1),
            "e2e_ten_day_onhost_est_s": round(
                max(per_step, t_save) * TEN_DAY_STEPS, 1),
            "production": {
                "config": {
                    "save_dtype": "float16",
                    "filter_vars": list(prod_vars),
                    "bytes_per_step_frac": round(
                        len(prod_vars) / len(model.channels) / 2, 3),
                },
                "e2e_step_s": round(prod_step, 3),
                "e2e_ten_day_MEASURED_s": round(t_e2e_prod, 1),
                "beats_reference_2min_claim":
                    bool(t_e2e_prod < 120.0),
            },
            "note": (
                "overlap_ratio ~1 proves compute/D2H/save overlap; "
                "d2h rides a dev tunnel here — onhost estimate drops "
                "the tunnel term; 'production' uses the deployment "
                "config (f16 transfer + served-variable subset, both "
                "applied on device)"
            ),
        }
    except Exception as e:  # pragma: no cover
        e2e = {"error": str(e)[:200]}

    # roofline honesty anchor: MFU / %-of-HBM-roof from XLA's cost model
    # (the Modal marketing claim stays in vs_baseline for the driver's
    # schema, but distance-to-speed-of-light is the number that matters)
    try:
        from skyrim_tpu.utils.roofline import floor_bytes, roofline, step_cost

        flops, bytes_ = step_cost(model, params, state0)
        roof = roofline(per_step, flops, bytes_,
                        bytes_floor=floor_bytes(model, params, state0))
    except Exception as e:  # pragma: no cover - cost model availability
        roof = {"error": str(e)[:120]}

    print(
        json.dumps(
            {
                "metric": f"grid_points_per_s_per_chip[{model.name}]",
                "value": round(gps, 1),
                "unit": "pts/s",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "model": model.name,
                    "steps_timed": int(n_frames),
                    "wall_long_s": round(t_long, 4),
                    "wall_short_s": round(t_short, 4),
                    "step_wall_s": round(per_step, 4),
                    "ten_day_rollout_s": round(ten_day_s, 2),
                    "ten_day_measured_s": round(ten_day_measured_s, 2),
                    "grid": [H, W, len(model.channels)],
                    "device": str(jax.devices()[0]),
                    "roofline": roof,
                    "e2e": e2e,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
