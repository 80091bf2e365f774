"""Produce STABILITY_r04.json: full-resolution numerical-stability
evidence for the flagship three (SURVEY §7 hard part 1).

On the real TPU, for pangu / fourcastnet_v2 / graphcast at production
resolution:

1. a 40-step (10-day) rollout from a climatological synthetic IC with
   normalization stats pinned to the same climatology — per-step
   normalized-space RMS / max-abs / finite tracked by a stats-only
   lax.scan (the 40-frame output stack would exceed HBM);
2. a bf16-vs-fp32(``highest`` matmul precision) divergence curve over
   10 steps — the closest offline proxy to the allclose north star.

Usage:  python stability_evidence.py [--steps 40] [--div-steps 10]
        python stability_evidence.py --fast      # pangu only, 6/3 steps
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def flagship(name):
    from skyrim_tpu.models import MODELS

    return MODELS[name]("pangu6") if name == "pangu" else MODELS[name]()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--div-steps", type=int, default=10)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--models", default="pangu,fourcastnet_v2,graphcast")
    ap.add_argument("--out", default="STABILITY_r04.json")
    ap.add_argument("--merge", action="store_true",
                    help="update only the listed models inside an "
                         "existing artifact")
    args = ap.parse_args()
    if args.fast:
        args.steps, args.div_steps, args.models = 6, 3, "pangu"

    import jax

    from skyrim_tpu.utils.stability import (
        climatological_params,
        precision_divergence,
        stability_rollout,
        synthetic_ic,
    )

    out = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "models": [],
    }
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        run_set = set(args.models.split(","))
        out["models"] = [
            m for m in prior.get("models", []) if m.get("model") not in run_set
        ]

    #: fp32-leg config overrides: GraphCast's doubled activation width
    #: exhausts HBM at full res unless the edge MLPs scan in more chunks
    # GraphCast's fp32 leg keeps the Pallas kernels (the XLA fallback
    # materializes edge-wide f32 intermediates that exhaust HBM at full
    # res); the scoped-VMEM limit is raised per-compile so the
    # bf16-tuned g2m block (125.3 MiB at f32) fits physical VMEM
    FP32_PALLAS = {"graphcast"}

    def flush():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    for name in args.models.split(","):
        t0 = time.time()
        model = flagship(name)
        params = climatological_params(model, jax.random.key(0))
        x0 = synthetic_ic(model)
        rec = {"model": name, "grid": list(model.grid.shape),
               "channels": len(model.channels)}
        out["models"].append(rec)

        try:
            t1 = time.time()
            rec["rollout"] = stability_rollout(model, params, x0, args.steps)
            rec["rollout_wall_s"] = round(time.time() - t1, 2)
            flush()  # incremental: a later model's failure loses nothing

            t1 = time.time()
            rec["divergence"] = precision_divergence(
                model, params, x0, args.div_steps,
                fp32_pallas=name in FP32_PALLAS,
                # GraphCast cannot hold both legs' multi-GiB edge caches
                # resident on one 16 GiB chip — run the legs sequentially
                sequential=name in FP32_PALLAS,
            )
            rec["divergence_wall_s"] = round(time.time() - t1, 2)
        except Exception as e:  # record and continue with the next model
            rec["error"] = f"{type(e).__name__}: {e}"[:2000]
            print(f"{name}: FAILED {rec['error'][:200]}", flush=True)
            flush()
            continue
        rec["total_wall_s"] = round(time.time() - t0, 2)
        flush()

        r = rec["rollout"]
        print(
            f"{name}: {r['n_steps']} steps all_finite={r['all_finite']} "
            f"rms {r['rms'][0]:.3g}->{r['rms'][-1]:.3g} "
            f"growth/step {r['growth_per_step_geo']:.4f} | "
            f"bf16-vs-fp32 relL2 step1 {rec['divergence']['rel_l2'][0]:.3g} "
            f"step{args.div_steps} {rec['divergence']['rel_l2'][-1]:.3g} "
            f"({rec['total_wall_s']:.0f}s)",
            flush=True,
        )

    flush()
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
