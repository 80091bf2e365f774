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
    for name in args.models.split(","):
        t0 = time.time()
        model = flagship(name)
        params = climatological_params(model, jax.random.key(0))
        x0 = synthetic_ic(model)
        rec = {"model": name, "grid": list(model.grid.shape),
               "channels": len(model.channels)}

        t1 = time.time()
        rec["rollout"] = stability_rollout(model, params, x0, args.steps)
        rec["rollout_wall_s"] = round(time.time() - t1, 2)

        t1 = time.time()
        rec["divergence"] = precision_divergence(
            model, params, x0, args.div_steps
        )
        rec["divergence_wall_s"] = round(time.time() - t1, 2)
        rec["total_wall_s"] = round(time.time() - t0, 2)

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
        out["models"].append(rec)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
