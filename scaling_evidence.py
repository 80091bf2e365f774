"""Produce SCALING_r04.json: production-shape scaling evidence.

Two tiers, both at the FULL 0.25-degree production resolution:

1. collective accounting — compile the sharded step for the flagship
   models at 2/4/8-way decompositions on the virtual mesh, parse every
   collective XLA inserted (exact shapes from optimized HLO), and
   project ICI scaling efficiency against the single-chip step wall
   MEASURED on the real TPU (BENCH_SUITE.json).  See
   skyrim_tpu/parallel/collective_analysis.py for the model + constants.
2. toy measured runs — the oversubscribed-CPU-mesh harness shakeout
   (same as SCALING_r03.json; validates the sharded code path executes,
   not ICI).

Usage:  python scaling_evidence.py            # full artifact
        python scaling_evidence.py --fast     # pangu lon=4 only (smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _cpu_mesh(n: int):
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += f" --xla_force_host_platform_device_count={n}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if len(jax.devices()) < n:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--out", default="SCALING_r05.json")
    args = ap.parse_args()

    _cpu_mesh(8)
    # keep the fused Pallas kernels live so the manual path (the
    # production configuration) is what gets compiled and accounted
    os.environ["SKYRIM_FORCE_PALLAS"] = "1"

    import jax
    import numpy as np

    from skyrim_tpu.parallel.collective_analysis import (
        analyze_model, measured_step_wall,
    )
    from skyrim_tpu.parallel.mesh import make_mesh

    def mesh_of(dp: int, lon: int):
        n = dp * lon
        return make_mesh(dp=dp, lat=1, lon=lon,
                         devices=np.asarray(jax.devices()[:n]))

    jobs: list[tuple[str, object, int, int]] = []  # name, model_fn, dp, lon

    def pangu():
        from skyrim_tpu.models.pangu import PanguModel

        return PanguModel("pangu6")

    def sfno():
        from skyrim_tpu.models.sfno import FourCastNetV2Model

        return FourCastNetV2Model()

    def fengwu():
        from skyrim_tpu.models.fengwu import FengWuModel

        return FengWuModel()

    if args.fast:
        jobs = [("pangu", pangu, 1, 4)]
    else:
        # Pangu's half-res trunk has 180 lon tokens → lon must divide
        # 180; the 8-chip production decomposition is dp=2 × lon=4
        # (dp carries ensemble members / init times).
        jobs = [
            ("pangu", pangu, 1, 2),
            ("pangu", pangu, 1, 4),
            ("pangu", pangu, 2, 4),
            ("fourcastnet_v2", sfno, 1, 2),
            ("fourcastnet_v2", sfno, 1, 4),
            ("fourcastnet_v2", sfno, 1, 8),
            ("fengwu", fengwu, 1, 2),
            ("fengwu", fengwu, 1, 4),
            ("fengwu", fengwu, 2, 4),
        ]

    analyses = []
    for name, model_fn, dp, lon in jobs:
        t1 = measured_step_wall(name)
        t0 = time.time()
        model = model_fn()
        try:
            rec = analyze_model(model, mesh_of(dp, lon), t1)
        except Exception as e:  # record, keep going
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
        rec["model"] = name
        rec["compile_wall_s"] = round(time.time() - t0, 1)
        if name == "fourcastnet_v2" and rec.get("mode") == "gspmd":
            rec["caveat"] = (
                "spatial decomposition is the memory-relief mode for this "
                "model, not its production scaling axis: the compiled "
                "graph shows GSPMD keeps the small internal-grid middle "
                "(12 blocks at 120x240) unsharded — only block_0/11's "
                "full-res transforms split — so t_comp/N is optimistic "
                "here AND a 27 ms step is comm-bound regardless; "
                "production scaling for SFNO rides the dp ensemble axis "
                "(see tier1_dp_ensemble)"
            )
        analyses.append(rec)
        print(json.dumps(rec), flush=True)
        del model

    # dp-ensemble tier: SFNO's production decomposition (N independent
    # members across dp — core/ic_ensemble.py).  Verified, not asserted:
    # collectives are counted from the compiled 8-member graph.
    dp_analyses = []
    if not args.fast:
        from skyrim_tpu.parallel.collective_analysis import analyze_dp_ensemble

        t0 = time.time()
        try:
            model = sfno()
            rec = analyze_dp_ensemble(
                model, mesh_of(8, 1), measured_step_wall("fourcastnet_v2"))
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
        rec["model"] = "fourcastnet_v2"
        rec["compile_wall_s"] = round(time.time() - t0, 1)
        dp_analyses.append(rec)
        print(json.dumps(rec), flush=True)

    # verdict: each model judged at ITS production 8-device decomposition
    # (pangu/fengwu: dp=2 x lon=4 manual halo path; sfno: dp=8 ensemble)
    prod = {}
    for a in analyses:
        p = a.get("projection", {})
        if a.get("model") in ("pangu", "fengwu") and p.get("devices") == 8:
            prod[a["model"]] = p["projected_efficiency"]
    for a in dp_analyses:
        p = a.get("projection", {})
        if p:
            prod[a["model"] + "(dp)"] = p["projected_efficiency"]
    verdict = {}
    if prod:
        worst = min(prod.values())
        verdict = {
            "production_decomposition_efficiency_8dev": prod,
            "min_projected_efficiency_8dev": worst,
            "target": 0.8,
            "meets_target": worst >= 0.8,
            "binding_term": (
                "pangu/fengwu: halo ring ppermutes (bf16, counted from "
                "lowered StableHLO); sfno(dp): none — members are "
                "independent"
            ),
            "note": (
                "projection combines real-TPU single-chip step walls "
                "(BENCH_SUITE.json) with per-step collective link bytes "
                "parsed from the compiled full-resolution sharded step "
                "and public v5e ICI bandwidth (45 GB/s/link one-way); "
                "no compute/communication overlap assumed (conservative). "
                "SFNO spatial-mode rows are reported for completeness "
                "with their caveat — that mode exists for memory relief, "
                "and its projection is not the production number."
            ),
        }

    # --- DCN tier: the literal BASELINE metric is 1 → N HOSTS ---------
    # Production multi-host layouts put the halo/spectral ring INSIDE a
    # host (lon ≤ 4 for Pangu/FengWu — the lon_shard_divisor constraint)
    # and dp (independent ensemble members / init times) ACROSS hosts:
    # per-step DCN traffic is then ZERO, so 1→H-host efficiency equals
    # the intra-host projection.  The stress case — a spatial ring
    # SPANNING 2 hosts — is projected for SFNO's lon=8 GSPMD step from
    # its counted collectives + the public v5e host DCN bandwidth.
    dcn = {}
    if not args.fast:
        from skyrim_tpu.parallel.collective_analysis import (
            V5E_DCN_HOST_BW, project_multihost,
        )

        by = {}
        for a in analyses:
            if "error" not in a:
                lon = a.get("mesh", {}).get("lon", 0)
                by[(a["model"], lon, a.get("mesh", {}).get("dp", 1))] = a
        prod_rows = {}
        for name in ("pangu", "fengwu"):
            a = by.get((name, 4, 2)) or by.get((name, 4, 1))
            if a and "projection" in a:
                prod_rows[name] = {
                    "layout": "dp=2 hosts x lon=4 intra-host ring",
                    "per_step_dcn_bytes": 0,
                    "projected_efficiency_1_to_2_hosts":
                        a["projection"]["projected_efficiency"],
                    "note": (
                        "dp members are independent rollouts — the halo "
                        "ring never crosses DCN; efficiency equals the "
                        "intra-host ICI projection"
                    ),
                }
        a4 = by.get(("fourcastnet_v2", 4, 1))
        a8 = by.get(("fourcastnet_v2", 8, 1))
        stress = None
        if a4 and a8 and "projection" in a8:
            t1 = measured_step_wall("fourcastnet_v2")
            stress = project_multihost(
                t1,
                a8["collectives"]["total_ici_bytes"],
                a8["collectives"].get("dcn_bytes_per_host_2host", 0),
                8, 4,
                a4["collectives"]["total_ici_bytes"],
            )
            stress["model"] = "fourcastnet_v2"
            stress["layout"] = "lon=8 spectral ring spanning 2x4-chip hosts"
        effs = [r["projected_efficiency_1_to_2_hosts"]
                for r in prod_rows.values()]
        dcn = {
            "dcn_bw_per_host_Bps": V5E_DCN_HOST_BW,
            "production_layouts": prod_rows,
            "spanning_ring_stress_case": stress,
            "beyond_8_chips": (
                "Pangu's lon axis is capped at 4 by lon_shard_divisor "
                "(180 half-res lon tokens must split evenly); past "
                "dp x lon=4x... the next spatial axis is LAT (the manual "
                "path's halo machinery is axis-symmetric; lat=721 rows "
                "split at the 181-token trunk into 2-4 shards), and dp "
                "keeps scaling linearly with ensemble width (51-member "
                "ENS production runs fill 51+ chips before any further "
                "spatial split is needed)"
            ),
            "verdict": {
                "min_projected_efficiency_1_to_2_hosts":
                    min(effs) if effs else None,
                "target": 0.8,
                "meets_target": bool(effs) and min(effs) >= 0.8,
            },
        }

    out = {
        "resolution": "full production 721x1440 (per-model channels)",
        "tier1_collective_accounting": analyses,
        "tier1_dp_ensemble": dp_analyses,
        "verdict": verdict,
        "dcn_projection": dcn,
    }

    # tier 2: toy measured harness run (labeled; not ICI evidence)
    if not args.fast:
        from skyrim_tpu.parallel.scaling_bench import _tiny_model, run_scaling

        model = _tiny_model("fourcastnet_v2")
        toy = run_scaling(model, [1, 2, 4, 8], n_steps=4)
        out["tier2_toy_measured"] = {
            "note": (
                "oversubscribed virtual CPU mesh — validates the sharded "
                "code path end-to-end, NOT ICI scaling"
            ),
            "model": "fourcastnet_v2(tiny)",
            "results": toy,
        }

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
