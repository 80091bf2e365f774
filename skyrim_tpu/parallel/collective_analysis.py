"""Per-step collective traffic + modeled ICI scaling efficiency.

The BASELINE.md north star is ≥80% grid-points/s scaling efficiency at
the PRODUCTION shape (721×1440×~70ch).  Real multi-chip hardware is not
available in this environment, but the compiled sharded step is: XLA's
optimized HLO names every collective it inserted, with exact shapes.
This module turns that into evidence:

1. compile ``sharded_advance`` for a model on an N-way virtual mesh at
   full resolution (the same artifact the driver's ``dryrun_multichip``
   validates),
2. walk the optimized HLO and account every collective's per-device ICI
   byte volume (ppermute hops, all-gather/reduce-scatter ring factors,
   all-to-all bisection model),
3. combine with the MEASURED single-chip step wall (BENCH_SUITE.json,
   real TPU) and the public v5e ICI bandwidth to project scaling
   efficiency:  eff(N) = t_comp/N ÷ (t_comp/N + t_ici(N)).

The model is deliberately conservative: collective time is assumed
fully serialized with compute (no overlap), and simultaneous
left/right ring hops are summed even though they ride different ICI
directions.  A projection ≥80% under these assumptions is strong
evidence the target holds on hardware; the binding term is reported
either way.

ICI constants (public, jax-ml.github.io/scaling-book "How to Scale
Your Model", TPU spec table): v5e one-way ICI bandwidth 4.5e10 B/s per
link, 2D torus, 4 links/chip (2 axes × 2 directions).  A 1D mesh axis
(our ``lon`` ring) occupies one torus axis: 2 links/chip.

Replaces: nothing in the reference (single-GPU, SURVEY.md §2.10); this
quantifies the net-new scaling design of parallel/{sharding,fused_shard}.
"""

from __future__ import annotations

import json
import re

import numpy as np

# one-way bytes/s per ICI link; overridable for other TPU generations
V5E_ICI_LINK_BW = 4.5e10

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_KIND_RE = re.compile(
    r"\s(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)(-start|-done)?\("
)
_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")
_PAIRS_RE = re.compile(r"source_target_pairs=\{([^}]*(?:\},\{[^}]*)*)\}")
_REPLICA_RE = re.compile(r"replica_groups=\{?\{([0-9,]+)\}")
_REPLICA_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _shape_bytes(shapes: str) -> int:
    """Total bytes of one or more `dtype[dims]` result shapes."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shapes):
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


def _ring_hops(pairs_str: str, n: int) -> int:
    """Max ring distance of a collective-permute's source→target pairs
    (an aligned shift-by-k permute walks k physical links on the ring;
    identity pairs cost nothing)."""
    hops = 0
    for m in re.finditer(r"\{(\d+),(\d+)\}", pairs_str):
        s, t = int(m.group(1)), int(m.group(2))
        d = (t - s) % n
        hops = max(hops, min(d, n - d))
    return hops


_SH_COLL_RE = re.compile(
    r'"stablehlo\.(collective_permute|all_reduce|all_gather|all_to_all|'
    r'reduce_scatter)"'
)
_SH_TYPE_RE = re.compile(r":\s*\(tensor<([^>]*)>[^)]*\)\s*->")
_SH_PAIRS_RE = re.compile(
    r"source_target_pairs\s*=\s*dense<\[((?:\[[0-9, ]*\],?\s*)*)\]>"
)
_SH_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "i64": 8, "ui64": 8,
    "i32": 4, "ui32": 4, "i16": 2, "ui16": 2, "i8": 1, "ui8": 1, "i1": 1,
}


def _sh_tensor_bytes(t: str) -> int:
    """bytes of a StableHLO tensor type body like '8x18x5x16xbf16'."""
    parts = t.split("x")
    dtype = parts[-1]
    dims = [int(p) for p in parts[:-1] if p.isdigit()]
    n = int(np.prod(dims)) if dims else 1
    return n * _SH_DTYPE_BYTES.get(dtype, 4)


def collect_collectives_stablehlo(text: str, n_devices: int) -> list[dict]:
    """Parse the LOWERED (pre-backend) StableHLO for collectives.

    Used for the shard_map manual path, where the ring ppermutes are in
    the traced program itself: dtypes here are what the TPU moves (the
    CPU backend's compiled HLO upcasts bf16 activations to f32, which
    would double the byte accounting)."""
    out = []
    for line in text.splitlines():
        m = _SH_COLL_RE.search(line)
        if m is None:
            continue
        kind = m.group(1).replace("_", "-").replace(
            "collective-permute", "collective-permute")
        tm = _SH_TYPE_RE.search(line)
        nbytes = _sh_tensor_bytes(tm.group(1)) if tm else 0
        n = n_devices
        if kind == "collective-permute":
            pm = _SH_PAIRS_RE.search(line)
            hops = 0
            if pm:
                for pair in re.finditer(r"\[(\d+),\s*(\d+)\]", pm.group(1)):
                    s, t = int(pair.group(1)), int(pair.group(2))
                    d = (t - s) % n
                    hops = max(hops, min(d, n - d))
            else:
                hops = 1
            ici = nbytes * hops
        elif kind in ("all-gather", "reduce-scatter"):
            ici = nbytes * (n - 1) // max(n, 1)
        elif kind == "all-reduce":
            ici = 2 * nbytes * (n - 1) // max(n, 1)
        else:
            ici = int(nbytes * (n - 1) / max(n, 1) * (n / 4) / 2)
        out.append({
            "kind": kind, "bytes": nbytes, "ici_bytes": int(ici),
            "group_size": n, "op_name": "",
        })
    return out


def collect_collectives(hlo_text: str, n_devices: int) -> list[dict]:
    """Parse optimized HLO; one record per collective instruction.

    ``ici_bytes`` is the per-device link-byte cost under the ring
    model: what one chip pushes through ONE direction of its ICI links
    for this op (hops × payload for ppermute; ring factors otherwise).
    """
    out = []
    for line in hlo_text.splitlines():
        m = _KIND_RE.search(line)
        if m is None or m.group(2) == "-done":  # -done pairs a -start
            continue
        eq = line.find("=")
        if eq < 0 or eq > m.start():  # operand mention, not a definition
            continue
        kind = m.group(1)
        # result shape(s) sit between '=' and the op kind; tuple results
        # are parenthesized lists the shape regex walks element-wise
        nbytes = _shape_bytes(line[eq + 1:m.start()])
        n = n_devices
        rg = _REPLICA_RE.search(line)
        rgi = _REPLICA_IOTA_RE.search(line)
        if rg:
            group = [int(x) for x in rg.group(1).split(",") if x]
            if len(group) > 1:
                n = len(group)
        elif rgi:  # iota form: [num_groups,group_size]<=[...]
            n = int(rgi.group(2))
        if kind == "collective-permute":
            pm = _PAIRS_RE.search(line)
            hops = _ring_hops(pm.group(1), n) if pm else 1
            ici = nbytes * hops
        elif kind == "all-gather":
            # ring: each chip forwards (n-1) shards of out_bytes/n
            ici = nbytes * (n - 1) // max(n, 1)
        elif kind == "reduce-scatter":
            ici = nbytes * (n - 1) // max(n, 1)
        elif kind == "all-reduce":
            ici = 2 * nbytes * (n - 1) // max(n, 1)
        else:  # all-to-all: bisection model on a bidirectional ring —
            # per-chip outbound (n-1)/n of payload, avg hop distance n/4,
            # spread over the ring's 2 directions
            ici = int(nbytes * (n - 1) / max(n, 1) * (n / 4) / 2)
        op = _OPNAME_RE.search(line)
        out.append({
            "kind": kind,
            "bytes": nbytes,
            "ici_bytes": int(ici),
            "group_size": n,
            "op_name": (op.group(1)[-120:] if op else ""),
        })
    return out


def summarize(colls: list[dict]) -> dict:
    by_kind: dict[str, dict] = {}
    for c in colls:
        k = by_kind.setdefault(c["kind"], {"count": 0, "bytes": 0, "ici_bytes": 0})
        k["count"] += 1
        k["bytes"] += c["bytes"]
        k["ici_bytes"] += c["ici_bytes"]
    return {
        "n_collectives": len(colls),
        "total_payload_bytes": sum(c["bytes"] for c in colls),
        "total_ici_bytes": sum(c["ici_bytes"] for c in colls),
        "by_kind": by_kind,
    }


def project_efficiency(
    t_step_1chip_s: float,
    ici_bytes_per_step: int,
    n_devices: int,
    spatial_split: int | None = None,
    link_bw: float = V5E_ICI_LINK_BW,
) -> dict:
    """Conservative scaling projection for one sharded step.

    t_comp = measured single-chip wall / spatial_split (the manual lon
    path splits every kernel's token count evenly, and GSPMD spatial
    sharding splits the dominant GEMMs likewise); t_ici = link bytes /
    one link's one-way bandwidth, fully serialized with compute.

    ``dp`` ranks (n_devices > spatial_split) carry independent ensemble
    members with zero inter-member communication during a rollout, so
    aggregate grid-points/s efficiency reduces to the SAME expression:
    eff = (dp/t_step)/(N/t1) = t_comp/(t_comp + t_ici).
    """
    spatial = spatial_split or n_devices
    t_comp = t_step_1chip_s / spatial
    t_ici = ici_bytes_per_step / link_bw
    eff = t_comp / (t_comp + t_ici) if (t_comp + t_ici) > 0 else 0.0
    return {
        "devices": n_devices,
        "spatial_split": spatial,
        "t_comp_s": round(t_comp, 5),
        "t_ici_s": round(t_ici, 5),
        "projected_step_s": round(t_comp + t_ici, 5),
        "projected_efficiency": round(eff, 4),
        "binding_term": "compute" if t_comp >= t_ici else "ici",
        "assumptions": "no compute/comm overlap; ring hops serialized",
    }


def analyze_model(model, mesh, t_step_1chip_s: float | None) -> dict:
    """Compile the full-res sharded step on ``mesh`` and account its
    collectives; attach the efficiency projection when a measured
    single-chip step wall is given."""
    import jax

    from skyrim_tpu.parallel.mesh import AXES
    from skyrim_tpu.parallel.sharding import (
        _step_mode, shard_state, sharded_advance,
    )

    n = mesh.size
    mode = _step_mode(model, mesh)
    params = model.init_params(jax.random.key(0))
    state = shard_state(
        mesh, model.init_state(params, np.zeros(model.state_shape, np.float32))
    )
    lowered = sharded_advance(model, mesh).lower(params, state)
    compiled = lowered.compile()
    spatial = mesh.shape.get(AXES.lon, 1) * mesh.shape.get(AXES.lat, 1)
    if mode == "manual":
        # the ring ppermutes are explicit in the traced program; the
        # lowered StableHLO carries the true (bf16) payload dtypes the
        # TPU would move — the CPU backend's compiled HLO upcasts to f32
        colls = collect_collectives_stablehlo(lowered.as_text(), spatial)
        hlo_source = "stablehlo_lowered"
    else:
        # GSPMD collectives only exist after the SPMD partitioner ran
        colls = collect_collectives(compiled.as_text(), spatial)
        hlo_source = "compiled_hlo"
    mem = compiled.memory_analysis()
    summary = summarize(colls)
    if spatial >= 2 and spatial % 2 == 0:
        # cross-host egress if this spatial ring SPANNED 2 hosts of
        # spatial/2 chips (consumed by the dcn_projection tier)
        summary["dcn_bytes_per_host_2host"] = int(
            dcn_egress_per_host(colls, spatial, spatial // 2)
        )
    out = {
        "mode": mode,
        "hlo_source": hlo_source,
        "mesh": dict(mesh.shape),
        "grid": list(model.grid.shape) + [len(model.channels)],
        "collectives": summary,
        "argument_gib": round(
            getattr(mem, "argument_size_in_bytes", 0) / 2**30, 2),
        "temp_gib": round(getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2),
    }
    if t_step_1chip_s:
        out["projection"] = project_efficiency(
            t_step_1chip_s, out["collectives"]["total_ici_bytes"], n,
            spatial_split=spatial)
        out["projection"]["t_step_1chip_s"] = t_step_1chip_s
    return out


def analyze_dp_ensemble(model, mesh, t_step_1chip_s: float | None) -> dict:
    """Collective accounting for the dp-ensemble decomposition: N members
    across the ``dp`` axis (core/ic_ensemble.py's production mode).
    Members are independent rollouts, so the expected per-step ICI
    traffic is ~zero — this verifies that claim against the compiled
    graph rather than asserting it."""
    import jax
    import numpy as np

    from skyrim_tpu.parallel.mesh import AXES
    from skyrim_tpu.parallel.sharding import dp_ensemble_rollout

    n = mesh.shape[AXES.dp]
    params = model.init_params(jax.random.key(0))
    x0 = np.zeros((n, *model.state_shape), np.float32)
    run = dp_ensemble_rollout(model, mesh, n_steps=model.frames_out)
    compiled = run.lower(params, x0).compile()
    colls = collect_collectives(compiled.as_text(), n)
    out = {
        "mode": "dp_ensemble",
        "mesh": dict(mesh.shape),
        "grid": list(model.grid.shape) + [len(model.channels)],
        "collectives": summarize(colls),
    }
    if t_step_1chip_s:
        # dp splits members, not one member's step: ideal aggregate
        # throughput is N× one chip; only collective time detracts
        t_ici = out["collectives"]["total_ici_bytes"] / V5E_ICI_LINK_BW
        eff = t_step_1chip_s / (t_step_1chip_s + t_ici)
        out["projection"] = {
            "devices": mesh.size,
            "t_comp_s": round(t_step_1chip_s, 5),
            "t_ici_s": round(t_ici, 6),
            "projected_efficiency": round(eff, 4),
            "binding_term": "compute" if t_step_1chip_s >= t_ici else "ici",
            "t_step_1chip_s": t_step_1chip_s,
        }
    return out


def measured_step_wall(model_name: str, path: str = "BENCH_SUITE.json") -> float | None:
    """Single-chip step wall measured on the real TPU (bench_suite.py)."""
    try:
        with open(path) as fh:
            suite = json.load(fh)
        for m in suite.get("models", []):
            if m.get("model") == model_name and "step_wall_s" in m:
                return float(m["step_wall_s"])
    except Exception:
        pass
    return None


# ---------------------------------------------------------------------------
# DCN (cross-host) tier — the literal BASELINE metric is 1 → N HOSTS
# ---------------------------------------------------------------------------

#: bytes/s DCN egress per HOST.  Public figure: v5e hosts (4x2 chip
#: trays) attach 200 Gbps NICs = 25 GB/s (scaling-book TPU networking
#: table).  Overridable for other deployments.
V5E_DCN_HOST_BW = 2.5e10


def dcn_egress_per_host(
    colls: list[dict], n_devices: int, chips_per_host: int
) -> float:
    """Per-step DCN egress bytes of ONE host for a spatial decomposition
    SPANNING hosts (devices laid out linearly: host = device // C).

    Model per collective kind on an n-ring with contiguous C-chip hosts:

    * collective-permute shift-by-k: the k devices at each host's edge
      send their payload across the boundary → min(k, C)·payload;
    * all-gather (ring): every remote shard transits each boundary —
      ≈ result_bytes·(g−1)/g per host;
    * reduce-scatter (ring): (g−1) shard-sized hops cross per host —
      shard is the (scattered) result → result_bytes·(g−1);
    * all-reduce: reduce-scatter + all-gather ≈ 2·bytes·(g−1)/g;
    * all-to-all: the fraction of each device's payload targeting the
      other hosts egresses once → C·bytes·(n−C)/n.

    Hosts are symmetric, so the step's DCN time is this value divided
    by one host's DCN bandwidth.
    """
    C = chips_per_host
    if n_devices <= C:
        return 0.0
    total = 0.0
    for c in colls:
        b, g, kind = c["bytes"], c["group_size"], c["kind"]
        if kind == "collective-permute":
            k = (c["ici_bytes"] // b) if b else 0
            total += min(k, C) * b
        elif kind == "all-gather":
            total += b * (g - 1) / max(g, 1)
        elif kind == "reduce-scatter":
            total += b * (g - 1)
        elif kind == "all-reduce":
            total += 2 * b * (g - 1) / max(g, 1)
        else:  # all-to-all
            total += C * b * (n_devices - C) / max(n_devices, 1)
    return total


def project_multihost(
    t_step_1chip_s: float,
    ici_bytes_N: int,
    dcn_bytes_per_host: float,
    n_devices: int,
    chips_per_host: int,
    ici_bytes_C: int,
    link_bw: float = V5E_ICI_LINK_BW,
    dcn_bw: float = V5E_DCN_HOST_BW,
) -> dict:
    """1 → H hosts scaling efficiency for a spatial decomposition that
    SPANS hosts (the stress case; production layouts put the ring inside
    a host and dp across hosts, where per-step DCN is zero).

    eff = per-chip throughput at H hosts / per-chip throughput at 1
    host = (C·t_step(C)) / (N·t_step(N)), with t_step(N) = t_comp/N +
    t_ici(N) + t_dcn(N), no overlap (conservative).
    """
    C = chips_per_host
    H = n_devices // C
    t_comp = t_step_1chip_s
    t_C = t_comp / C + ici_bytes_C / link_bw
    t_N = t_comp / n_devices + ici_bytes_N / link_bw + dcn_bytes_per_host / dcn_bw
    eff = (C * t_C) / (n_devices * t_N) if t_N > 0 else 0.0
    terms = {
        "t_comp/N": t_comp / n_devices,
        "t_ici": ici_bytes_N / link_bw,
        "t_dcn": dcn_bytes_per_host / dcn_bw,
    }
    return {
        "hosts": H,
        "chips_per_host": C,
        "devices": n_devices,
        "t_step_1host_s": round(t_C, 5),
        "t_step_multihost_s": round(t_N, 5),
        "dcn_bytes_per_host_per_step": int(dcn_bytes_per_host),
        "t_dcn_s": round(terms["t_dcn"], 5),
        "projected_efficiency_1_to_H_hosts": round(eff, 4),
        "binding_term": max(terms, key=terms.get),
        "assumptions": (
            "linear host layout (host = device // chips_per_host); no "
            "compute/comm overlap; DCN egress serialized per host at "
            f"{dcn_bw / 1e9:.0f} GB/s"
        ),
    }
