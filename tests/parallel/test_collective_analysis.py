"""Collective accounting: HLO/StableHLO parsers + efficiency algebra.

Literal instruction lines below are taken verbatim from compiled
XLA / lowered StableHLO dumps of this repo's sharded steps, so the
parsers are pinned against the real formats (tuple results, iota
replica groups, multi-hop permutes)."""

from __future__ import annotations

import numpy as np
import pytest

from skyrim_tpu.parallel.collective_analysis import (
    collect_collectives,
    collect_collectives_stablehlo,
    project_efficiency,
    summarize,
)


def test_permute_line_with_hops():
    line = (
        "  %ppermute.75 = f32[8,18,6,16]{3,2,1,0} collective-permute("
        "%convert_fusion), channel_id=1, "
        "source_target_pairs={{0,2},{1,3},{2,0},{3,1}}, "
        'metadata={op_name="jit(advance)/shard_map/ring"}'
    )
    [c] = collect_collectives(line, 4)
    assert c["kind"] == "collective-permute"
    assert c["bytes"] == 8 * 18 * 6 * 16 * 4
    assert c["ici_bytes"] == c["bytes"] * 2  # shift-by-2 walks 2 links


def test_identity_permute_costs_nothing():
    line = (
        "  %p = f32[4,4]{1,0} collective-permute(%x), "
        "source_target_pairs={{0,0},{1,1},{2,2},{3,3}}"
    )
    [c] = collect_collectives(line, 4)
    assert c["ici_bytes"] == 0


def test_tuple_all_reduce_iota_groups():
    line = (
        "  %all-reduce.9 = (f32[64,181,91]{2,1,0}, f32[64,181,91]{2,1,0}) "
        "all-reduce(%bitcast.8, %bitcast.11), channel_id=4, "
        "replica_groups=[1,4]<=[4], use_global_device_ids=true, "
        'to_apply=%sum, metadata={op_name="spectral contraction"}'
    )
    [c] = collect_collectives(line, 8)  # op group (4) beats device count
    payload = 2 * 64 * 181 * 91 * 4
    assert c["bytes"] == payload
    assert c["group_size"] == 4
    assert c["ici_bytes"] == 2 * payload * 3 // 4  # ring all-reduce


def test_operand_mentions_are_not_double_counted():
    text = "\n".join([
        "  %all-reduce.1 = f32[64]{0} all-reduce(%w), "
        "replica_groups=[1,4]<=[4]",
        "  %fusion.3 = f32[181,90,64]{2,1,0} fusion(%c, %all-reduce.1), "
        "kind=kLoop",
        "  %gte = f32[64]{0} get-tuple-element(%all-reduce.8), index=0",
    ])
    colls = collect_collectives(text, 4)
    assert len(colls) == 1


def test_all_gather_ring_factor():
    line = "  %ag = bf16[64,128]{1,0} all-gather(%x), replica_groups={{0,1,2,3}}"
    [c] = collect_collectives(line, 4)
    assert c["bytes"] == 64 * 128 * 2
    assert c["ici_bytes"] == c["bytes"] * 3 // 4


def test_stablehlo_permute_bf16():
    line = (
        '    %41 = "stablehlo.collective_permute"(%40) '
        "<{channel_handle = #stablehlo.channel_handle<handle = 1, type = 1>, "
        "source_target_pairs = dense<[[0, 1], [1, 2], [2, 3], [3, 0]]> : "
        "tensor<4x2xi64>}> : (tensor<8x18x5x16xbf16>) -> tensor<8x18x5x16xbf16>"
    )
    [c] = collect_collectives_stablehlo(line, 4)
    assert c["kind"] == "collective-permute"
    assert c["bytes"] == 8 * 18 * 5 * 16 * 2  # bf16 — the dtype TPU moves
    assert c["ici_bytes"] == c["bytes"]  # one hop


def test_summarize_groups_by_kind():
    colls = collect_collectives(
        "\n".join([
            "  %p = f32[4]{0} collective-permute(%x), "
            "source_target_pairs={{0,1},{1,0}}",
            "  %r = f32[8]{0} all-reduce(%y), replica_groups={{0,1}}",
        ]),
        2,
    )
    s = summarize(colls)
    assert s["n_collectives"] == 2
    assert set(s["by_kind"]) == {"collective-permute", "all-reduce"}


def test_projection_algebra():
    # pure spatial split: 0.16s / 4 with zero comm → perfect scaling
    p = project_efficiency(0.16, 0, 4)
    assert p["projected_efficiency"] == 1.0
    assert p["binding_term"] == "compute"
    # comm double the compute → 33%, ici-bound
    p = project_efficiency(0.16, int(0.08 * 4.5e10), 4)
    assert p["projected_efficiency"] == pytest.approx(1 / 3, abs=0.01)
    assert p["binding_term"] == "ici"


def test_projection_dp_axis_is_free():
    # dp×lon mesh: t_comp divides by the SPATIAL split only, and the
    # aggregate-throughput efficiency equals t_comp/(t_comp+t_ici)
    p8 = project_efficiency(0.16, 10**6, 8, spatial_split=4)
    p4 = project_efficiency(0.16, 10**6, 4, spatial_split=4)
    assert p8["projected_efficiency"] == p4["projected_efficiency"]
    assert p8["t_comp_s"] == pytest.approx(0.04)


def test_end_to_end_tiny_manual_pangu():
    import jax

    from skyrim_tpu.models.pangu import PanguConfig, PanguModel
    from skyrim_tpu.parallel.collective_analysis import analyze_model
    from skyrim_tpu.parallel.mesh import make_mesh

    cfg = PanguConfig(lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 2, 2))
    model = PanguModel("pangu6", cfg=cfg)
    mesh = make_mesh(dp=1, lat=1, lon=4,
                     devices=np.asarray(jax.devices()[:4]))
    rec = analyze_model(model, mesh, 0.15)
    assert rec["mode"] in ("manual", "gspmd")
    assert rec["collectives"]["n_collectives"] > 0
    assert rec["collectives"]["total_ici_bytes"] > 0
    assert 0 < rec["projection"]["projected_efficiency"] <= 1


def test_dcn_egress_ring_permute():
    """A shift-by-1 ppermute on an 8-ring over 2x4-chip hosts crosses
    each host boundary once: per-host egress = one payload."""
    from skyrim_tpu.parallel.collective_analysis import dcn_egress_per_host

    colls = [{"kind": "collective-permute", "bytes": 1000,
              "ici_bytes": 1000, "group_size": 8}]
    assert dcn_egress_per_host(colls, 8, 4) == 1000
    # shift-by-2: the 2 edge devices of each host egress
    colls[0]["ici_bytes"] = 2000
    assert dcn_egress_per_host(colls, 8, 4) == 2000
    # single host: no DCN at all
    assert dcn_egress_per_host(colls, 4, 4) == 0.0


def test_dcn_egress_all_gather_and_all_to_all():
    from skyrim_tpu.parallel.collective_analysis import dcn_egress_per_host

    ag = [{"kind": "all-gather", "bytes": 800, "ici_bytes": 700,
           "group_size": 8}]
    assert dcn_egress_per_host(ag, 8, 4) == 800 * 7 / 8
    a2a = [{"kind": "all-to-all", "bytes": 800, "ici_bytes": 0,
            "group_size": 8}]
    # half of each of the 4 local devices' payload targets the far host
    assert dcn_egress_per_host(a2a, 8, 4) == 4 * 800 * 4 / 8


def test_project_multihost_algebra():
    """With zero DCN bytes the 1->2-host efficiency collapses to the
    ICI-only ratio; adding DCN time strictly lowers it and flips the
    binding term when dominant."""
    from skyrim_tpu.parallel.collective_analysis import project_multihost

    base = project_multihost(0.1, ici_bytes_N=0, dcn_bytes_per_host=0,
                             n_devices=8, chips_per_host=4, ici_bytes_C=0)
    assert abs(base["projected_efficiency_1_to_H_hosts"] - 1.0) < 1e-9
    heavy = project_multihost(0.1, ici_bytes_N=0,
                              dcn_bytes_per_host=2.5e9,  # 0.1 s of DCN
                              n_devices=8, chips_per_host=4, ici_bytes_C=0)
    assert heavy["projected_efficiency_1_to_H_hosts"] < 0.25
    assert heavy["binding_term"] == "t_dcn"
    assert heavy["hosts"] == 2
