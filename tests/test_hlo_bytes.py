"""Physical-layout HLO traffic accounting (utils/hlo_bytes).

Closes the roofline bracket the cost model couldn't (round-3 VERDICT
weak 3): these pin the tile-padding math, the while-loop trip-count
multiplier, and the end-to-end parse of a real compiled module.
"""

import jax
import jax.numpy as jnp
import numpy as np

from skyrim_tpu.utils.hlo_bytes import (
    hlo_physical_traffic,
    parse_hlo,
    physical_bytes,
)


def test_physical_bytes_padding():
    # f32 row-major (M, 14): minor dim 14 pads to 128 lanes
    assert physical_bytes("f32", [1024, 14], "1,0:T(8,128)") == 1024 * 128 * 4
    # transposed layout {0,1}: minor dim is M (packs), second-minor 14→16
    assert physical_bytes("f32", [1024, 14], "0,1:T(8,128)") == 1024 * 16 * 4
    # bf16 packs two rows per lane word: T(16,128)(2,1), second-minor 14→16
    assert physical_bytes("bf16", [1024, 14], "1,0:T(16,128)(2,1)") == 1024 * 128 * 2
    # 1-D linear tile
    assert physical_bytes("s32", [1000], "0:T(1024)") == 1024 * 4
    # scalar
    assert physical_bytes("f32", [], None) == 4


def test_physical_bytes_default_layout():
    # no layout string → row-major with dtype-default tiling
    assert physical_bytes("f32", [8, 128], None) == 8 * 128 * 4
    assert physical_bytes("f32", [3, 100], None) == 8 * 128 * 4  # pads 3→8, 100→128


_SYNTHETIC = """\
HloModule m

%cond (p: (s32[], f32[8,128])) -> pred[] {
  %p = (s32[]{:T(128)}, f32[8,128]{1,0:T(8,128)}) parameter(0)
  %gte = s32[]{:T(128)} get-tuple-element(%p), index=0
  %c = s32[]{:T(128)} constant(5)
  ROOT %lt = pred[]{:T(128)} compare(%gte, %c), direction=LT
}

%body (p: (s32[], f32[8,128])) -> (s32[], f32[8,128]) {
  %p = (s32[]{:T(128)}, f32[8,128]{1,0:T(8,128)}) parameter(0)
  %i = s32[]{:T(128)} get-tuple-element(%p), index=0
  %x = f32[8,128]{1,0:T(8,128)} get-tuple-element(%p), index=1
  %y = f32[8,128]{1,0:T(8,128)} multiply(%x, %x)
  %one = s32[]{:T(128)} constant(1)
  %i2 = s32[]{:T(128)} add(%i, %one)
  ROOT %t = (s32[]{:T(128)}, f32[8,128]{1,0:T(8,128)}) tuple(%i2, %y)
}

ENTRY %main (a: f32[8,128]) -> f32[8,128] {
  %a = f32[8,128]{1,0:T(8,128)} parameter(0)
  %zero = s32[]{:T(128)} constant(0)
  %init = (s32[]{:T(128)}, f32[8,128]{1,0:T(8,128)}) tuple(%zero, %a)
  %w = (s32[]{:T(128)}, f32[8,128]{1,0:T(8,128)}) while(%init), condition=%cond, body=%body
  ROOT %out = f32[8,128]{1,0:T(8,128)} get-tuple-element(%w), index=1
}
"""


def test_while_trip_count_multiplies():
    comps = parse_hlo(_SYNTHETIC)
    assert set(comps) == {"cond", "body", "main"}
    assert comps["main"].is_entry
    r = hlo_physical_traffic(_SYNTHETIC)
    page = 8 * 128 * 4
    # body: multiply reads x twice (same operand listed twice) + writes y
    # → 3 pages/iteration; add (scalars ≈ 3 tiny) — 5 trips total
    assert r["total_bytes"] >= 5 * 3 * page
    assert r["total_bytes"] < 5 * 3 * page + 5 * 4096
    assert r["entry"] == "main"
    assert r["top"][0][0] >= 3 * page * 5  # the while-scaled multiply leads


def test_real_compiled_module_accounts_loop():
    n = 13
    size = (64, 256)

    def loop(a):
        return jax.lax.fori_loop(0, n, lambda i, x: x * 1.001, a)

    txt = jax.jit(loop).lower(jnp.zeros(size, jnp.float32)).compile().as_text()
    r = hlo_physical_traffic(txt)
    one_pass = size[0] * size[1] * 4
    # at least n reads+writes of the buffer; at most a few extra copies
    assert r["total_bytes"] >= n * 2 * one_pass
    assert r["total_bytes"] <= (n * 3 + 8) * one_pass
    assert r["n_instructions"] >= 1


def test_roofline_physical_integration():
    from skyrim_tpu.utils.roofline import roofline

    out = roofline(
        1e-3, flops=1e9, bytes_=50 * 2**30,
        bytes_floor=0.1 * 2**30, bytes_physical=0.5 * 2**30,
    )
    assert out["bytes_basis"] == "hlo_physical_layout"
    assert "hbm_physical_pct" in out
    # physical replaces the loose cost-model bound in the verdict:
    # 0.5 GiB / (1 ms × 819 GB/s) ≈ 65 % ≥ 50 % → memory
    assert out["bound"] == "memory"


_SLICE_FUSION = """\
HloModule sf

%fused_slices (p0: bf16[4,1000,128]) -> (bf16[1000,128], bf16[1000,128]) {
  %p0 = bf16[4,1000,128]{2,1,0:T(16,128)(2,1)} parameter(0)
  %s0 = bf16[1000,128]{1,0:T(16,128)(2,1)} slice(%p0), slice={[0:1], [0:1000], [0:128]}
  %s1 = bf16[1000,128]{1,0:T(16,128)(2,1)} slice(%p0), slice={[1:2], [0:1000], [0:128]}
  ROOT %t = (bf16[1000,128]{1,0:T(16,128)(2,1)}, bf16[1000,128]{1,0:T(16,128)(2,1)}) tuple(%s0, %s1)
}

%fused_full (p0: bf16[4,1000,128]) -> bf16[4,1000,128] {
  %p0 = bf16[4,1000,128]{2,1,0:T(16,128)(2,1)} parameter(0)
  ROOT %n = bf16[4,1000,128]{2,1,0:T(16,128)(2,1)} negate(%p0)
}

ENTRY %main (a: bf16[4,1000,128]) -> bf16[4,1000,128] {
  %a = bf16[4,1000,128]{2,1,0:T(16,128)(2,1)} parameter(0)
  %f1 = (bf16[1000,128]{1,0:T(16,128)(2,1)}, bf16[1000,128]{1,0:T(16,128)(2,1)}) fusion(%a), kind=kLoop, calls=%fused_slices
  ROOT %f2 = bf16[4,1000,128]{2,1,0:T(16,128)(2,1)} fusion(%a), kind=kLoop, calls=%fused_full
}
"""


def test_fusion_slice_aware_param_reads():
    """A fusion reading two 1-of-4 slices is charged 2 slices, not the
    full operand; a fusion consuming the whole buffer stays full."""
    from skyrim_tpu.utils.hlo_bytes import computation_traffic

    comps = parse_hlo(_SLICE_FUSION)
    entry = next(c for c in comps.values() if c.is_entry)
    rows = []
    computation_traffic(comps, entry, _rows=rows)
    by_name = {name: b for b, _, name, _ in rows}
    buf = 1000 * 128 * 2  # one (1000,128) bf16 slice, padded rows 1000→1008
    slice_buf = 1008 * 128 * 2
    full = 4 * slice_buf
    # f1: result = 2 slices + reads 2 slices (NOT the full 4-slice buffer)
    assert by_name["f1"] == 2 * slice_buf + 2 * slice_buf, (by_name, buf)
    # f2: full read + full write
    assert by_name["f2"] == 2 * full


_TOP_OPS = """\
HloModule t

ENTRY %main (a: bf16[4,1000,128], i: s32[500,1]) -> bf16[500,128] {
  %a = bf16[4,1000,128]{2,1,0:T(16,128)(2,1)} parameter(0)
  %i = s32[500,1]{1,0:T(8,128)} parameter(1)
  %s = bf16[1000,128]{1,0:T(16,128)(2,1)} slice(%a), slice={[2:3], [0:1000], [0:128]}
  ROOT %g = bf16[500,128]{1,0:T(16,128)(2,1)} gather(%s, %i), offset_dims={1}
}
"""


def test_top_level_slice_and_gather_reads():
    from skyrim_tpu.utils.hlo_bytes import computation_traffic

    comps = parse_hlo(_TOP_OPS)
    entry = next(c for c in comps.values() if c.is_entry)
    rows = []
    computation_traffic(comps, entry, _rows=rows)
    by_name = {name: b for b, _, name, _ in rows}
    slice_buf = 1008 * 128 * 2
    g_out = 512 * 128 * 2  # bf16 sublane tile 16: 500 → 512 rows
    idx = 504 * 128 * 4  # s32 index buffer padded to (8,128) tiles
    assert by_name["s"] == 2 * slice_buf  # window only, not the 4x buffer
    # gather: result + ~result rows from source + indices
    assert by_name["g"] == g_out + min(slice_buf, g_out) + idx
