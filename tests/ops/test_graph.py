"""Unit tests for the static-graph machinery (ops/graph.py): block
plans, one-hot aggregation, dst expansion, and the chunk layouts — the
TPU-native replacements for segment_sum scatters (latency-bound) used by
GraphCast's message passing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.ops.graph import (
    block_expand_dst,
    block_onehot,
    block_segment_sum,
    build_block_plan,
    build_graphs,
    chunk_static,
    pad_rows_to_blocks,
)


def _random_sorted_segments(rng, n_seg, mean_deg, empty_frac=0.1):
    deg = rng.poisson(mean_deg, size=n_seg)
    deg[rng.random(n_seg) < empty_frac] = 0  # empty segments allowed
    return np.repeat(np.arange(n_seg), deg), deg


@pytest.mark.parametrize("target_rows", [16, 64, 1024])
def test_block_segment_sum_matches_segment_sum(target_rows):
    rng = np.random.default_rng(0)
    n_seg = 100
    seg, _ = _random_sorted_segments(rng, n_seg, mean_deg=7)
    E = len(seg)
    data = rng.normal(size=(E, 8)).astype(np.float32)

    plan = build_block_plan(seg, n_seg, target_rows=target_rows)
    blocks = pad_rows_to_blocks(data, plan)
    agg = np.asarray(block_segment_sum(jnp.asarray(blocks), plan))
    ref = np.asarray(
        jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(seg), num_segments=n_seg)
    )
    np.testing.assert_allclose(agg, ref, rtol=1e-5, atol=1e-5)


def test_block_plan_segment_larger_than_target():
    # one giant segment must get its own block (M grows to fit it)
    seg = np.concatenate([np.zeros(50, np.int64), np.arange(1, 10).repeat(2)])
    plan = build_block_plan(seg, 10, target_rows=8)
    assert plan["M"] >= 50
    data = np.ones((len(seg), 4), np.float32)
    agg = np.asarray(block_segment_sum(jnp.asarray(pad_rows_to_blocks(data, plan)), plan))
    assert agg[0, 0] == 50.0
    assert (agg[1:, 0] == 2.0).all()


def test_block_expand_dst_matches_gather():
    rng = np.random.default_rng(1)
    n_seg = 60
    seg, _ = _random_sorted_segments(rng, n_seg, mean_deg=5)
    plan = build_block_plan(seg, n_seg, target_rows=32)
    vals = rng.normal(size=(n_seg, 8)).astype(np.float32)
    expanded = np.asarray(block_expand_dst(jnp.asarray(vals), plan))
    # padded block layout → compare against vals[seg] row-for-row
    ref_blocks = pad_rows_to_blocks(vals[seg], plan)
    local = plan["local"]
    valid = local != plan["SB"]
    np.testing.assert_allclose(expanded[valid], ref_blocks[valid], rtol=1e-5)
    # padding rows expand to zero (one-hot hits no segment)
    assert np.abs(expanded[~valid]).max() == 0.0


def test_block_plan_block_multiple_pads_empty_blocks():
    seg = np.repeat(np.arange(10), 3)
    plan = build_block_plan(seg, 10, target_rows=6, block_multiple=4)
    assert len(plan["starts"]) % 4 == 0
    data = np.ones((len(seg), 2), np.float32)
    agg = np.asarray(block_segment_sum(jnp.asarray(pad_rows_to_blocks(data, plan)), plan))
    np.testing.assert_allclose(agg, 3.0)


def test_block_onehot_padding_sentinel():
    seg = np.array([0, 0, 1])
    plan = build_block_plan(seg, 2, target_rows=8)
    oh = np.asarray(block_onehot(plan, jnp.float32))
    assert oh.sum() == 3  # one hit per REAL row, none for padding


def test_chunk_static_layout():
    a = np.arange(10)
    c = chunk_static(a, 3, fill=-1, multiple=2)
    assert c.shape == (3, 4)
    flat = c.reshape(-1)
    np.testing.assert_array_equal(flat[:10], a)
    assert (flat[10:] == -1).all()


def test_m2g_face_alignment():
    """Edges 3g..3g+2 of the dst-sorted m2g table must be exactly
    faces[m2g_face[g]] in vertex order — the face-structured gather in
    models/graphcast.py relies on this."""
    g = build_graphs(19, 36, 2)
    tri = g["faces"][g["m2g_face"]]  # (n_grid, 3)
    np.testing.assert_array_equal(g["m2g_src"].reshape(-1, 3), tri)
    np.testing.assert_array_equal(
        g["m2g_dst"], np.repeat(np.arange(g["n_grid"]), 3)
    )
