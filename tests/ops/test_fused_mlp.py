"""Parity tests for the fused row-MLP kernels and GraphCast's fused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.ops.fused_mlp import (
    fused_finish,
    fused_mlp,
    reference_finish,
    reference_mlp,
)


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32
    )


@pytest.mark.parametrize("use_ln", [True, False])
def test_fused_mlp_parity(use_ln):
    x = _rand((700, 24), 0)
    w1 = (_rand((24, 48), 1, 0.2), _rand((48,), 2, 0.1))
    w2 = (_rand((48, 16), 3, 0.2), _rand((16,), 4, 0.1))
    ln = (_rand((16,), 5), _rand((16,), 6)) if use_ln else None
    out = fused_mlp(x, w1, w2, ln, interpret=True)
    ref = reference_mlp(x, w1, w2, ln)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # grads through the custom VJP
    g = jax.grad(
        lambda x: jnp.sum(fused_mlp(x, w1, w2, ln, interpret=True) ** 2)
    )(x)
    gr = jax.grad(lambda x: jnp.sum(reference_mlp(x, w1, w2, ln) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_fused_mlp_transposed_input():
    x = _rand((24, 700), 0)  # feature-major (Cin, N)
    w1 = (_rand((24, 48), 1, 0.2), _rand((48,), 2, 0.1))
    w2 = (_rand((48, 16), 3, 0.2), _rand((16,), 4, 0.1))
    ln = (_rand((16,), 5), _rand((16,), 6))
    out = fused_mlp(x, w1, w2, ln, x_transposed=True, interpret=True)
    ref = reference_mlp(x, w1, w2, ln, x_transposed=True)
    assert out.shape == (700, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g = jax.grad(
        lambda a: jnp.sum(
            fused_mlp(a, w1, w2, ln, x_transposed=True, interpret=True) ** 2
        )
    )(x)
    gr = jax.grad(
        lambda a: jnp.sum(reference_mlp(a, w1, w2, ln, x_transposed=True) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_fused_mlp_x2_residual_parity():
    x = _rand((516, 24), 0)
    x2 = _rand((516, 16), 7)
    res = _rand((516, 24), 8)
    w1 = (_rand((40, 48), 1, 0.2), _rand((48,), 2, 0.1))
    w2 = (_rand((48, 24), 3, 0.2), _rand((24,), 4, 0.1))
    ln = (_rand((24,), 5), _rand((24,), 6))
    out = fused_mlp(x, w1, w2, ln, x2=x2, residual=res, interpret=True)
    ref = reference_mlp(x, w1, w2, ln, x2=x2, residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g = jax.grad(
        lambda a: jnp.sum(
            fused_mlp(a, w1, w2, ln, x2=x2, residual=res, interpret=True) ** 2
        )
    )(x)
    gr = jax.grad(
        lambda a: jnp.sum(reference_mlp(a, w1, w2, ln, x2=x2, residual=res) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_graph_kernels_parity():
    from skyrim_tpu.ops.graph_kernels import (
        fused_block_messages,
        fused_fixed_degree_messages,
        reference_block_messages,
        reference_fixed_degree_messages,
    )

    L, deg, N = 16, 3, 300
    wide = _rand((N, deg * L), 0)
    bias = _rand((N, deg * L), 1, 0.2)
    ad = _rand((N, L), 2, 0.2)
    b0 = _rand((L,), 3, 0.1)
    wb = (_rand((L, L), 4, 0.2), _rand((L,), 5, 0.1))
    ln = (_rand((L,), 6), _rand((L,), 7))
    out = fused_fixed_degree_messages(
        wide, bias, ad, b0, wb, ln, deg, interpret=True
    )
    ref = reference_fixed_degree_messages(wide, bias, ad, b0, wb, ln, deg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    B, M, SB = 4, 64, 16
    src = _rand((B, M, L), 10)
    bb = _rand((B, M, L), 11, 0.2)
    rng = np.random.default_rng(12)
    local = jnp.asarray(
        np.sort(rng.integers(0, SB + 1, size=(B, M)), axis=-1), jnp.int32
    )
    out = fused_block_messages(src, bb, local, b0, wb, ln, SB, interpret=True)
    ref = reference_block_messages(src, bb, local, b0, wb, ln, SB)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
    )
    # grads flow (local is integer/nondiff)
    g = jax.grad(
        lambda s: jnp.sum(
            fused_block_messages(s, bb, local, b0, wb, ln, SB, True) ** 2
        )
    )(src)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_round_messages_parity():
    """The whole-round processor kernel matches its XLA reference and
    the unfused ProcessorRound composition (expand + edge GEMM + finish
    + residual + one-hot aggregation)."""
    from skyrim_tpu.ops.graph_kernels import (
        fused_round_messages,
        reference_round_messages,
    )

    L, B, M, SB = 16, 4, 64, 16
    edges = _rand((B, M, L), 20)
    gsrc = _rand((B, M, L), 21, 0.3)
    staged = _rand((B, SB, L), 22, 0.3)
    rng = np.random.default_rng(23)
    local = jnp.asarray(
        np.sort(rng.integers(0, SB + 1, size=(B, M)), axis=-1), jnp.int32
    )
    we = _rand((L, L), 24, 0.2)
    b0 = _rand((L,), 25, 0.1)
    wb = (_rand((L, L), 26, 0.2), _rand((L,), 27, 0.1))
    ln = (_rand((L,), 28), _rand((L,), 29))
    ne, agg = fused_round_messages(
        edges, gsrc, staged, local, we, b0, wb, ln, SB, interpret=True
    )
    ne_r, agg_r = reference_round_messages(
        edges, gsrc, staged, local, we, b0, wb, ln, SB
    )
    np.testing.assert_allclose(np.asarray(ne), np.asarray(ne_r), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(agg), np.asarray(agg_r), atol=3e-5, rtol=1e-4
    )
    # padding rows (local == SB) never aggregate
    pad_share = float((np.asarray(local) == SB).mean())
    assert pad_share > 0  # the random plan must actually exercise padding
    # grads flow through the custom VJP (local is integer/nondiff)
    g = jax.grad(
        lambda e, s: jnp.sum(
            jnp.stack(
                [
                    x.sum()
                    for x in fused_round_messages(
                        e, s, staged, local, we, b0, wb, ln, SB, True
                    )
                ]
            )
        )
    )(edges, gsrc)
    assert np.isfinite(np.asarray(g)).all()


def test_fuxi_fused_matches_xla(monkeypatch):
    """FuXi whole-net: patch-GEMM embed/head + fused blocks vs the
    conv/XLA path (identical param tree)."""
    from skyrim_tpu.models.fuxi import FuXiConfig, FuXiModel

    cfg = FuXiConfig(lat=49, lon=96, in_channels=5, embed_dim=16,
                     depth=2, num_heads=2, attn_v2=False)

    def run(use_fused):
        import skyrim_tpu.ops.flash_window_attention as fwa

        monkeypatch.setattr(fwa, "use_pallas", lambda: use_fused)
        model = FuXiModel(cfg)
        params = model.init_params(jax.random.key(0))
        x = np.random.default_rng(0).normal(size=(2, 5, 49, 96)).astype(
            np.float32
        )
        return params, np.asarray(model.apply(params, x))

    p_ref, ref = run(False)
    p_fused, out = run(True)
    for (k, v), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_fused),
    ):
        assert jax.tree_util.keystr(k) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.05)


def test_fengwu_fused_matches_xla(monkeypatch):
    """FengWu whole-net: block-diagonal grand encoder GEMM + grand
    decoder GEMM + fused blocks vs the conv/XLA path."""
    from skyrim_tpu.models.fengwu import FengWuConfig, FengWuModel

    cfg = FengWuConfig(
        lat=49, lon=96, levels=3, surface_channels=2, level_vars=2,
        modal_dim=8, fuser_dim=24, depth=2, num_heads=2,
    )

    def run(use_fused):
        import skyrim_tpu.ops.flash_window_attention as fwa

        monkeypatch.setattr(fwa, "use_pallas", lambda: use_fused)
        model = FengWuModel(cfg)
        params = model.init_params(jax.random.key(0))
        nc = cfg.in_channels
        x = np.random.default_rng(0).normal(size=(2, nc, 49, 96)).astype(
            np.float32
        )
        return params, np.asarray(model.apply(params, x))

    p_ref, ref = run(False)
    p_fused, out = run(True)
    for (k, v), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_fused),
    ):
        assert jax.tree_util.keystr(k) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.05)


def test_fused_finish_parity():
    x = _rand((516, 32), 0)
    b0 = _rand((32,), 1, 0.1)
    wb = (_rand((32, 32), 2, 0.2), _rand((32,), 3, 0.1))
    ln = (_rand((32,), 4), _rand((32,), 5))
    out = fused_finish(x, b0, wb, ln, interpret=True)
    ref = reference_finish(x, b0, wb, ln)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_graphcast_fused_matches_xla(monkeypatch):
    """Whole-model parity: MLPs, finish, and the slot-major m2g through
    the fused kernels vs the pure-XLA path (params tree identical)."""
    from skyrim_tpu.models.graphcast import GraphCastConfig, GraphCastModel

    cfg = GraphCastConfig(
        lat=19, lon=36, in_channels=4, latent=16, processor_rounds=2,
        mesh_refinements=2, edge_chunks=2,
    )

    def run(use_fused):
        import skyrim_tpu.ops.flash_window_attention as fwa

        monkeypatch.setattr(fwa, "use_pallas", lambda: use_fused)
        model = GraphCastModel(cfg)
        params = model.init_params(jax.random.key(0))
        x = np.random.default_rng(0).normal(
            size=(2, 4, 19, 36)
        ).astype(np.float32)
        return params, np.asarray(model.apply(params, x))

    p_ref, ref = run(False)
    p_fused, out = run(True)
    # true params must be bit-identical; "cache" is DERIVED from them
    # (prepare_params) and may differ in final-ulp rounding between paths
    for (k, v), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(
            {k: v for k, v in p_ref.items() if k != "cache"}
        ),
        jax.tree_util.tree_leaves_with_path(
            {k: v for k, v in p_fused.items() if k != "cache"}
        ),
    ):
        assert jax.tree_util.keystr(k) == jax.tree_util.keystr(k2)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=0.05)


def _finish_ref(h, b0, wb, ln):
    dt = h.dtype
    h = h + b0.astype(dt)
    hf = h.astype(jnp.float32)
    h = (hf * jax.lax.logistic(hf)).astype(dt)
    y = h @ wb[0].astype(dt) + wb[1].astype(dt)
    from skyrim_tpu.ops.fused_block import _layernorm_f32

    return _layernorm_f32(
        y, ln[0].reshape(1, -1), ln[1].reshape(1, -1)
    ).astype(dt)


def test_fused_g2m_tiled_matches_naive_per_edge():
    """Grid-major tiled encoder vs a naive per-edge loop: slot tables,
    U sentinel, per-tile one-hot aggregation, and the cross-tile
    combine gather + segment sum — including partial/empty slots."""
    from skyrim_tpu.ops.graph import build_g2m_tiles
    from skyrim_tpu.ops.graph_kernels import fused_g2m_tiled

    rng = np.random.default_rng(0)
    H, W, L, n_mesh = 12, 20, 16, 9
    n_grid = H * W
    # random sparse edges, out-degree 0..3
    src, dst = [], []
    for p in range(n_grid):
        for d in rng.choice(n_mesh, size=rng.integers(0, 4), replace=False):
            src.append(p)
            dst.append(int(d))
    src = np.asarray(src)
    dst = np.asarray(dst)
    efeat = rng.normal(size=(len(src), 4)).astype(np.float32)
    gt = build_g2m_tiles(src, dst, efeat, H, W, n_mesh)

    asrc = rng.normal(size=(H, W, L)).astype(np.float32)
    # per-(point, slot) bias in the builder's slot order
    bias_hw = rng.normal(size=(H, W, gt["D"] * L)).astype(np.float32) * 0.3
    b0 = rng.normal(size=(L,)).astype(np.float32) * 0.1
    wb = (rng.normal(size=(L, L)).astype(np.float32) * 0.2,
          rng.normal(size=(L,)).astype(np.float32) * 0.1)
    ln = (rng.normal(size=(L,)).astype(np.float32),
          rng.normal(size=(L,)).astype(np.float32))

    partials = fused_g2m_tiled(
        jnp.asarray(asrc), jnp.asarray(bias_hw), jnp.asarray(gt["local"]),
        jnp.asarray(b0), tuple(map(jnp.asarray, wb)),
        tuple(map(jnp.asarray, ln)),
        gt["D"], gt["U"], gt["th"], gt["tw"], interpret=True,
    )
    vals = np.asarray(partials).reshape(-1, L)[gt["combine_idx"]]
    agg = np.zeros((n_mesh, L), np.float32)
    np.add.at(agg, gt["combine_seg"], vals)

    # naive: walk the builder's own slot tables per (point, slot)
    ref = np.zeros((n_mesh, L), np.float32)
    sd = np.asarray(gt["slot_dst"]).reshape(n_grid, gt["D"])
    th, tw = gt["th"], gt["tw"]
    TH, TW = H // th, W // tw
    loc = np.asarray(gt["local"])  # (TH, TW, D, th*tw)
    for p in range(n_grid):
        i, j = divmod(p, W)
        ti, tj = i // th, j // tw
        r = (i % th) * tw + (j % tw)
        for k in range(gt["D"]):
            if loc[ti, tj, k, r] == gt["U"]:
                continue  # empty slot
            h = asrc[i, j] + bias_hw[i, j, k * L : (k + 1) * L]
            m = np.asarray(_finish_ref(
                jnp.asarray(h[None]), jnp.asarray(b0),
                tuple(map(jnp.asarray, wb)), tuple(map(jnp.asarray, ln)),
            ))[0]
            ref[sd[p, k]] += m
    np.testing.assert_allclose(agg, ref, atol=2e-4, rtol=1e-3)


def test_fused_m2g_tiled_matches_naive():
    """Tiled decoder (unique-face one-hot expansion) vs a naive
    per-point loop over the face tables — including partial tiles
    (H, W not multiples of the tile shape)."""
    from skyrim_tpu.ops.graph import build_face_tiles
    from skyrim_tpu.ops.graph_kernels import fused_m2g_tiled

    rng = np.random.default_rng(1)
    H, W, L, n_faces, deg = 11, 18, 16, 7, 3
    face_hw = rng.integers(0, n_faces, size=(H, W)).astype(np.int32)
    ft = build_face_tiles(face_hw, th=4, tw=8)

    wide_faces = rng.normal(size=(n_faces, deg * L)).astype(np.float32)
    uniq = wide_faces[ft["tile_faces"]]
    bias_hw = rng.normal(size=(H, W, deg * L)).astype(np.float32) * 0.3
    ad_hw = rng.normal(size=(H, W, L)).astype(np.float32) * 0.3
    b0 = rng.normal(size=(L,)).astype(np.float32) * 0.1
    wb = (rng.normal(size=(L, L)).astype(np.float32) * 0.2,
          rng.normal(size=(L,)).astype(np.float32) * 0.1)
    ln = (rng.normal(size=(L,)).astype(np.float32),
          rng.normal(size=(L,)).astype(np.float32))

    out = np.asarray(fused_m2g_tiled(
        jnp.asarray(uniq), jnp.asarray(ft["tile_local"]),
        jnp.asarray(bias_hw), jnp.asarray(ad_hw), jnp.asarray(b0),
        tuple(map(jnp.asarray, wb)), tuple(map(jnp.asarray, ln)),
        deg, ft["th"], ft["tw"], interpret=True,
    ))
    for p in rng.choice(H * W, size=24, replace=False):
        i, j = divmod(int(p), W)
        acc = np.zeros(L, np.float32)
        for k in range(deg):
            h = (wide_faces[face_hw[i, j], k * L : (k + 1) * L]
                 + bias_hw[i, j, k * L : (k + 1) * L] + ad_hw[i, j])
            acc += np.asarray(_finish_ref(
                jnp.asarray(h[None]), jnp.asarray(b0),
                tuple(map(jnp.asarray, wb)), tuple(map(jnp.asarray, ln)),
            ))[0]
        np.testing.assert_allclose(out[i, j], acc, atol=2e-4, rtol=1e-3,
                                   err_msg=f"point ({i},{j})")
