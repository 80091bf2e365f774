"""GraphCast — icosahedral multimesh GNN, TPU-native.

Re-implements the JAX/Haiku GraphCast the reference wraps via
``earth2mip.networks.graphcast`` (reference
skyrim/core/models/graphcast.py:51-54): 83-channel contract
(graphcast.py:17-26), 2-frame stateful input with an rng in the rollout
state (graphcast.py:110-120), encoder → 16 processor rounds on the
multimesh → decoder, residual output.

TPU mapping: all graph indices are static tables (ops/graph.py); message
aggregation is sorted ``segment_sum`` (efficient XLA scatter) for the
variable-degree grid→mesh encoder and a scatter-free reshape-sum for the
fixed-degree-3 mesh→grid decoder; the multi-million-edge MLPs are
chunk-scanned to bound activation memory; node/edge MLPs are big dense
matmuls on the MXU.

Performance structure: every concat-Dense first layer is factored into
per-part matmuls so (a) the static edge-geometry embeddings — identical
every step — are computed ONCE per parameter set into ``params["cache"]``
(excluded from checkpoints, rebuilt by ``prepare_params``), and (b) the
src/dst node transforms run per-NODE then gather, instead of per-edge:
the mesh→grid pass has 3.1M edges but only 41k mesh sources, a 75×
reduction on that matmul.  The factoring is math-equivalent and
param-tree-identical to the naive concat form (``SplitDense`` declares
the same ``Dense_0`` kernel an ``nn.Dense`` over the concat would).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from skyrim_tpu import channels as ch
from skyrim_tpu.grid import LatLonGrid
from skyrim_tpu.models.base import (
    PrognosticModel,
    denormalize,
    make_norm_params,
    normalize,
)
from skyrim_tpu.ops.graph import (
    build_block_plan,
    build_graphs,
    chunk_static,
    pad_rows_to_blocks,
)


@dataclasses.dataclass(frozen=True)
class GraphCastConfig:
    lat: int = 721
    lon: int = 1440
    in_channels: int = 83
    latent: int = 512
    processor_rounds: int = 16
    mesh_refinements: int = 6
    edge_chunks: int = 4  # scan chunks for grid2mesh/mesh2grid MLPs


class MLP(nn.Module):
    out: int
    hidden: int
    final_norm: bool = True

    @nn.compact
    def __call__(self, x, x2=None, residual=None, x_transposed=False):
        """x2 feeds the tail of the first layer (≡ concat([x, x2]));
        residual is added to the output — both exist so the fused
        kernel can absorb them (Pallas calls are XLA fusion barriers:
        a concat/add left outside costs a full HBM pass).
        ``x_transposed``: x arrives feature-major (Cin, N) and the first
        GEMM contracts the leading dim (no relayout)."""
        from skyrim_tpu.ops.flash_window_attention import use_pallas

        feat_ax = 0 if x_transposed else -1
        in_feat = x.shape[feat_ax] + (x2.shape[-1] if x2 is not None else 0)
        if use_pallas() and x.ndim == 2 and not self.is_initializing():
            # one HBM pass over the rows (ops/fused_mlp.py); param
            # holders fetch the exact nn.Dense/LayerNorm tree
            from skyrim_tpu.ops.fused_block import DenseParams, LNParams
            from skyrim_tpu.ops.fused_mlp import fused_mlp

            w1 = DenseParams(self.hidden, name="Dense_0")(in_feat)
            w2 = DenseParams(self.out, name="Dense_1")(self.hidden)
            ln = (
                LNParams(name="LayerNorm_0")(self.out)
                if self.final_norm else None
            )
            return fused_mlp(x, w1, w2, ln, x2=x2, residual=residual,
                             x_transposed=x_transposed)

        if x_transposed:
            x = x.T
        if x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        h = nn.Dense(self.hidden, dtype=x.dtype)(x)
        h = nn.swish(h)
        h = nn.Dense(self.out, dtype=x.dtype)(h)
        if self.final_norm:
            h = nn.LayerNorm(dtype=x.dtype)(h)
        if residual is not None:
            h = residual + h
        return h


class SplitDense(nn.Module):
    """Param-compatible with ``nn.Dense(features)`` applied to a concat
    of ``in_dim`` inputs, but applied one kernel row-block at a time —
    the factoring that lets static blocks be cached and node blocks run
    per-node (docstring at module top)."""

    features: int
    in_dim: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
        )
        self.bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))

    def block(self, x: jax.Array, lo: int, hi: int) -> jax.Array:
        """x @ kernel[lo:hi] — one concat-part's contribution, no bias."""
        return x @ jax.lax.slice_in_dim(self.kernel, lo, hi, axis=0).astype(x.dtype)

    def __call__(self, x):  # full concat application (reference semantics)
        return self.block(x, 0, self.in_dim) + self.bias.astype(x.dtype)


class FactoredEdgeMLP(nn.Module):
    """Math-equivalent to ``MLP(L, L)`` over ``concat([e, src, dst])``
    with the first layer split per part.  Param tree matches MLP's
    (Dense_0 / Dense_1 / LayerNorm_0)."""

    latent: int
    dtype: object = jnp.bfloat16

    def setup(self):
        L = self.latent
        self.Dense_0 = SplitDense(L, 3 * L)
        self.Dense_1 = nn.Dense(L, dtype=self.dtype)
        self.LayerNorm_0 = nn.LayerNorm(dtype=self.dtype)

    def edge_part(self, e):
        return self.Dense_0.block(e, 0, self.latent)

    def src_part(self, s):
        return self.Dense_0.block(s, self.latent, 2 * self.latent)

    def dst_part(self, d):
        return self.Dense_0.block(d, 2 * self.latent, 3 * self.latent)

    def finish(self, h_pre):
        """swish(Σ parts + b₀) → Dense₁ → LayerNorm, parts pre-summed in f32."""
        h = h_pre + self.Dense_0.bias.astype(h_pre.dtype)
        h = nn.swish(h).astype(self.dtype)
        return self.LayerNorm_0(self.Dense_1(h))

    def finish_params(self):
        """(b₀, (Dense₁ kernel, bias), (LN scale, bias)) for the fused
        message kernels (ops/graph_kernels.py) — bound-param access,
        valid outside init."""
        p1 = self.Dense_1.variables["params"]
        pln = self.LayerNorm_0.variables["params"]
        return (
            self.Dense_0.bias,
            (p1["kernel"], p1["bias"]),
            (pln["scale"], pln["bias"]),
        )


class BipartitePass(nn.Module):
    """One src→dst message pass over a static bipartite edge set.

    All index tables arrive PRE-CHUNKED in scan layout (ops/graph
    chunk_static) and the static edge bias comes pre-chunked from the
    params cache, so the per-step XLA program contains no multi-GB
    pad/reshape staging — per-edge work inside the chunk scan is just
    two gathers + the factored finish (Dense₁ + LayerNorm); the (E, L)
    tensors never hit HBM whole.
    """

    latent: int
    n_dst: int
    #: static tables.  Fixed-degree mode (mesh→grid): efeat_c/src_c/dst_c
    #: pre-chunked (nc, ch[, ...]) scan-layout arrays.  Plan mode
    #: (grid→mesh): a ops/graph block plan dict with src_blocks /
    #: dst_blocks / efeat_blocks in (B, M[, ...]) layout — aggregation
    #: runs as batched one-hot matmuls on the MXU, no scatter.
    tables: dict
    dtype: object = jnp.bfloat16
    degree: int | None = None  # fixed in-degree (mesh→grid: 3) → no scatter
    #: dst features are step-invariant (g2m: the cached mesh embedding) —
    #: their first-layer transform is folded into the cached edge bias,
    #: removing a per-step 1.6M-row gather (gathers are latency-bound on
    #: TPU, ~9 µs per 1k rows measured)
    static_dst: bool = False
    #: scan group count over plan blocks (bounds live activation memory)
    groups: int = 4

    def setup(self):
        L = self.latent
        self.edge_embed = MLP(L, L)
        self.message = FactoredEdgeMLP(L, self.dtype)
        self.MLP_0 = MLP(L, L)  # dst node update

    def edge_bias_chunks(self, dst_feat=None) -> jax.Array:
        """Static per-edge first-layer contribution in the mode's layout
        ((nc, ch, L) scan chunks or (B, M, L) plan blocks) —
        step-invariant, cached across steps via params["cache"].  When
        ``static_dst``, the dst-side transform is folded in here too."""
        if "plan" in self.tables:
            from skyrim_tpu.ops.flash_window_attention import use_pallas

            gt = self.tables.get("g2m_tiles")
            if gt is not None and use_pallas():
                # grid-major slot layout (H, W, D·L) for the tiled
                # kernel: per-(point, slot) static edge embedding with
                # the dst mesh-embed transform folded in
                D = gt["D"]
                H, W = gt["slot_dst"].shape[:2]
                L = self.latent
                ef = jnp.asarray(gt["slot_ef"], self.dtype)
                n_rows = H * W * D
                a_dst = self.message.dst_part(dst_feat)
                di = jnp.asarray(gt["slot_dst"]).reshape(-1)
                G = self.groups
                chunk = -(-n_rows // G)
                ef_p = jnp.pad(
                    ef.reshape(n_rows, -1),
                    ((0, G * chunk - n_rows), (0, 0)),
                )
                bias = jax.lax.map(
                    lambda e: self.message.edge_part(self.edge_embed(e)),
                    ef_p.reshape(G, chunk, -1),
                ).reshape(G * chunk, L)[:n_rows]
                bias = bias + a_dst[di]
                return bias.reshape(H, W, D * L)
            plan = self.tables["plan"]
            G = self.groups
            B, M = plan["src_blocks"].shape
            ef = jnp.asarray(plan["efeat_blocks"], self.dtype)
            di = jnp.asarray(plan["dst_blocks"])
            a_dst = (
                self.message.dst_part(dst_feat)
                if self.static_dst and dst_feat is not None
                else None
            )

            def fn(args):
                e, d = args
                b = self.message.edge_part(self.edge_embed(e))
                return b + a_dst[d] if a_dst is not None else b

            out = jax.lax.map(
                fn, (ef.reshape(G, B // G, M, -1), di.reshape(G, B // G, M))
            )
            return out.reshape(B, M, -1)

        ef_c = jnp.asarray(self.tables["efeat_c"], self.dtype)
        out = jax.lax.map(
            lambda e: self.message.edge_part(self.edge_embed(e)), ef_c
        )
        if self.degree is not None:
            # fixed-degree consumers run SLOT-MAJOR on (dst, deg·L) lane
            # slices — store the cache wide so the per-step program never
            # re-lays the multi-GB bias (a (nc, ch, L)→(nc, dst, deg·L)
            # reshape in-step duplicated the 3.2 GB m2g cache and OOM'd
            # the chip)
            nc, chk, L = out.shape
            out = out.reshape(nc, chk // self.degree, self.degree * L)
        return out

    def __call__(self, src_feat, dst_feat, bias_chunks=None):
        from skyrim_tpu.ops.flash_window_attention import use_pallas

        L = self.latent
        if self.is_initializing():
            # create all params without touching the big edge tables
            z = jnp.zeros((1, L), src_feat.dtype)
            self.edge_embed(jnp.zeros((1, 4), src_feat.dtype))
            self.message.finish(
                self.message.edge_part(z)
                + self.message.src_part(z)
                + self.message.dst_part(z)
            )
            agg = jnp.zeros((self.n_dst, L), src_feat.dtype)
            return self.MLP_0(dst_feat, x2=agg, residual=dst_feat)

        if bias_chunks is None:  # opt-out / external-params path
            bias_chunks = self.edge_bias_chunks(
                dst_feat if self.static_dst else None
            )
        fused = use_pallas()
        a_src = self.message.src_part(src_feat)

        if self.degree is not None:
            # dst ids are repeat(arange(n_dst), degree): the dst-side
            # transform broadcasts — a reshape, not a gather
            src_c = jnp.asarray(self.tables["src_c"])
            a_dst = self.message.dst_part(dst_feat)

            face_c = self.tables.get("face_c")
            ft = self.tables.get("face_tiles")
            if face_c is not None and fused and ft is not None:
                # 2D-tiled, ONE pallas call: each (th, tw) spatial tile
                # touches few distinct faces (≤189 at 0.25°), so the
                # kernel expands per-point face latents from a small
                # per-tile unique-row table with a one-hot MXU matmul —
                # replacing a 3.2 GB row-gather that ran at gather
                # latency (28.5 ms measured, round 5).  Whole-buffer
                # reshapes of the cache are bitcasts; the earlier
                # per-chunk loop fed SLICES to the custom-calls, which
                # XLA materialized as ~8 GB/step of copies.
                deg = self.degree
                a_src_faces = a_src[jnp.asarray(self.tables["faces"])]
                a_src_faces = a_src_faces.reshape(-1, deg * L)
                from skyrim_tpu.ops.graph_kernels import fused_m2g_tiled

                b0, wb, lnp = self.message.finish_params()
                uniq = a_src_faces[jnp.asarray(ft["tile_faces"])]
                H, W = ft["tile_local"].shape
                bias_hw = bias_chunks.reshape(-1, deg * L)[
                    : self.n_dst
                ].reshape(H, W, deg * L)
                agg = fused_m2g_tiled(
                    uniq, jnp.asarray(ft["tile_local"]), bias_hw,
                    a_dst.reshape(H, W, L), b0, wb, lnp, deg,
                    ft["th"], ft["tw"],
                ).reshape(self.n_dst, L)
                return self.MLP_0(dst_feat, x2=agg, residual=dst_feat)
            nc, ch = src_c.shape
            dst_chunk = ch // self.degree
            n_rows = nc * dst_chunk
            if n_rows != a_dst.shape[0]:
                a_dst = jnp.pad(a_dst, ((0, n_rows - a_dst.shape[0]), (0, 0)))
            a_dst_c = a_dst.reshape(nc, dst_chunk, L)
            if face_c is not None:
                # face-structured src: stage per-face vertex latents
                # (n_faces, degree·L) WIDE once, then ONE wide-row gather
                # per dst — gathers are per-row latency-bound, so 1 row
                # of degree·L beats degree rows of L.  All per-edge math
                # runs SLOT-MAJOR on flat (dst_chunk, L) lane slices: an
                # (N, degree, L) middle dim would tile as T(4,128) and
                # cost ~50 ms/step in relayouts + half-rate VPU passes
                # (measured with utils/op_stats).
                deg = self.degree
                a_src_faces = a_src[jnp.asarray(self.tables["faces"])]
                a_src_faces = a_src_faces.reshape(-1, deg * L)

                def body(_, xs):
                    b, f_c, ad_c = xs  # b WIDE: (dst_chunk, deg·L)
                    wide = a_src_faces[f_c]  # (dst_chunk, deg·L)
                    agg = None
                    for k in range(deg):
                        h = wide[:, k * L : (k + 1) * L]
                        h = h + b[:, k * L : (k + 1) * L] + ad_c
                        m = self.message.finish(h)
                        agg = m if agg is None else agg + m
                    return None, agg

                _, ys = jax.lax.scan(
                    body, None,
                    (bias_chunks, jnp.asarray(face_c), a_dst_c),
                )
            else:
                deg = self.degree

                def body(_, xs):
                    b, si_c, ad_c = xs  # b WIDE: (dst_chunk, deg·L)
                    si = si_c.reshape(dst_chunk, deg)
                    agg = None
                    for k in range(deg):
                        h = a_src[si[:, k]] + b[:, k * L : (k + 1) * L] + ad_c
                        m = self.message.finish(h)
                        agg = m if agg is None else agg + m
                    return None, agg

                _, ys = jax.lax.scan(body, None, (bias_chunks, src_c, a_dst_c))
            agg = ys.reshape(n_rows, L)[: self.n_dst]
        else:
            # plan mode (grid→mesh): per block-group, compute messages
            # and aggregate via a one-hot matmul — no scatter
            gt = self.tables.get("g2m_tiles")
            if fused and gt is not None:
                # grid-major 2D tiles: the src side is CONTIGUOUS (each
                # grid point's own latent row, out-degree ≤ 3), so the
                # 1.7 GB per-edge source gather of the dst-sorted plan
                # (23.7 ms at v5e gather rates, round 5) disappears;
                # a tile sends to ≤125 distinct mesh nodes, aggregated
                # in-kernel by one-hot matmuls, then combined across
                # tiles with a small static gather + sorted segment sum
                from skyrim_tpu.ops.graph_kernels import fused_g2m_tiled

                b0, wb, lnp = self.message.finish_params()
                H, W = gt["slot_dst"].shape[:2]
                if bias_chunks.shape != (H, W, gt["D"] * L):
                    # the g2m bias layout is MODE-dependent (tiled
                    # (H, W, D·L) vs plan (B, M, L)); a cache built
                    # under the other mode must fail fast, not as an
                    # opaque pallas shape error
                    raise ValueError(
                        f"g2m bias cache layout {bias_chunks.shape} does "
                        f"not match the tiled path's ({H}, {W}, "
                        f"{gt['D'] * L}) — the cache was built under a "
                        "different kernel mode; rebuild via "
                        "prepare_params in the serving mode"
                    )
                partials = fused_g2m_tiled(
                    a_src.reshape(H, W, L), bias_chunks,
                    jnp.asarray(gt["local"]), b0, wb, lnp,
                    gt["D"], gt["U"], gt["th"], gt["tw"],
                )
                vals = partials.reshape(-1, L)[
                    jnp.asarray(gt["combine_idx"])
                ]
                agg = jax.ops.segment_sum(
                    vals, jnp.asarray(gt["combine_seg"]),
                    num_segments=self.n_dst, indices_are_sorted=True,
                )
                return self.MLP_0(dst_feat, x2=agg, residual=dst_feat)
            # XLA chunk-scan fallback (CPU parity / fp32 stability leg;
            # the fused path above is tile-based — the earlier
            # whole-plan fused_block_messages branch was unreachable
            # once tiles became unconditional and was removed)
            plan = self.tables["plan"]
            G = self.groups
            B, M = plan["src_blocks"].shape
            grp = B // G
            SB = plan["SB"]
            local = jnp.asarray(plan["local"])
            src_b = jnp.asarray(plan["src_blocks"])
            if bias_chunks.shape != (B, M, L):
                raise ValueError(
                    f"g2m bias cache layout {bias_chunks.shape} does not "
                    f"match the plan path's ({B}, {M}, {L}) — the cache "
                    "was built under a different kernel mode; rebuild "
                    "via prepare_params in the serving mode"
                )
            iota = jnp.arange(SB, dtype=local.dtype)

            def body(_, xs):
                b_g, s_g, l_g = xs  # (grp, M, L), (grp, M), (grp, M)
                msg = self.message.finish(a_src[s_g] + b_g)
                oh = (l_g[:, None, :] == iota[None, :, None]).astype(
                    msg.dtype
                )
                return None, jnp.einsum("bsm,bmd->bsd", oh, msg)

            _, ys = jax.lax.scan(
                body,
                None,
                (
                    bias_chunks.reshape(G, grp, M, L),
                    src_b.reshape(G, grp, M),
                    local.reshape(G, grp, M),
                ),
            )
            agg = ys.reshape(B * SB, L)[jnp.asarray(plan["unpack"])]
        return self.MLP_0(dst_feat, x2=agg, residual=dst_feat)


class ProcessorRound(nn.Module):
    """One round of message passing on the multimesh (residual).

    Runs entirely in the padded block layout of ops/graph.build_block_plan
    — edges (B, M, L), dst-sorted and segment-aligned — so the dst-side
    expansion and the aggregation are batched one-hot matmuls on the MXU
    instead of latency-bound gathers/scatters.  Padding rows carry
    garbage but hit no one-hot column, so they never aggregate.  The edge
    MLP's first layer is factored: node transforms run over the 41k mesh
    nodes, not the 327k edges.
    """

    latent: int
    n_mesh: int
    plan: dict  # static block plan (+ "src_blocks" (B, M) int32)
    dtype: object = jnp.bfloat16

    def setup(self):
        self.MLP_0 = FactoredEdgeMLP(self.latent, self.dtype)  # edge update
        self.MLP_1 = MLP(self.latent, self.latent)  # node update

    def __call__(self, nodes, edges, onehot):
        from skyrim_tpu.ops.flash_window_attention import use_pallas
        from skyrim_tpu.ops.graph import block_expand_dst, block_segment_sum

        src_b = jnp.asarray(self.plan["src_blocks"])  # (B, M)
        a_src = self.MLP_0.src_part(nodes)
        if use_pallas() and not self.is_initializing():
            # whole round in one HBM pass (ops/graph_kernels): the
            # expansion, edge GEMM, finish MLP, residual, and one-hot
            # aggregation never materialize (B, M, L) intermediates
            from skyrim_tpu.ops.graph_kernels import fused_round_messages

            SB = self.plan["SB"]
            seg_lo = jnp.asarray(self.plan["seg_lo"])  # (B,)
            idx = jnp.clip(
                seg_lo[:, None] + jnp.arange(SB)[None, :],
                0, self.plan["n_seg"] - 1,
            )
            staged = self.MLP_0.dst_part(nodes)[idx]  # (B, SB, L)
            kernel = self.MLP_0.Dense_0.kernel
            we = jax.lax.slice_in_dim(kernel, 0, self.latent, axis=0)
            b0, wb, lnp = self.MLP_0.finish_params()
            new_edges, agg_b = fused_round_messages(
                edges, a_src[src_b], staged,
                jnp.asarray(self.plan["local"]), we, b0, wb, lnp, SB,
            )
            agg = agg_b.reshape(-1, self.latent)[
                jnp.asarray(self.plan["unpack"])
            ]
        else:
            a_dst = block_expand_dst(
                self.MLP_0.dst_part(nodes), self.plan, onehot
            )
            h = self.MLP_0.edge_part(edges) + a_src[src_b] + a_dst
            new_edges = edges + self.MLP_0.finish(h)
            agg = block_segment_sum(new_edges, self.plan, onehot)
        new_nodes = self.MLP_1(nodes, x2=agg, residual=nodes)
        return new_nodes, new_edges


class GraphCastNet(nn.Module):
    cfg: GraphCastConfig
    graphs: dict  # static numpy tables
    dtype: object = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        g = self.graphs
        L = cfg.latent
        ec = cfg.edge_chunks
        self.embed_grid = MLP(L, L)
        self.embed_mesh = MLP(L, L)
        self.embed_mm = MLP(L, L)
        g2m_plan = build_block_plan(
            g["g2m_dst"], g["n_mesh"], target_rows=8192, block_multiple=ec
        )
        g2m_plan["src_blocks"] = pad_rows_to_blocks(g["g2m_src"], g2m_plan)
        g2m_plan["dst_blocks"] = pad_rows_to_blocks(g["g2m_dst"], g2m_plan)
        g2m_plan["efeat_blocks"] = pad_rows_to_blocks(g["g2m_efeat"], g2m_plan)
        from skyrim_tpu.ops.graph import build_g2m_tiles

        g2m_tables = {
            "plan": g2m_plan,
            "g2m_tiles": build_g2m_tiles(
                g["g2m_src"], g["g2m_dst"], g["g2m_efeat"],
                cfg.lat, cfg.lon, g["n_mesh"],
            ),
        }
        m2g_tables = {
            "efeat_c": chunk_static(g["m2g_efeat"], ec, multiple=3),
            "src_c": chunk_static(g["m2g_src"], ec, multiple=3),
            "dst_c": chunk_static(g["m2g_dst"], ec, multiple=3),
            "faces": g["faces"],
        }
        # face ids chunked to EXACTLY src_c's dst blocking (ch // 3 per
        # chunk) so the 3 src rows per grid point come from one
        # 3L-wide face-row gather instead of three L-wide edge gathers
        dst_chunk = m2g_tables["src_c"].shape[1] // 3
        face_pad = np.pad(
            g["m2g_face"], (0, ec * dst_chunk - g["n_grid"])
        )
        m2g_tables["face_c"] = face_pad.reshape(ec, dst_chunk)
        from skyrim_tpu.ops.graph import build_face_tiles

        m2g_tables["face_tiles"] = build_face_tiles(
            g["m2g_face"].reshape(cfg.lat, cfg.lon),
            th=min(8, cfg.lat), tw=min(128, cfg.lon),
        )
        self.g2m = BipartitePass(
            L, g["n_mesh"], g2m_tables, self.dtype, static_dst=True, groups=ec
        )
        self.m2g = BipartitePass(
            L, g["n_grid"], m2g_tables, self.dtype, degree=3
        )
        mesh_plan = build_block_plan(g["mesh_dst"], g["n_mesh"], target_rows=1024)
        mesh_plan["src_blocks"] = pad_rows_to_blocks(g["mesh_src"], mesh_plan)
        mesh_plan["efeat_blocks"] = pad_rows_to_blocks(g["mesh_efeat"], mesh_plan)
        self.mesh_plan = mesh_plan
        for i in range(cfg.processor_rounds):
            setattr(
                self, f"round_{i}",
                ProcessorRound(L, g["n_mesh"], mesh_plan, self.dtype),
            )
        self.grid_update = MLP(L, L)
        self.head = MLP(cfg.in_channels, L, final_norm=False)

    def cache_tables(self) -> dict:
        """Step-invariant tensors — functions of params + static geometry
        only.  Built once per parameter set (``prepare_params``); the
        edge biases come out pre-chunked in scan layout."""
        g = self.graphs
        dt = self.dtype
        mesh_embed = self.embed_mesh(jnp.asarray(g["mesh_nfeat"], dt))
        return {
            "mesh_embed": mesh_embed,
            # multimesh edge latents live in the processor's padded block
            # layout (B, M, L) from the start
            "mm_edge": self.embed_mm(
                jnp.asarray(self.mesh_plan["efeat_blocks"], dt)
            ),
            "g2m_bias": self.g2m.edge_bias_chunks(mesh_embed),
            "m2g_bias": self.m2g.edge_bias_chunks(),
        }

    def __call__(self, grid_in, cache: dict | None = None):
        # grid_in feature-major (F_in, n_grid) → (n_grid, C_out)
        cfg = self.cfg
        g = self.graphs
        if cache is None and not self.is_initializing():
            cache = self.cache_tables()
        cache = cache or {}
        dt = self.dtype

        grid_lat = self.embed_grid(grid_in, x_transposed=True)
        # node/edge latents flow through the residual rounds, so they
        # must run at the COMPUTE dtype even when the cache was built at
        # another precision (the fp32 stability leg shares the bf16
        # cache — static biases are upcast inside the kernels, but
        # these two are stateful and must cast here)
        mesh_lat = cache.get("mesh_embed")
        if mesh_lat is None:
            mesh_lat = self.embed_mesh(jnp.asarray(g["mesh_nfeat"], dt))
        else:
            mesh_lat = mesh_lat.astype(dt)
        mm_lat = cache.get("mm_edge")
        if mm_lat is None:
            mm_lat = self.embed_mm(
                jnp.asarray(self.mesh_plan["efeat_blocks"], dt)
            )
        else:
            mm_lat = mm_lat.astype(dt)

        # --- encoder: grid → mesh ---
        mesh_lat = self.g2m(grid_lat, mesh_lat, cache.get("g2m_bias"))
        grid_lat = self.grid_update(grid_lat, residual=grid_lat)

        # --- processor: multimesh rounds (padded block layout) ---
        from skyrim_tpu.ops.graph import block_onehot

        onehot = block_onehot(self.mesh_plan, dt)
        for i in range(cfg.processor_rounds):
            mesh_lat, mm_lat = getattr(self, f"round_{i}")(
                mesh_lat, mm_lat, onehot
            )

        # --- decoder: mesh → grid ---
        grid_lat = self.m2g(mesh_lat, grid_lat, cache.get("m2g_bias"))

        return self.head(grid_lat)


class GraphCastModel(PrognosticModel):
    name = "graphcast"
    channels = ch.GRAPHCAST
    n_history = 2

    def __init__(self, cfg: GraphCastConfig | None = None):
        self.cfg = cfg or GraphCastConfig()
        self.grid = LatLonGrid(self.cfg.lat, self.cfg.lon)
        if self.cfg.in_channels != len(self.channels):
            self.channels = tuple(f"c{i:02d}" for i in range(self.cfg.in_channels))
        self.graphs = build_graphs(
            self.cfg.lat, self.cfg.lon, self.cfg.mesh_refinements
        )
        self.module = GraphCastNet(self.cfg, self.graphs, self.compute_dtype)

    #: forcing channels appended to the grid input: TISR + 4 clock features
    N_FORCINGS = 5

    def _forcings(self, time_days):
        """(5, H, W) time-dependent forcings computed on device
        (GraphCast's tisr + clock inputs; reference maps tisr via the
        tp06 slot, graphcast.py:16,40)."""
        from skyrim_tpu.data.solar import (
            clock_features_jax,
            toa_incident_solar_radiation_jax,
        )

        tisr = toa_incident_solar_radiation_jax(
            time_days * 86400.0, self.grid.lat, self.grid.lon,
            integration_hours=self.time_step.total_seconds() / 3600.0,
        )
        clock = clock_features_jax(time_days * 86400.0, self.grid.lat, self.grid.lon)
        tisr = tisr / 1.5e7  # scale to O(1): 6h TOA max ≈ 1361·3600·6
        return jnp.concatenate([tisr[None], clock], axis=0)

    def _grid_input(self, params, x, time_days):
        """(hist, C, H, W) → feature-major (hist·C + 5 forcings +
        3 static, n_grid) — the embed MLP consumes it transposed, so no
        (n_grid, feat) relayout ever materializes."""
        nc = self.cfg.in_channels
        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        forc = self._forcings(time_days).astype(self.compute_dtype)
        static = jnp.asarray(self.graphs["grid_nfeat"].T, self.compute_dtype)
        return jnp.concatenate(
            [
                xn.reshape(self.n_history * nc, -1),
                forc.reshape(self.N_FORCINGS, -1),
                static,
            ]
        )

    def init_params(self, rng):
        nc = self.cfg.in_channels
        dummy = jnp.zeros(
            (self.n_history * nc + self.N_FORCINGS + 3, self.graphs["n_grid"]),
            jnp.float32,
        )
        variables = jax.jit(self.module.init)(rng, dummy)
        return self.prepare_params(
            {"net": variables["params"], "norm": make_norm_params(nc)}
        )

    def prepare_params(self, params):
        """Attach the step-invariant edge-embedding cache (derived from
        params; stripped from checkpoints, rebuilt here on load).
        ``SKYRIM_GC_NO_CACHE=1`` disables it (recompute every step)."""
        if os.environ.get("SKYRIM_GC_NO_CACHE"):
            params.pop("cache", None)
            return params
        if "cache" not in params:
            build = jax.jit(
                lambda p: self.module.apply(
                    {"params": p}, method=GraphCastNet.cache_tables
                )
            )
            params = dict(params)
            params["cache"] = build(params["net"])
        return params

    def param_count(self, params):
        return super().param_count(
            {k: v for k, v in params.items() if k != "cache"}
        )

    def _apply_at(self, params, x, time_days):
        nc = self.cfg.in_channels
        grid_in = self._grid_input(params, x, time_days)
        delta = self.module.apply(
            {"params": params["net"]}, grid_in, params.get("cache")
        )
        delta = delta.T.reshape(nc, self.cfg.lat, self.cfg.lon).astype(jnp.float32)
        xn_last = normalize(params["norm"], x[-1])
        return denormalize(params["norm"], xn_last + delta)[None]

    def apply(self, params, x):
        return self._apply_at(params, x, jnp.float32(0.0))

    def advance(self, params, state):
        y = self._apply_at(params, state.x, state.time_days)
        new_x = jnp.concatenate([state.x, y], axis=0)[-self.n_history :]
        new_state = state.replace(
            x=new_x,
            step=state.step + 1,
            time_days=state.time_days + self._step_days,
        )
        return new_state, y
