"""GraphCast — icosahedral multimesh GNN, TPU-native.

Re-implements the JAX/Haiku GraphCast the reference wraps via
``earth2mip.networks.graphcast`` (reference
skyrim/core/models/graphcast.py:51-54): 83-channel contract
(graphcast.py:17-26), 2-frame stateful input with an rng in the rollout
state (graphcast.py:110-120), encoder → 16 processor rounds on the
multimesh → decoder, residual output.

TPU mapping: all graph indices are static tables (ops/graph.py); message
aggregation is sorted ``segment_sum`` (efficient XLA scatter); the
multi-million-edge encoder/decoder MLPs are chunk-scanned to bound
activation memory; node/edge MLPs are big dense matmuls on the MXU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from skyrim_tpu import channels as ch
from skyrim_tpu.grid import LatLonGrid
from skyrim_tpu.models.base import (
    PrognosticModel,
    denormalize,
    make_norm_params,
    normalize,
)
from skyrim_tpu.ops.graph import build_graphs, chunked_message_aggregate


@dataclasses.dataclass(frozen=True)
class GraphCastConfig:
    lat: int = 721
    lon: int = 1440
    in_channels: int = 83
    latent: int = 512
    processor_rounds: int = 16
    mesh_refinements: int = 6
    edge_chunks: int = 8  # scan chunks for grid2mesh/mesh2grid MLPs


class MLP(nn.Module):
    out: int
    hidden: int
    final_norm: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=x.dtype)(x)
        h = nn.swish(h)
        h = nn.Dense(self.out, dtype=x.dtype)(h)
        if self.final_norm:
            h = nn.LayerNorm(dtype=x.dtype)(h)
        return h


class BipartitePass(nn.Module):
    """One src→dst message pass over a static bipartite edge set.

    Edge embedding + gather + message MLP + destination segment-sum all
    run inside one chunk scan (ops/graph.chunked_message_aggregate): the
    multi-GB (E, L) edge tensors never hit HBM whole.  Raw 4-feature
    edge inputs come in; only the (n_dst, L) aggregate comes out.
    """

    latent: int
    n_dst: int
    edge_chunks: int = 1

    @nn.compact
    def __call__(self, src_feat, dst_feat, edge_feat, src_idx, dst_idx):
        L = self.latent
        embed = MLP(L, L, name="edge_embed")
        mlp = MLP(L, L, name="message")
        dt = src_feat.dtype

        def message_fn(ef, si, di):
            e_lat = embed(ef.astype(dt))
            return mlp(jnp.concatenate([e_lat, src_feat[si], dst_feat[di]], axis=-1))

        if self.is_initializing():
            # create params outside the chunk scan
            message_fn(edge_feat[:1], src_idx[:1], dst_idx[:1])
        agg = chunked_message_aggregate(
            message_fn,
            (jnp.asarray(edge_feat), jnp.asarray(src_idx), jnp.asarray(dst_idx)),
            jnp.asarray(dst_idx),
            self.n_dst,
            self.edge_chunks,
            out_dim=L,
            dtype=dt,
        )
        dst_new = dst_feat + MLP(L, L)(jnp.concatenate([dst_feat, agg], axis=-1))
        return dst_new


class ProcessorRound(nn.Module):
    """One round of message passing on the multimesh (residual)."""

    latent: int
    n_mesh: int

    @nn.compact
    def __call__(self, nodes, edges, src_idx, dst_idx):
        L = self.latent
        gathered = jnp.concatenate([edges, nodes[src_idx], nodes[dst_idx]], axis=-1)
        new_edges = edges + MLP(L, L)(gathered)
        agg = jax.ops.segment_sum(
            new_edges, dst_idx, num_segments=self.n_mesh, indices_are_sorted=True
        )
        new_nodes = nodes + MLP(L, L)(jnp.concatenate([nodes, agg], axis=-1))
        return new_nodes, new_edges


class GraphCastNet(nn.Module):
    cfg: GraphCastConfig
    graphs: dict  # static numpy tables

    @nn.compact
    def __call__(self, grid_in):  # (n_grid, F_in) → (n_grid, C_out)
        cfg = self.cfg
        g = self.graphs
        L = cfg.latent
        dt = grid_in.dtype

        # --- embed nodes (edge embedding happens inside the chunk scans;
        # the multimesh is small enough to embed whole) ---
        grid_lat = MLP(L, L, name="embed_grid")(grid_in)
        mesh_lat = MLP(L, L, name="embed_mesh")(
            jnp.asarray(g["mesh_nfeat"], dt)
        )
        mm_lat = MLP(L, L, name="embed_mm")(jnp.asarray(g["mesh_efeat"], dt))

        # --- encoder: grid → mesh ---
        mesh_lat = BipartitePass(
            L, g["n_mesh"], cfg.edge_chunks, name="g2m"
        )(grid_lat, mesh_lat, g["g2m_efeat"], g["g2m_src"], g["g2m_dst"])
        grid_lat = grid_lat + MLP(L, L, name="grid_update")(grid_lat)

        # --- processor: multimesh rounds ---
        for i in range(cfg.processor_rounds):
            mesh_lat, mm_lat = ProcessorRound(
                L, g["n_mesh"], name=f"round_{i}"
            )(mesh_lat, mm_lat, g["mesh_src"], g["mesh_dst"])

        # --- decoder: mesh → grid ---
        grid_lat = BipartitePass(
            L, g["n_grid"], cfg.edge_chunks, name="m2g"
        )(mesh_lat, grid_lat, g["m2g_efeat"], g["m2g_src"], g["m2g_dst"])

        return MLP(cfg.in_channels, L, final_norm=False, name="head")(grid_lat)


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
        self.module = GraphCastNet(self.cfg, self.graphs)

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
        """(hist, C, H, W) → (n_grid, hist·C + 5 forcings + 3 static)."""
        nc = self.cfg.in_channels
        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        forc = self._forcings(time_days).astype(self.compute_dtype)
        flat = jnp.concatenate(
            [xn.reshape(self.n_history * nc, -1), forc.reshape(self.N_FORCINGS, -1)]
        ).T  # (n_grid, hist·C + 5)
        static = jnp.asarray(self.graphs["grid_nfeat"], flat.dtype)
        return jnp.concatenate([flat, static], axis=-1)

    def init_params(self, rng):
        nc = self.cfg.in_channels
        dummy = jnp.zeros(
            (self.graphs["n_grid"], self.n_history * nc + self.N_FORCINGS + 3),
            jnp.float32,
        )
        variables = jax.jit(self.module.init)(rng, dummy)
        return {"net": variables["params"], "norm": make_norm_params(nc)}

    def _apply_at(self, params, x, time_days):
        nc = self.cfg.in_channels
        grid_in = self._grid_input(params, x, time_days)
        delta = self.module.apply({"params": params["net"]}, grid_in)
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
