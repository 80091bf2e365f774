"""FengWu — multi-modal transformer, TPU-native.

Re-implements the ONNX FengWu the reference wraps via earth2studio
(reference skyrim/core/models/fengwu.py:44-45): 69 channels
(fengwu.py:14-22), two input time steps, 6 h step.

Architecture follows Chen et al. 2023 (arXiv:2304.02948): each variable
group (surface, z, q, u, v, t) is a modality with its own patch-embed
encoder and its own decoder; a shared cross-modal fuser of Swin-style
window-attention blocks (ops/windows.py, periodic longitude) mixes the
concatenated modal features.  Window attention shares the same MXU
mapping as Pangu/FuXi (SURVEY.md §2.9 FengWu row).
"""

from __future__ import annotations

import dataclasses

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
from skyrim_tpu.models.fuxi import SwinBlock2D


@dataclasses.dataclass(frozen=True)
class FengWuConfig:
    """Production capacity (Chen et al. 2023, arXiv:2304.02948): one
    modal encoder per variable group (surface + z/q/u/v/t) feeding a
    cross-modal window-attention fuser; the paper publishes the
    structure but no parameter count, so widths are scaled to the
    released ONNX artifact class (~260 M params; derivation and
    deviations in ARCH_FIDELITY.md).  Reduced values serve the test
    tier."""

    lat: int = 721
    lon: int = 1440
    levels: int = 13
    surface_channels: int = 4
    level_vars: int = 5  # z, q, u, v, t
    modal_dim: int = 192
    fuser_dim: int = 1152  # 6 modalities × modal_dim
    depth: int = 16
    num_heads: int = 18  # head_dim 64 (MXU-friendly)
    window: tuple[int, int] = (6, 12)
    patch: int = 4

    @property
    def in_channels(self) -> int:
        return self.surface_channels + self.level_vars * self.levels

    @property
    def tokens(self) -> tuple[int, int]:
        return (-(-self.lat // self.patch), self.lon // self.patch)


class FengWuNet(nn.Module):
    cfg: FengWuConfig

    @nn.compact
    def __call__(self, groups):  # list of (hist·Ci, H, W) per modality
        from skyrim_tpu.models.pangu import ConvParams
        from skyrim_tpu.ops.flash_window_attention import use_pallas

        cfg = self.cfg
        p = cfg.patch
        # token extents from the ACTUAL input: inside a lon-manual
        # shard_map region (parallel/fused_shard.py) groups are this
        # shard's local lon chunks — no W geometry from config
        Hin, Win = groups[0].shape[1], groups[0].shape[2]
        Ht, Wt = -(-Hin // p), Win // p
        md = cfg.modal_dim
        fused = use_pallas() and not self.is_initializing()

        # --- per-modal encoders ---
        if fused:
            # all 6 modal patch convs as ONE block-diagonal grand GEMM
            # over the concatenated channels — XLA's strided convs on
            # few-channel inputs are layout-bound (same finding as FuXi's
            # cube_embed, ~12 ms/step there).  The block weight is a
            # pure scan-invariant function of the conv params.
            cis = [g.shape[0] for g in groups]
            offs = np.cumsum([0] + cis)
            lanes = int(offs[-1])
            x_all = jnp.concatenate([g.transpose(1, 2, 0) for g in groups], -1)
            x_all = jnp.pad(x_all, ((0, (-Hin) % p), (0, 0), (0, 0)))
            dt = x_all.dtype
            Wg = jnp.zeros((p * p * lanes, len(groups) * md), jnp.float32)
            bg = []
            for gi, ci in enumerate(cis):
                k, b = ConvParams((p, p, ci, md), name=f"enc_{gi}")()
                for i in range(p):
                    for j in range(p):
                        row = (i * p + j) * lanes + int(offs[gi])
                        Wg = Wg.at[row : row + ci, gi * md : (gi + 1) * md].set(
                            k[i, j]
                        )
                bg.append(b)
            bias_g = jnp.concatenate(bg)
            pt = x_all.reshape(Ht, p, Wt, p, lanes).transpose(0, 2, 1, 3, 4)
            pt = pt.reshape(Ht * Wt, p * p * lanes)
            h = pt @ Wg.astype(dt) + bias_g.astype(dt)
            h = h.reshape(Ht, Wt, len(groups) * md)
        else:
            feats = []
            for gi, gx in enumerate(groups):
                h = gx.transpose(1, 2, 0)
                h = jnp.pad(h, ((0, (-Hin) % p), (0, 0), (0, 0)))
                h = nn.Conv(
                    cfg.modal_dim, (p, p), strides=(p, p), dtype=h.dtype,
                    name=f"enc_{gi}",
                )(h)
                feats.append(h)
            h = jnp.concatenate(feats, axis=-1)  # (Ht, Wt, n_modal·modal_dim)
        h = nn.Dense(cfg.fuser_dim, dtype=h.dtype, name="fuse_in")(h)

        # --- cross-modal fuser ---
        hp = jnp.pad(h, ((0, (-Ht) % cfg.window[0]), (0, 0), (0, 0)))
        for i in range(cfg.depth):
            hp = SwinBlock2D(
                cfg.fuser_dim, cfg.num_heads, cfg.window,
                shifted=(i % 2 == 1), valid_h=Ht, name=f"fuser_{i}",
            )(hp)
        h = hp[:Ht]

        # --- per-modal decoders ---
        n_out = [cfg.surface_channels] + [cfg.levels] * cfg.level_vars
        if fused:
            # all 6 transposed convs as one grand recovery GEMM (kernels
            # spatially flipped — flax ConvTranspose semantics, see
            # models/pangu.py grand_weights)
            D = cfg.fuser_dim
            co_offs = np.cumsum([0] + n_out)
            Cout = int(co_offs[-1])
            Wr = jnp.zeros((D, p, p, Cout), jnp.float32)
            brs = []
            for gi, nc_g in enumerate(n_out):
                k, b = ConvParams((p, p, D, nc_g), name=f"dec_{gi}")()
                kf = k[::-1, ::-1].transpose(2, 0, 1, 3)  # (D, p, p, nc)
                Wr = Wr.at[:, :, :, int(co_offs[gi]) : int(co_offs[gi + 1])].set(kf)
                brs.append(b)
            bias_r = jnp.concatenate(brs)
            y = h.reshape(Ht * Wt, D) @ Wr.reshape(D, p * p * Cout).astype(h.dtype)
            y = y.reshape(Ht, Wt, p, p, Cout) + bias_r.astype(h.dtype)
            y = y.transpose(0, 2, 1, 3, 4).reshape(Ht * p, Wt * p, Cout)
            y = y[:Hin].transpose(2, 0, 1)  # (ΣCi, H, W)
            return [
                y[int(co_offs[gi]) : int(co_offs[gi + 1])]
                for gi in range(len(n_out))
            ]
        outs = []
        for gi, nc in enumerate(n_out):
            o = nn.ConvTranspose(
                nc, (p, p), strides=(p, p), dtype=h.dtype, name=f"dec_{gi}"
            )(h)[:Hin]
            outs.append(o.transpose(2, 0, 1))
        return outs  # [surface (4,H,W), z (13,H,W), q, u, v, t]


class FengWuModel(PrognosticModel):
    name = "fengwu"
    channels = ch.FENGWU
    n_history = 2
    lon_manual = True  # whole-step shard_map path (parallel/fused_shard.py)

    @property
    def lon_shard_divisor(self) -> int:
        return self.cfg.tokens[1]

    def __init__(self, cfg: FengWuConfig | None = None):
        self.cfg = cfg or FengWuConfig()
        self.grid = LatLonGrid(self.cfg.lat, self.cfg.lon)
        if self.cfg.in_channels != len(self.channels):
            self.channels = tuple(f"c{i:02d}" for i in range(self.cfg.in_channels))
        self.module = FengWuNet(self.cfg)

    def _split_groups(self, x):
        """(hist, C, H, W) → list of (hist·Ci, H, W), FENGWU channel order:
        4 surface then z,q,u,v,t × levels (reference fengwu.py:14-22)."""
        cfg = self.cfg
        hist = x.shape[0]
        HW = x.shape[-2:]
        groups = [x[:, : cfg.surface_channels].reshape(-1, *HW)]
        ofs = cfg.surface_channels
        for _ in range(cfg.level_vars):
            groups.append(x[:, ofs : ofs + cfg.levels].reshape(-1, *HW))
            ofs += cfg.levels
        return groups

    def init_params(self, rng):
        cfg = self.cfg
        HW = (cfg.lat, cfg.lon)
        dummy = [
            jnp.zeros((self.n_history * cfg.surface_channels, *HW), jnp.float32)
        ] + [
            jnp.zeros((self.n_history * cfg.levels, *HW), jnp.float32)
            for _ in range(cfg.level_vars)
        ]
        variables = jax.jit(self.module.init)(rng, dummy)
        return {"net": variables["params"], "norm": make_norm_params(cfg.in_channels)}

    def apply(self, params, x):
        cfg = self.cfg
        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        groups = self._split_groups(xn)
        outs = self.module.apply({"params": params["net"]}, groups)
        y = jnp.concatenate(outs, axis=0).astype(jnp.float32)
        xlast = normalize(params["norm"], x[-1])
        return denormalize(params["norm"], xlast + y)[None]
