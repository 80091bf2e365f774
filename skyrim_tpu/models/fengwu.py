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
    lat: int = 721
    lon: int = 1440
    levels: int = 13
    surface_channels: int = 4
    level_vars: int = 5  # z, q, u, v, t
    modal_dim: int = 96
    fuser_dim: int = 576  # 6 modalities × modal_dim
    depth: int = 8
    num_heads: int = 8
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
        cfg = self.cfg
        p = cfg.patch
        Ht, Wt = cfg.tokens

        # --- per-modal encoders ---
        feats = []
        for gi, gx in enumerate(groups):
            h = gx.transpose(1, 2, 0)
            h = jnp.pad(h, ((0, (-cfg.lat) % p), (0, 0), (0, 0)))
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
        outs = []
        n_out = [cfg.surface_channels] + [cfg.levels] * cfg.level_vars
        for gi, nc in enumerate(n_out):
            o = nn.ConvTranspose(
                nc, (p, p), strides=(p, p), dtype=h.dtype, name=f"dec_{gi}"
            )(h)[: cfg.lat]
            outs.append(o.transpose(2, 0, 1))
        return outs  # [surface (4,H,W), z (13,H,W), q, u, v, t]


class FengWuModel(PrognosticModel):
    name = "fengwu"
    channels = ch.FENGWU
    n_history = 2

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
