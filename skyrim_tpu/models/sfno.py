"""FourCastNet v2 — Spherical Fourier Neural Operator, TPU-native.

Re-implements the SFNO the reference wraps via
``earth2mip.networks.fcnv2_sm`` (reference
skyrim/core/models/fourcastnet_v2.py:36-37: 73 channels, 721×1440,
n_history=1).  Architecture follows Bonev et al. 2023: encoder lift →
N spectral blocks (SHT → learned per-degree complex filter → ISHT, plus
pointwise MLP, both residual) → decoder.

TPU mapping: the SHT is batched Legendre matmuls (ops/sht.py) — MXU
work, not a custom scatter; the spectral filter is rotation-equivariant
(weights depend on degree l only, not order m), which keeps it a cheap
broadcast multiply; blocks run at an internally downscaled grid
(``scale_factor``) exactly like the reference's "sm" variant.
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
from skyrim_tpu.ops.sht import get_sht


@dataclasses.dataclass(frozen=True)
class SFNOConfig:
    lat: int = 721
    lon: int = 1440
    in_channels: int = 73
    embed_dim: int = 256
    num_blocks: int = 8
    scale_factor: int = 4  # internal grid = (lat/s, lon/s)
    mlp_ratio: float = 2.0
    hard_thresholding_fraction: float = 1.0  # lmax fraction of internal nlat

    @property
    def internal_grid(self) -> tuple[int, int]:
        return (-(-self.lat // self.scale_factor), self.lon // self.scale_factor)

    @property
    def lmax(self) -> int:
        return int(self.internal_grid[0] * self.hard_thresholding_fraction)


class SpectralFilter(nn.Module):
    """SHT → per-degree complex gain → ISHT (rotation-equivariant)."""

    cfg: SFNOConfig

    @nn.compact
    def __call__(self, x):  # (Hi, Wi, D)
        cfg = self.cfg
        Hi, Wi = cfg.internal_grid
        L = cfg.lmax
        sht = get_sht(Hi, Wi, L, min(L, Wi // 2 + 1))
        D = x.shape[-1]
        wr = self.param("w_real", nn.initializers.normal(0.02), (L, 1, D))
        wi = self.param("w_imag", nn.initializers.normal(0.02), (L, 1, D))

        alm = sht.forward(x.transpose(2, 0, 1))  # (D, L, M)
        w = jax.lax.complex(
            (1.0 + wr).astype(jnp.float32), wi.astype(jnp.float32)
        ).transpose(2, 0, 1)
        y = sht.inverse(alm * w)  # (D, Hi, Wi)
        return y.transpose(1, 2, 0).astype(x.dtype)


class SFNOBlock(nn.Module):
    cfg: SFNOConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        D = cfg.embed_dim
        h = nn.LayerNorm(dtype=x.dtype)(x)
        x = x + SpectralFilter(cfg)(h)
        h = nn.LayerNorm(dtype=x.dtype)(x)
        h = nn.Dense(int(D * cfg.mlp_ratio), dtype=x.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(D, dtype=x.dtype)(h)
        return x + h


class SFNONet(nn.Module):
    cfg: SFNOConfig

    @nn.compact
    def __call__(self, x):  # (C, H, W) → (C, H, W)
        cfg = self.cfg
        s = cfg.scale_factor
        h = x.transpose(1, 2, 0)  # (H, W, C)
        h = jnp.pad(h, ((0, (-cfg.lat) % s), (0, 0), (0, 0)))
        h = nn.Conv(cfg.embed_dim, (s, s), strides=(s, s), dtype=h.dtype, name="encoder")(h)
        for i in range(cfg.num_blocks):
            h = SFNOBlock(cfg, name=f"block_{i}")(h)
        h = nn.LayerNorm(dtype=h.dtype)(h)
        h = nn.ConvTranspose(
            cfg.in_channels, (s, s), strides=(s, s), dtype=h.dtype, name="decoder"
        )(h)[: cfg.lat]
        return h.transpose(2, 0, 1)


class FourCastNetV2Model(PrognosticModel):
    name = "fourcastnet_v2"
    channels = ch.FCNV2
    n_history = 1

    def __init__(self, cfg: SFNOConfig | None = None):
        self.cfg = cfg or SFNOConfig()
        assert self.cfg.in_channels == len(self.channels) or self.cfg.in_channels > 0
        self.module = SFNONet(self.cfg)
        self.grid = LatLonGrid(self.cfg.lat, self.cfg.lon)
        if self.cfg.in_channels != len(self.channels):
            # reduced-channel test configs keep a synthetic channel list
            self.channels = tuple(f"c{i:02d}" for i in range(self.cfg.in_channels))

    def init_params(self, rng):
        dummy = jnp.zeros((self.cfg.in_channels, self.cfg.lat, self.cfg.lon), jnp.float32)
        variables = jax.jit(self.module.init)(rng, dummy)
        return {"net": variables["params"], "norm": make_norm_params(self.cfg.in_channels)}

    def apply(self, params, x):
        xn = normalize(params["norm"], x[-1]).astype(self.compute_dtype)
        y = self.module.apply({"params": params["net"]}, xn)
        out = xn.astype(jnp.float32) + y.astype(jnp.float32)  # residual step
        return denormalize(params["norm"], out)[None]
