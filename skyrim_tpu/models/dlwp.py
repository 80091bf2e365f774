"""DLWP — cubed-sphere CNN (the minimal end-to-end model).

TPU-native re-design of the model the reference wraps as
``e2mip://dlwp`` (reference skyrim/core/models/dlwp.py:12-39: 7
channels, n_history_levels=2, 721×1440 in/out).  Architecture follows
Weyn et al. 2020 "DLWP-CS": fields are remapped lat-lon → equiangular
cubed sphere, a U-Net CNN runs over the 6 faces with cross-face halo
padding, and two 6-h frames are emitted per call (12 h per apply).

TPU mapping: the remaps are static gathers (grid.py index tables); the
faces form a batch dim so convolutions are large NHWC convs on the MXU;
halo padding is one static gather per conv — no dynamic control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from skyrim_tpu import channels as ch
from skyrim_tpu import grid as g
from skyrim_tpu.models.base import (
    PrognosticModel,
    denormalize,
    make_norm_params,
    normalize,
)


def cs_pad(x: jax.Array, halo_idx: np.ndarray) -> jax.Array:
    """Cross-face halo pad: (B, 6, F, F, C) → (B, 6, F+2p, F+2p, C)."""
    B = x.shape[0]
    C = x.shape[-1]
    flat = x.reshape(B, -1, C)
    return flat[:, halo_idx.reshape(-1)].reshape(B, *halo_idx.shape, C)


class CSConvBlock(nn.Module):
    """Two 3×3 convs with cubed-sphere halo padding + leaky ReLU."""

    features: int
    halo_idx: np.ndarray

    @nn.compact
    def __call__(self, x):  # (B, 6, F, F, C)
        for _ in range(2):
            xp = cs_pad(x, self.halo_idx)
            B, nf, H, W, C = xp.shape
            y = nn.Conv(self.features, (3, 3), padding="VALID", dtype=x.dtype)(
                xp.reshape(B * nf, H, W, C)
            )
            y = nn.leaky_relu(y, 0.1)
            x = y.reshape(B, nf, H - 2, W - 2, self.features)
        return x


class CubeUNet(nn.Module):
    """U-Net over cubed-sphere faces (faces as batch, NHWC on the MXU)."""

    out_channels: int
    face_size: int = 64
    features: tuple = (64, 128, 256)

    @nn.compact
    def __call__(self, x):  # (B, 6, F, F, Cin)
        halo = g.cubed_sphere_halo_indices  # lru_cached static tables
        skips = []
        F = self.face_size
        for i, feat in enumerate(self.features):
            x = CSConvBlock(feat, halo(F, 1))(x)
            if i < len(self.features) - 1:
                skips.append(x)
                B, nf, H, W, C = x.shape
                x = nn.avg_pool(
                    x.reshape(B * nf, H, W, C), (2, 2), strides=(2, 2)
                ).reshape(B, nf, H // 2, W // 2, C)
                F //= 2
        for feat, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            B, nf, H, W, C = x.shape
            x = jax.image.resize(
                x.reshape(B * nf, H, W, C), (B * nf, H * 2, W * 2, C), "nearest"
            ).reshape(B, nf, H * 2, W * 2, C)
            F *= 2
            x = jnp.concatenate([x, skip], axis=-1)
            x = CSConvBlock(feat, halo(F, 1))(x)
        xp = cs_pad(x, halo(F, 1))
        B, nf, H, W, C = xp.shape
        y = nn.Conv(self.out_channels, (3, 3), padding="VALID", dtype=x.dtype)(
            xp.reshape(B * nf, H, W, C)
        )
        return y.reshape(B, nf, H - 2, W - 2, self.out_channels)


class DLWPModel(PrognosticModel):
    name = "dlwp"
    channels = ch.DLWP
    n_history = 2
    frames_out = 2  # two 6-h frames per call (12 h), DLWP-CS style

    def __init__(self, face_size: int = 64, features: tuple = (64, 128, 256)):
        self.face_size = face_size
        nc = len(self.channels)
        self.module = CubeUNet(
            out_channels=self.frames_out * nc, face_size=face_size, features=features
        )
        H, W = self.grid.shape
        self._to_cs = g.latlon_to_cubed_sphere_indices(face_size, H, W)
        self._to_ll = g.cubed_sphere_to_latlon_indices(face_size, H, W)

    # -- remaps (static gathers) -------------------------------------------

    # Both remaps run CHANNEL-MINOR: gathering along the minor axis of a
    # (N, C, points) tensor lowers as strided element gathers in
    # T(2,128) layouts (~41 ms/step of relayout copies, measured with
    # utils/op_stats).  Row gathers on a (points, N·C) table keep
    # everything in plain T(8,128); the (rows·k, NC) → (rows, k·NC)
    # reinterpret is a free bitcast, and the weighted sum runs on flat
    # lane slices.

    def _interp_rows(self, table: jax.Array, idx, w) -> jax.Array:
        """table (src_points, D); idx (dst, k); w (dst, k) → (dst, D)."""
        k = idx.shape[-1]
        D = table.shape[-1]
        g = table[jnp.asarray(idx.reshape(-1))]  # (dst·k, D) row gather
        g = g.reshape(-1, k * D)  # free reinterpret
        wf = jnp.asarray(w.reshape(-1, k))
        out = None
        for j in range(k):
            part = wf[:, j : j + 1] * g[:, j * D : (j + 1) * D]
            out = part if out is None else out + part
        return out

    def _remap_to_cs(self, x: jax.Array) -> jax.Array:
        """(N, C, H, W) → (N, 6, F, F, C)."""
        idx, w = self._to_cs
        N, C = x.shape[:2]
        F = self.face_size
        table = x.reshape(N * C, -1).T  # (H·W, N·C)
        out = self._interp_rows(table, idx.reshape(-1, idx.shape[-1]), w)
        out = out.reshape(6, F, F, N, C)
        return jnp.moveaxis(out, 3, 0)  # (N, 6, F, F, C)

    def _remap_to_ll(self, x: jax.Array) -> jax.Array:
        """(N, 6, F, F, C) → (N, C, H, W)."""
        idx, w = self._to_ll
        N, C = x.shape[0], x.shape[-1]
        H, W = idx.shape[:2]
        table = x.reshape(N, -1, C).transpose(1, 0, 2).reshape(-1, N * C)
        out = self._interp_rows(table, idx.reshape(-1, idx.shape[-1]), w)
        out = out.reshape(H, W, N, C)
        return out.transpose(2, 3, 0, 1)  # (N, C, H, W)

    # -- PrognosticModel ----------------------------------------------------

    def init_params(self, rng: jax.Array):
        nc = len(self.channels)
        dummy = jnp.zeros(
            (1, 6, self.face_size, self.face_size, self.n_history * nc), jnp.float32
        )
        variables = jax.jit(self.module.init)(rng, dummy)
        return {
            "net": variables["params"],
            "norm": make_norm_params(nc),
        }

    def apply(self, params, x: jax.Array) -> jax.Array:
        nc = len(self.channels)
        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        cs = self._remap_to_cs(xn)  # (hist, 6, F, F, C)
        stacked = jnp.concatenate(
            [cs[i] for i in range(self.n_history)], axis=-1
        )[None]  # (1, 6, F, F, hist*C)
        y = self.module.apply({"params": params["net"]}, stacked)[0]
        # (6, F, F, frames_out*nc) → (frames_out, 6, F, F, nc)
        y = y.reshape(6, self.face_size, self.face_size, self.frames_out, nc)
        y = jnp.moveaxis(y, 3, 0)
        ll = self._remap_to_ll(y).astype(jnp.float32)  # (frames_out, C, H, W)
        # residual prediction from the latest input frame
        out = normalize(params["norm"], x[-1])[None] + ll
        return denormalize(params["norm"], out)
