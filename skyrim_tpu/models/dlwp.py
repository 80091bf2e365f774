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
        self._to_cs = g.latlon_to_cubed_sphere_patch(face_size, H, W)
        self._to_ll = g.cubed_sphere_to_latlon_patch(face_size, H, W)

    # -- remaps (static quad-row gathers) ----------------------------------

    # Each destination point fetches its whole 2×2 bilinear patch as ONE
    # row of a precomputed "quad table" whose row (r, c) holds the
    # 4·D-value concatenation of grid cells (r..r+1, c..c+1) — built by
    # four static slices + one concat, all wide copies.  Rationale,
    # measured with utils/op_stats on the v5e:
    #   * a per-neighbor (dst·4, D=14) row gather wastes 9× of every
    #     T(8,128) tile on lane padding (14 of 128 live lanes), forces a
    #     2.1 GB physical intermediate plus a reshape and a relayout
    #     copy — ~80 % of the step;
    #   * a (2, 2·D)-slice lax.gather avoids the padding but falls off
    #     XLA:TPU's fast whole-row gather emitter and lowers to a serial
    #     while loop (~1.8 s for the 1 M destinations);
    #   * a whole-row gather of 4·D=56-value quad rows stays on the fast
    #     emitter at 56/128 lane occupancy with no reshape, and the
    #     bilinear combination fuses into the gather consumer.

    def _quad_interp(self, t: jax.Array, rows, w, D: int) -> jax.Array:
        """t (R, Cc, D) cell grid; rows (M,) flat into (R−1)·(Cc−1);
        w (M, 4) bilinear weights ordered (r0c0, r0c1, r1c0, r1c1).

        Returns (M, D) in ``t.dtype``.  The whole pipeline stays in the
        compute dtype: upcasting the (M, 4D) patch to f32 before the
        weighted sum materializes an extra ~330 MB relayout+convert pair
        (measured), for an interpolation whose inputs are bf16 anyway.
        """
        quad = jnp.concatenate(
            [t[:-1, :-1], t[:-1, 1:], t[1:, :-1], t[1:, 1:]], axis=-1
        )  # (R−1, Cc−1, 4D)
        table = quad.reshape(-1, 4 * D)
        p = table[jnp.asarray(rows)]  # (M, 4D) whole-row gather (fast emitter)
        wf = jnp.asarray(w).astype(t.dtype)
        return (
            wf[:, 0:1] * p[:, :D]
            + wf[:, 1:2] * p[:, D : 2 * D]
            + wf[:, 2:3] * p[:, 2 * D : 3 * D]
            + wf[:, 3:4] * p[:, 3 * D :]
        )

    def _remap_to_cs(self, x: jax.Array) -> jax.Array:
        """(N, C, H, W) → (N, 6, F, F, C).

        Here dst (6F² ≈ 25 k) ≪ src (1 M lat-lon points), so a quad
        table over the source grid would cost a ~265 MB physical build
        for 25 k used rows (measured 2.3× slower).  A narrow per-neighbor
        row gather on the packed (H·W, N·C) table is the cheap direction
        — the reverse trade-off from :meth:`_remap_to_ll`.
        """
        starts, w = self._to_cs
        N, C, H, W = x.shape
        F = self.face_size
        D = N * C
        i0 = starts[:, 0].astype(np.int64)
        j0 = starts[:, 1].astype(np.int64)
        j1 = (j0 + 1) % W  # longitude wrap
        idx = np.stack(
            [i0 * W + j0, i0 * W + j1, (i0 + 1) * W + j0, (i0 + 1) * W + j1], -1
        ).astype(np.int32)
        table = x.reshape(N * C, -1).T  # (H·W, N·C), packs {0,1}
        g4 = table[jnp.asarray(idx.reshape(-1))].reshape(-1, 4 * D)
        wf = jnp.asarray(w).astype(x.dtype)
        out = (
            wf[:, 0:1] * g4[:, :D]
            + wf[:, 1:2] * g4[:, D : 2 * D]
            + wf[:, 2:3] * g4[:, 2 * D : 3 * D]
            + wf[:, 3:4] * g4[:, 3 * D :]
        )
        out = out.reshape(6, F, F, N, C)
        return jnp.moveaxis(out, 3, 0)  # (N, 6, F, F, C)

    def _remap_to_ll(self, x: jax.Array) -> jax.Array:
        """(N, 6, F, F, C) → (N, C, H, W)."""
        starts, w = self._to_ll
        N, C = x.shape[0], x.shape[-1]
        H, W = self.grid.shape
        F = self.face_size
        F2 = F + 2
        D = N * C
        halo = g.cubed_sphere_halo_indices(F, 1)  # (6, F2, F2)
        flat = x.reshape(N, 6 * F * F, C)
        padded = flat[:, halo.reshape(-1)]  # (N, 6·F2², C): 26 k rows, cheap
        t = (
            padded.reshape(N, 6 * F2, F2, C)
            .transpose(1, 2, 0, 3)
            .reshape(6 * F2, F2, D)
        )
        # quad rows never straddle a face band: start row f·F2+pb0 has
        # pb0 ≤ F, so row+1 ≤ f·F2 + F+1 stays inside face f's padding
        rows = starts[:, 0].astype(np.int64) * (F2 - 1) + starts[:, 1]
        out = self._quad_interp(t, rows.astype(np.int32), w, D)
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
        )[None].astype(self.compute_dtype)  # (1, 6, F, F, hist*C)
        y = self.module.apply({"params": params["net"]}, stacked)[0]
        # (6, F, F, frames_out*nc) → (frames_out, 6, F, F, nc)
        y = y.reshape(6, self.face_size, self.face_size, self.frames_out, nc)
        y = jnp.moveaxis(y, 3, 0)
        ll = self._remap_to_ll(y).astype(jnp.float32)  # (frames_out, C, H, W)
        # residual prediction from the latest input frame
        out = normalize(params["norm"], x[-1])[None] + ll
        return denormalize(params["norm"], out)
