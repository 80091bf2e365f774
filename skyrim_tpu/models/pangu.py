"""Pangu-Weather — 3D Earth-Specific Transformer, TPU-native.

Re-implements the model the reference wraps as ONNX via
``earth2mip.networks.pangu`` (reference skyrim/core/models/pangu.py:45-46):
69 channels = z/q/t/u/v × 13 levels + msl/u10m/v10m/t2m on 721×1440
(pangu.py:6-13,32-36), hierarchical 6h+24h model pair.

Architecture follows Bi et al., Nature 2023 (public):
- patch embed: surface 4×4, upper-air 2×4×4 → tokens (8, 181, 360), C=192
- encoder/decoder 2-6-6-2 blocks; middle stages at (8, 91, 180), 2C
- 3D window attention, window (2, 6, 12), shifted every other block,
  earth-specific bias (absolute in level/lat, relative in lon)
- skip connection concat between encoder stage 1 and decoder output
- constant masks (land-sea, soil, topography) concatenated to surface input

TPU mapping: window attention is a batched (nWin, 144, C) einsum chain —
dense MXU matmuls; windowing is reshape/roll only; all masks/bias
indices are static numpy tables (ops/windows.py).  Hierarchical 6h/24h
rollout runs under ``lax.cond`` inside the scanned advance, keeping the
whole rollout on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from skyrim_tpu import channels as ch
from skyrim_tpu.models.base import (
    ModelState,
    PrognosticModel,
    denormalize,
    make_norm_params,
    normalize,
)
from skyrim_tpu.ops import windows as W


@dataclasses.dataclass(frozen=True)
class PanguConfig:
    lat: int = 721
    lon: int = 1440
    levels: int = 13
    surface_channels: int = 4  # msl, u10m, v10m, t2m
    level_vars: int = 5  # z, q, t, u, v
    const_masks: int = 3  # land-sea, soil type, topography
    patch: tuple[int, int, int] = (2, 4, 4)  # (level, lat, lon)
    window: tuple[int, int, int] = (2, 6, 12)
    embed_dim: int = 192
    depths: tuple[int, ...] = (2, 6, 6, 2)
    num_heads: tuple[int, ...] = (6, 12, 12, 6)
    mlp_ratio: float = 4.0

    @property
    def z_tokens(self) -> int:
        # 13 levels → ceil(14/2)=7 upper tokens + 1 surface token row
        return -(-(self.levels + 1) // self.patch[0]) + 1

    @property
    def hw_tokens(self) -> tuple[int, int]:
        return (-(-self.lat // self.patch[1]), self.lon // self.patch[2])


def _use_pallas() -> bool:
    import os

    if os.environ.get("SKYRIM_NO_PALLAS"):
        return False
    return jax.default_backend() != "cpu"


class EarthAttention3D(nn.Module):
    """Window attention with earth-specific positional bias.

    On TPU the fused Pallas kernel (ops/flash_window_attention.py) keeps
    the (wlen × wlen) score matrices in VMEM; the XLA einsum path is the
    CPU/debug fallback and the parity reference.
    """

    dim: int
    heads: int
    window: tuple[int, int, int]
    n_lon_windows: int = 1
    n_type_windows: int = 1  # (z-windows × lat-windows): each has its own bias

    @nn.compact
    def __call__(self, x, mask):  # x: (Z, H, W, C) padded to window multiples
        from skyrim_tpu.ops.flash_window_attention import (
            fused_window_attention_4d,
            reference_window_attention_qkv,
        )

        Z, H, Wd, C = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=x.dtype, name="qkv")(x)

        # Earth-specific bias: translation symmetry is broken along the
        # pressure-level and latitude axes, so every (z, lat) window
        # position carries its OWN table (windows differing only in lon
        # share it) — matching the published Pangu parameterization,
        # where these tables hold most of the model's parameters.
        bias_table = self.param(
            "earth_bias",
            nn.initializers.truncated_normal(0.02),
            (W.earth_bias_table_size(self.window), self.n_type_windows, self.heads),
        )
        bias = bias_table[W.earth_bias_index(self.window)]  # (wlen, wlen, nt, h)
        bias = bias.transpose(2, 3, 0, 1)  # (n_types, heads, wlen, wlen)

        if _use_pallas():
            # windowing happens inside the kernel via BlockSpec tiling —
            # no partition/reverse relayouts ever touch HBM
            out = fused_window_attention_4d(
                qkv, bias, mask, self.window, self.heads
            )
        else:
            parts = W.window_partition(qkv, self.window)
            out = reference_window_attention_qkv(
                parts, bias, mask, self.n_lon_windows, self.heads
            )
            out = W.window_reverse(out, self.window, (Z, H, Wd))
        return nn.Dense(self.dim, dtype=x.dtype, name="proj")(out.astype(x.dtype))


class PanguBlock(nn.Module):
    dim: int
    heads: int
    window: tuple[int, int, int]
    shifted: bool
    mlp_ratio: float
    valid: tuple[int, int, int]  # unpadded (Z, H, W) token extents

    @nn.compact
    def __call__(self, x):  # (Z, H, Wd, C) padded to window multiples
        Z, H, Wd, C = x.shape
        win = self.window
        shift = tuple(w // 2 for w in win) if self.shifted else (0, 0, 0)

        h = nn.LayerNorm(dtype=x.dtype)(x)
        if self.shifted:
            h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]), axis=(0, 1, 2))
        mask = W.shift_attention_mask((Z, H, Wd), win, shift, self.valid)
        mask = jnp.asarray(mask) if mask is not None else None
        h = EarthAttention3D(
            self.dim,
            self.heads,
            self.window,
            n_lon_windows=Wd // win[2],
            n_type_windows=(Z // win[0]) * (H // win[1]),
        )(h, mask)
        if self.shifted:
            h = jnp.roll(h, shift, axis=(0, 1, 2))
        x = x + h

        h = nn.LayerNorm(dtype=x.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=x.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=x.dtype)(h)
        return x + h


class DownSample(nn.Module):
    """2×2 lat-lon patch merging: (Z, H, W, C) → (Z, H/2, W/2, 2C)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        Z, H, Wd, C = x.shape
        pad_h = H % 2
        if pad_h:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
            H += 1
        x = x.reshape(Z, H // 2, 2, Wd // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(Z, H // 2, Wd // 2, 4 * C)
        x = nn.LayerNorm(dtype=x.dtype)(x)
        return nn.Dense(self.dim_out, dtype=x.dtype)(x)


class UpSample(nn.Module):
    """Inverse patch merging: (Z, H, W, C) → (Z, 2H(−crop), 2W, C/2)."""

    dim_out: int
    out_h: int

    @nn.compact
    def __call__(self, x):
        Z, H, Wd, C = x.shape
        x = nn.Dense(4 * self.dim_out, dtype=x.dtype)(x)
        x = x.reshape(Z, H, Wd, 2, 2, self.dim_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(Z, 2 * H, 2 * Wd, self.dim_out)
        x = x[:, : self.out_h]
        return nn.LayerNorm(dtype=x.dtype)(x)


class PanguNet(nn.Module):
    cfg: PanguConfig

    @nn.compact
    def __call__(self, surface, upper):
        """surface (Cs+Cm, H, W), upper (Vl, L, H, W) → same shapes out."""
        cfg = self.cfg
        pz, ph, pw = cfg.patch
        C = cfg.embed_dim
        Ht, Wt = cfg.hw_tokens
        Zt = cfg.z_tokens

        # --- patch embedding (convs stride=patch on the MXU) ---
        s = surface.transpose(1, 2, 0)  # (H, W, Cs+Cm)
        s = jnp.pad(s, ((0, (-cfg.lat) % ph), (0, 0), (0, 0)))
        s_tok = nn.Conv(C, (ph, pw), strides=(ph, pw), dtype=s.dtype, name="embed_surface")(s)

        u = upper.transpose(2, 3, 1, 0)  # (H, W, L, Vl)
        u = jnp.pad(
            u, ((0, (-cfg.lat) % ph), (0, 0), (0, (-cfg.levels) % pz), (0, 0))
        )
        u = u.transpose(2, 0, 1, 3)  # (Lp, Hp, W, Vl)
        u_tok = nn.Conv(
            C, (pz, ph, pw), strides=(pz, ph, pw), dtype=u.dtype, name="embed_upper"
        )(u)  # (Zu, Ht, Wt, C)

        x = jnp.concatenate([u_tok, s_tok[None]], axis=0)  # (Zt, Ht, Wt, C)

        def stage(x, depth, dim, heads, valid):
            xp, _ = W.pad_to_windows(x, cfg.window)
            for b in range(depth):
                xp = PanguBlock(
                    dim, heads, cfg.window, shifted=(b % 2 == 1),
                    mlp_ratio=cfg.mlp_ratio, valid=valid,
                )(xp)
            return xp[: valid[0], : valid[1], : valid[2]]

        valid_full = (Zt, Ht, Wt)
        x = stage(x, cfg.depths[0], C, cfg.num_heads[0], valid_full)
        skip = x
        x = DownSample(2 * C)(x)
        valid_half = (Zt, -(-Ht // 2), Wt // 2)
        x = stage(x, cfg.depths[1], 2 * C, cfg.num_heads[1], valid_half)
        x = stage(x, cfg.depths[2], 2 * C, cfg.num_heads[2], valid_half)
        x = UpSample(C, Ht)(x)
        x = stage(x, cfg.depths[3], C, cfg.num_heads[3], valid_full)
        x = jnp.concatenate([x, skip], axis=-1)  # (Zt, Ht, Wt, 2C)

        # --- patch recovery (transposed convs) ---
        s_out = nn.ConvTranspose(
            cfg.surface_channels, (ph, pw), strides=(ph, pw), dtype=x.dtype,
            name="recover_surface",
        )(x[-1])[: cfg.lat]  # (H, W, Cs)
        u_out = nn.ConvTranspose(
            cfg.level_vars, (pz, ph, pw), strides=(pz, ph, pw), dtype=x.dtype,
            name="recover_upper",
        )(x[:-1])[: cfg.levels, : cfg.lat]  # (L, H, W, Vl)
        return s_out.transpose(2, 0, 1), u_out.transpose(3, 0, 1, 2)


class PanguModel(PrognosticModel):
    """69-channel Pangu with hierarchical 6h/24h stepping.

    ``variant``: "pangu" (24h model every 4th step, 6h otherwise —
    the reference's default e2mip://pangu pairing), "pangu6", "pangu24".
    """

    name = "pangu"
    channels = ch.PANGU
    n_history = 1

    def __init__(self, variant: str = "pangu", cfg: PanguConfig | None = None):
        import datetime

        self.cfg = cfg or PanguConfig()
        self.variant = variant
        self.module = PanguNet(self.cfg)
        if variant == "pangu24":
            self.time_step = datetime.timedelta(hours=24)
        from skyrim_tpu.grid import LatLonGrid

        self.grid = LatLonGrid(self.cfg.lat, self.cfg.lon)
        # channel split indices (z,q,t,u,v × 13 levels, then surface)
        self._n_upper = self.cfg.levels * self.cfg.level_vars

    def _split(self, x):
        """(69, H, W) → surface (4, H, W), upper (5, 13, H, W)."""
        upper = x[: self._n_upper].reshape(
            self.cfg.level_vars, self.cfg.levels, *x.shape[-2:]
        )
        surface = x[self._n_upper :]
        return surface, upper

    def _merge(self, surface, upper):
        return jnp.concatenate([upper.reshape(self._n_upper, *surface.shape[-2:]), surface], axis=0)

    def init_params(self, rng):
        nc = len(self.channels)
        ks = jax.random.split(rng, 3)
        H, Wd = self.cfg.lat, self.cfg.lon
        surf = jnp.zeros((self.cfg.surface_channels + self.cfg.const_masks, H, Wd), jnp.float32)
        upper = jnp.zeros((self.cfg.level_vars, self.cfg.levels, H, Wd), jnp.float32)
        init = jax.jit(self.module.init)
        params = {
            "net6": init(ks[0], surf, upper)["params"],
            "norm": make_norm_params(nc),
            "consts": jnp.zeros((self.cfg.const_masks, H, Wd), jnp.float32),
        }
        if self.variant == "pangu":
            params["net24"] = init(ks[1], surf, upper)["params"]
        return params

    def _forward(self, net_params, params, x):
        """One network evaluation on a (C, H, W) state."""
        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        surface, upper = self._split(xn)
        surface = jnp.concatenate(
            [surface, params["consts"].astype(self.compute_dtype)], axis=0
        )
        s_out, u_out = self.module.apply({"params": net_params}, surface, upper)
        y = self._merge(s_out, u_out).astype(jnp.float32)
        return denormalize(params["norm"], y)

    def apply(self, params, x):
        return self._forward(params["net6"], params, x[-1])[None]

    def init_state(self, params, x0, rng=None, start_time=None):
        state = super().init_state(params, x0, rng, start_time=start_time)
        if self.variant == "pangu":
            # anchor: last state at a 24h boundary (for the 24h network)
            state = state.replace(extra={"anchor": state.x[-1]})
        return state

    def advance(self, params, state: ModelState):
        if self.variant != "pangu":
            return super().advance(params, state)

        def step24(_):
            y = self._forward(params["net24"], params, state.extra["anchor"])
            return y, y  # output, new anchor

        def step6(_):
            y = self._forward(params["net6"], params, state.x[-1])
            return y, state.extra["anchor"]

        # steps 1,2,3: 6h net; step 4 (completing 24h): 24h net from anchor
        is_24h = (state.step % 4) == 3
        y, anchor = jax.lax.cond(is_24h, step24, step6, None)
        new_state = state.replace(
            x=y[None],
            step=state.step + 1,
            time_days=state.time_days + self._step_days,
            extra={"anchor": anchor},
        )
        return new_state, y[None]
