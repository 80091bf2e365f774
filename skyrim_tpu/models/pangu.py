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


from skyrim_tpu.ops.flash_window_attention import use_pallas as _use_pallas


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
    def __call__(self, x, mask, params_only: bool = False):
        # x: (Z, H, W, C) padded to window multiples
        from skyrim_tpu.ops.flash_window_attention import (
            fused_window_attention_4d,
            reference_window_attention_qkv,
        )

        # Earth-specific bias: translation symmetry is broken along the
        # pressure-level and latitude axes, so every (z, lat) window
        # position carries its OWN table (windows differing only in lon
        # share it) — matching the published Pangu parameterization,
        # where these tables hold most of the model's parameters.
        # layout (n_types, heads, table): expansion is then a LAST-axis
        # gather straight into the kernel's (n_types, heads, wlen, wlen)
        # layout — no transpose of the 60 MB expanded tensor per step
        bias_table = self.param(
            "earth_bias",
            nn.initializers.truncated_normal(0.02),
            (self.n_type_windows, self.heads, W.earth_bias_table_size(self.window)),
        )
        bias = bias_table[:, :, W.earth_bias_index(self.window)]  # (nt, h, wlen, wlen)

        if params_only:
            # fused-block path (PanguBlock): hand the qkv/proj weights to
            # the whole-block kernel instead of computing here.  The
            # holders fetch the same param tree nn.Dense creates (init
            # always runs the XLA path below).
            from skyrim_tpu.ops.fused_block import DenseParams

            qw, qb = DenseParams(3 * self.dim, name="qkv")(self.dim)
            pw, pb = DenseParams(self.dim, name="proj")(self.dim)
            return qw, qb, pw, pb, bias

        Z, H, Wd, C = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=x.dtype, name="qkv")(x)

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
        mask = W.shift_attention_mask((Z, H, Wd), win, shift, self.valid)
        mask = jnp.asarray(mask) if mask is not None else None
        attn = EarthAttention3D(
            self.dim,
            self.heads,
            self.window,
            n_lon_windows=Wd // win[2],
            n_type_windows=(Z // win[0]) * (H // win[1]),
        )

        if _use_pallas():
            # whole block in ONE Pallas kernel (2 HBM passes instead of
            # ~30): LN/MLP/residual are per-token and attention sees the
            # same windows, so the block commutes with the shift roll —
            # roll in, run unshifted with the shift mask, roll back.
            # Runs during init too: the param holders declare the same
            # tree (path-seeded RNG → bit-identical values) as the XLA
            # path below, so checkpoints are interchangeable.
            from skyrim_tpu.ops.fused_block import (
                DenseParams,
                LNParams,
                fused_swin_block_4d,
            )

            ln1 = LNParams(name="LayerNorm_0")(C)
            qw, qb, pw, pb, bias = attn(None, None, params_only=True)
            ln2 = LNParams(name="LayerNorm_1")(C)
            hidden = int(self.dim * self.mlp_ratio)
            w1, b1 = DenseParams(hidden, name="Dense_0")(C)
            w2, b2 = DenseParams(self.dim, name="Dense_1")(hidden)
            from skyrim_tpu.parallel import fused_shard as FS

            if FS.current() is not None:
                # lon-sharded manual region: the block runs on the local
                # chunk with a ring cover gather; the shift folds into
                # the cover offsets (parallel/fused_shard.py)
                return FS.manual_swin_block(
                    x, ln1, (qw, qb), bias, mask, (pw, pb), ln2,
                    (w1, b1, w2, b2), win, self.heads, shift=shift,
                )
            from skyrim_tpu.ops.roll import shift_roll

            h = shift_roll(x, shift, forward=True) if self.shifted else x
            h = fused_swin_block_4d(
                h, ln1, (qw, qb), bias, mask, (pw, pb), ln2,
                (w1, b1, w2, b2), win, self.heads,
            )
            return shift_roll(h, shift, forward=False) if self.shifted else h

        from skyrim_tpu.parallel import fused_shard as _FS

        assert _FS.current() is None, (
            "lon-manual regions require the fused Pallas path "
            "(set SKYRIM_FORCE_PALLAS=1 on CPU)"
        )
        h = nn.LayerNorm(dtype=x.dtype)(x)
        if self.shifted:
            h = jnp.roll(h, (-shift[0], -shift[1], -shift[2]), axis=(0, 1, 2))
        h = attn(h, mask)
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

        if _use_pallas():
            # merge + LayerNorm + GEMM in one HBM pass — the XLA chain
            # below relayouts the full activation ~5× (ops/resample.py)
            from skyrim_tpu.ops.fused_block import DenseParams, LNParams
            from skyrim_tpu.ops.resample import fused_downsample

            ln = LNParams(name="LayerNorm_0")(4 * C)
            wb = DenseParams(self.dim_out, name="Dense_0")(4 * C)
            return fused_downsample(x, ln, wb)

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

        if _use_pallas():
            from skyrim_tpu.ops.fused_block import DenseParams, LNParams
            from skyrim_tpu.ops.resample import fused_upsample

            wb = DenseParams(4 * self.dim_out, name="Dense_0")(C)
            ln = LNParams(name="LayerNorm_0")(self.dim_out)
            return fused_upsample(x, wb, ln)[:, : self.out_h]

        x = nn.Dense(4 * self.dim_out, dtype=x.dtype)(x)
        x = x.reshape(Z, H, Wd, 2, 2, self.dim_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(Z, 2 * H, 2 * Wd, self.dim_out)
        x = x[:, : self.out_h]
        return nn.LayerNorm(dtype=x.dtype)(x)


class ConvParams(nn.Module):
    """Conv-shaped kernel+bias params WITHOUT running an XLA convolution.

    Param path, shape, and init match flax ``nn.Conv``/``nn.ConvTranspose``
    exactly (converted reference weights drop straight in); the forward
    pass consumes them inside the fused patch GEMM in PanguNet instead —
    XLA's conv on (…, 5)-channel inputs is HBM-bound and ~10× slower
    than the equivalent single GEMM (measured 33 ms vs ~5 ms per step).
    """

    kernel_shape: tuple[int, ...]

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (self.kernel_shape[-1],)
        )
        return k, b


class PanguNet(nn.Module):
    cfg: PanguConfig

    def setup(self):
        cfg = self.cfg
        pz, ph, pw = cfg.patch
        C = cfg.embed_dim
        Cs = cfg.surface_channels + cfg.const_masks
        self.embed_surface = ConvParams((ph, pw, Cs, C))
        self.embed_upper = ConvParams((pz, ph, pw, cfg.level_vars, C))
        self.recover_upper = ConvParams((pz, ph, pw, 2 * C, cfg.level_vars))
        self.recover_surface = ConvParams(
            (ph, pw, 2 * C, cfg.surface_channels)
        )

    def grand_weights(self) -> dict:
        """Expand the conv-shaped patch params into the grand embed /
        recover GEMM weights.  Pure function of the params — built once
        per parameter set into ``params["cache"]`` (the 14 strided
        scatter-sets cost ~9 ms/step if rebuilt inside the step)."""
        import numpy as np

        cfg = self.cfg
        pz, ph, pw = cfg.patch
        C = cfg.embed_dim
        Zt = cfg.z_tokens
        Zu = Zt - 1
        L, Vl = cfg.levels, cfg.level_vars
        n_up = L * Vl
        Cs = cfg.surface_channels + cfg.const_masks
        lanes = n_up + Cs
        Cout = n_up + cfg.surface_channels

        # --- patch embedding as ONE grand GEMM over (ph·pw·lanes) ---
        # Each z-token's 10 input channels (2 levels × 5 vars) are a
        # static lane subset, so the whole embedding (7 upper tokens +
        # the surface token) is a single (Ht·Wt, ph·pw·lanes) @
        # (ph·pw·lanes, Zt·C) matmul with a block-sparse weight built
        # from the conv-shaped params.
        ks, bs = self.embed_surface()
        ku, bu = self.embed_upper()
        Wg = jnp.zeros((ph, pw, lanes, Zt, C), ku.dtype)
        for zt in range(Zu):
            for lz in range(pz):
                level = pz * zt + lz
                if level >= L:
                    continue
                lane_idx = np.arange(Vl) * L + level
                Wg = Wg.at[:, :, lane_idx, zt, :].set(ku[lz])
        Wg = Wg.at[:, :, n_up:, Zu, :].set(ks)
        bias_g = jnp.concatenate([jnp.tile(bu[None], (Zu, 1)), bs[None]], axis=0)

        # --- patch recovery as one grand GEMM (inverse of the embed) ---
        kur, bur = self.recover_upper()
        ksr, bsr = self.recover_surface()
        # flax ConvTranspose(transpose_kernel=False) applies the kernel
        # spatially FLIPPED: out[s·h + d] = x[h] · K[k-1-d] — flip here
        # so converted reference checkpoints keep their conv layout.
        kur_f = kur[::-1, ::-1, ::-1]
        ksr_f = ksr[::-1, ::-1]
        Wr = jnp.zeros((Zt, 2 * C, ph, pw, Cout), kur.dtype)
        for zt in range(Zu):
            for lz in range(pz):
                level = pz * zt + lz
                if level >= L:
                    continue
                lane_idx = np.arange(Vl) * L + level
                Wr = Wr.at[zt, :, :, :, lane_idx].set(kur_f[lz].transpose(3, 2, 0, 1))
        Wr = Wr.at[Zu, :, :, :, n_up:].set(ksr_f.transpose(2, 0, 1, 3))
        bias_out = jnp.concatenate([jnp.repeat(bur, L), bsr])  # (Cout,)
        dt = jnp.bfloat16  # compute dtype for the GEMMs
        return {
            "Wg": Wg.reshape(ph * pw * lanes, Zt * C).astype(dt),
            "bias_g": bias_g.astype(dt),
            "Wr": Wr.reshape(Zt * 2 * C, ph * pw * Cout).astype(dt),
            "bias_out": bias_out.astype(dt),
        }

    @nn.compact
    def __call__(self, x72, gw: dict | None = None):
        """x72 (H, W, n_upper+Cs+Cm) normalized bf16 → (H, W, n_upper+Cs).

        Lane order matches the state contract: 65 upper-air channels
        (var-major: channel = var·13 + level), 4 surface, then the
        constant masks appended.  ``gw`` carries the precomputed grand
        GEMM weights (grand_weights); rebuilt inline when absent.
        """
        cfg = self.cfg
        pz, ph, pw = cfg.patch
        C = cfg.embed_dim
        # token extents from the ACTUAL input: inside a lon-manual
        # shard_map region (parallel/fused_shard.py) x72 is this shard's
        # local lon chunk, so W-side geometry must not come from config
        Hin, Win = x72.shape[0], x72.shape[1]
        Ht, Wt = -(-Hin // ph), Win // pw
        Zt = cfg.z_tokens
        L, Vl = cfg.levels, cfg.level_vars
        n_up = L * Vl
        Cs = cfg.surface_channels + cfg.const_masks
        lanes = n_up + Cs
        dt = x72.dtype
        if gw is None:
            gw = self.grand_weights()

        xp = jnp.pad(x72, ((0, (-Hin) % ph), (0, 0), (0, 0)))
        p = xp.reshape(Ht, ph, Wt, pw, lanes).transpose(0, 2, 1, 3, 4)
        p = p.reshape(Ht * Wt, ph * pw * lanes)
        tok = p @ gw["Wg"].astype(dt)
        tok = tok.reshape(Ht, Wt, Zt, C) + gw["bias_g"].astype(dt)
        x = tok.transpose(2, 0, 1, 3)  # (Zt, Ht, Wt, C)

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

        # --- patch recovery as one grand GEMM (inverse of the embed) ---
        Cout = n_up + cfg.surface_channels
        t = x.transpose(1, 2, 0, 3).reshape(Ht * Wt, Zt * 2 * C)
        y = t @ gw["Wr"].astype(dt)
        y = y.reshape(Ht, Wt, ph, pw, Cout) + gw["bias_out"].astype(dt)
        y = y.transpose(0, 2, 1, 3, 4).reshape(Ht * ph, Wt * pw, Cout)
        return y[:Hin]  # (H, W, n_upper + surface)


class PanguModel(PrognosticModel):
    """69-channel Pangu with hierarchical 6h/24h stepping.

    ``variant``: "pangu" (24h model every 4th step, 6h otherwise —
    the reference's default e2mip://pangu pairing), "pangu6", "pangu24".
    """

    name = "pangu"
    channels = ch.PANGU
    n_history = 1
    lon_manual = True  # whole-step shard_map path (parallel/fused_shard.py)

    @property
    def lon_shard_divisor(self) -> int:
        # n lon shards must divide the half-resolution token width so the
        # 2×2 patch merge (DownSample) stays local: n | Wt/2 ⟹ n | Wt,
        # (Wt/n) even, and n | cfg.lon
        return self.cfg.hw_tokens[1] // 2

    def __init__(self, variant: str = "pangu", cfg: PanguConfig | None = None):
        import datetime

        self.cfg = cfg or PanguConfig()
        self.variant = variant
        self.module = PanguNet(self.cfg)
        if variant == "pangu24":
            self.time_step = datetime.timedelta(hours=24)
        from skyrim_tpu.grid import LatLonGrid

        self.grid = LatLonGrid(self.cfg.lat, self.cfg.lon)

    def init_params(self, rng):
        nc = len(self.channels)
        ks = jax.random.split(rng, 3)
        H, Wd = self.cfg.lat, self.cfg.lon
        n_lanes = nc + self.cfg.const_masks
        x72 = jnp.zeros((H, Wd, n_lanes), jnp.float32)
        init = jax.jit(self.module.init)
        params = {
            "net6": init(ks[0], x72)["params"],
            "norm": make_norm_params(nc),
            "consts": jnp.zeros((self.cfg.const_masks, H, Wd), jnp.float32),
        }
        if self.variant == "pangu":
            params["net24"] = init(ks[1], x72)["params"]
        return self.prepare_params(params)

    def prepare_params(self, params):
        """Attach the precomputed grand embed/recover GEMM weights
        (pure functions of the conv params; ~9 ms/step to rebuild
        inline).  Stripped from checkpoints, rebuilt here on load."""
        if "cache" in params:
            return params
        build = jax.jit(
            lambda p: self.module.apply(
                {"params": p}, method=PanguNet.grand_weights
            )
        )
        params = dict(params)
        cache = {"gw6": build(params["net6"])}
        if "net24" in params:
            cache["gw24"] = build(params["net24"])
        params["cache"] = cache
        return params

    def param_count(self, params):
        return super().param_count(
            {k: v for k, v in params.items() if k != "cache"}
        )

    def _forward(self, net_params, params, x, gw=None):
        """One network evaluation on a (C, H, W) state."""
        from skyrim_tpu.parallel import fused_shard as FS

        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        # params are replicated; inside a lon-manual region the constant
        # masks must be cut down to this shard's lon chunk
        consts = FS.local_lon_slice(params["consts"], axis=-1)
        consts = consts.astype(self.compute_dtype)
        x72 = jnp.concatenate([xn, consts], axis=0).transpose(1, 2, 0)
        y = self.module.apply({"params": net_params}, x72, gw)
        y = y.transpose(2, 0, 1).astype(jnp.float32)
        return denormalize(params["norm"], y)

    def apply(self, params, x):
        gw = params.get("cache", {}).get("gw6")
        return self._forward(params["net6"], params, x[-1], gw)[None]

    def init_state(self, params, x0, rng=None, start_time=None):
        state = super().init_state(params, x0, rng, start_time=start_time)
        if self.variant == "pangu":
            # anchor: last state at a 24h boundary (for the 24h network)
            state = state.replace(extra={"anchor": state.x[-1]})
        return state

    def advance(self, params, state: ModelState):
        if self.variant != "pangu":
            return super().advance(params, state)

        cache = params.get("cache", {})

        def step24(_):
            y = self._forward(
                params["net24"], params, state.extra["anchor"], cache.get("gw24")
            )
            return y, y  # output, new anchor

        def step6(_):
            y = self._forward(
                params["net6"], params, state.x[-1], cache.get("gw6")
            )
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
