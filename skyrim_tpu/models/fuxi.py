"""FuXi — U-Net + Swin-transformer cascade, TPU-native.

Re-implements the ONNX FuXi the reference wraps via earth2studio
(reference skyrim/core/models/fuxi.py:53-54): 70 channels
(fuxi.py:14-21), two input time steps, 6 h step, and a three-stage
cascade — separate short (0-5 d) / medium (5-10 d) / long (10-15 d)
models selected by lead time (fuxi.py:26-35).

Architecture follows Chen et al. 2023: space-time cube embedding of the
two input frames → downsample to 1/4 resolution → 48 Swin-V2
window-attention blocks at width 1536 (cosine attention + CPB MLP +
residual-post-norm, the published block flavor; ``attn_v2=False``
selects V1-style blocks sharing the fused Pallas kernels with Pangu) →
upsample + concat skip → output head.  The trunk is ``nn.scan`` over
shifted/unshifted block PAIRS — XLA compiles one pair and iterates 24×,
which is what lets the 1.37 B-parameter stage compile and run on the
chip (0.55 s/step full-res).  The cascade is a ``lax.switch`` over
per-stage parameter sets inside the scanned advance, so a 15-day
rollout stays on device.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from skyrim_tpu import channels as ch
from skyrim_tpu.grid import LatLonGrid
from skyrim_tpu.models.base import (
    ModelState,
    PrognosticModel,
    denormalize,
    make_norm_params,
    normalize,
)
from skyrim_tpu.ops import windows as W


@dataclasses.dataclass(frozen=True)
class FuXiConfig:
    """Published capacity (Chen et al. 2023, arXiv:2306.12873): the
    U-Transformer runs 48 Swin blocks at width 1536 on a 2×-downsampled
    token grid, between a cube embedding (patch 4) and an upsample with
    skip connection — ≈1.4 B parameters per cascade stage (the paper
    quotes ~1.5 B; see ARCH_FIDELITY.md for the derivation and
    deviations).  Reduced values are used by the test tier."""

    lat: int = 721
    lon: int = 1440
    in_channels: int = 70
    embed_dim: int = 1536  # transformer width (U-trunk)
    depth: int = 48
    num_heads: int = 24  # head_dim 64 (MXU-friendly)
    window: tuple[int, int] = (6, 12)
    patch: int = 4  # cube-embed spatial downsample
    n_stages: int = 3  # short / medium / long
    stage_steps: int = 20  # 5 days of 6h steps per stage
    # Published FuXi blocks are Swin-V2 (cosine attention with learned
    # logit scale + continuous-position-bias MLP, residual-post-norm) —
    # the default matches the released artifact so real checkpoints
    # convert core-for-core.  attn_v2=False selects the repo's shared
    # V1-style fused window-attention kernels (scaled dot product +
    # earth bias table) for paths that want the Pallas/lon-manual route.
    attn_v2: bool = True

    @property
    def cube_dim(self) -> int:
        """Width at cube-embed resolution (the U skip level)."""
        return self.embed_dim // 2

    @property
    def tokens(self) -> tuple[int, int]:
        return (-(-self.lat // self.patch), self.lon // self.patch)


class SwinBlock2D(nn.Module):
    """2D window attention block on (H, W, C) with periodic longitude.

    ``v2`` selects the Swin-V2 formulation (Liu et al. 2022): cosine
    attention with a per-head learned logit scale (clamped at 100), a
    2-layer continuous-position-bias MLP over log-spaced relative
    coordinates, and residual-post-norm (x + norm(f(x))).  The published
    FuXi uses exactly these blocks; the V1 path keeps the repo's shared
    fused Pallas kernels (scaled dot product + bias table).
    """

    dim: int
    heads: int
    window: tuple[int, int]
    shifted: bool
    valid_h: int
    v2: bool = False

    @nn.compact
    def __call__(self, x):  # (H, W, C) padded H
        if self.v2:
            return self._v2_block(x)
        return self._v1_block(x)

    def _dense(self, x, features: int, name: str):
        """nn.Dense, or the int8 MXU path when this block's weights
        arrive in the ``int8`` collection (quantize.split_dense_int8):
        int8×int8→int32 ``dot_general`` (measured 1.09-1.15× the bf16
        MXU rate on v5e) with the bf16 kernel never materialized —
        halving trunk weight HBM traffic."""
        if self.has_variable("int8", f"{name}_q"):
            from skyrim_tpu.quantize import QuantizedArray, int8_dot

            qa = QuantizedArray(
                q=self.get_variable("int8", f"{name}_q"),
                scale=self.get_variable("int8", f"{name}_scale"),
                dtype=str(x.dtype),
            )
            y = int8_dot(x, qa)
            return y + self.get_variable("int8", f"{name}_bias").astype(x.dtype)
        return nn.Dense(features, dtype=x.dtype, name=name)(x)

    def _v2_block(self, x):
        H, Wd, C = x.shape
        wh, ww = self.window
        win3 = (1, wh, ww)
        shift = (0, wh // 2 if self.shifted else 0, ww // 2 if self.shifted else 0)
        mask = W.shift_attention_mask((1, H, Wd), win3, shift, (1, self.valid_h, Wd))
        mask = jnp.asarray(mask) if mask is not None else None
        head_dim = self.dim // self.heads

        # continuous position bias: MLP(2 → 512 → heads) over log coords
        table_in = jnp.asarray(W.swin_v2_log_coords(self.window))
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(table_in)
        cpb = nn.Dense(self.heads, use_bias=False, dtype=jnp.float32,
                       name="cpb_fc2")(nn.relu(cpb))
        idx = W.swin_rel_index(self.window)
        bias = 16.0 * jax.nn.sigmoid(cpb)[idx]  # (wlen, wlen, heads)
        bias = bias.transpose(2, 0, 1)  # (heads, wlen, wlen)
        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(math.log(10.0)),
            (self.heads, 1, 1),
            jnp.float32,
        )
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))

        h = x[None]
        if self.shifted:
            h = jnp.roll(h, (-shift[1], -shift[2]), axis=(1, 2))
        parts = W.window_partition(h, win3)
        n_win, wlen, _ = parts.shape
        qkv = self._dense(parts, 3 * self.dim, "qkv")
        qkv = qkv.reshape(n_win, wlen, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        # cosine attention: normalized q·k scaled by the learned scale
        qn = q * jax.lax.rsqrt(
            jnp.sum(jnp.square(q).astype(jnp.float32), -1, keepdims=True) + 1e-12
        ).astype(q.dtype)
        kn = k * jax.lax.rsqrt(
            jnp.sum(jnp.square(k).astype(jnp.float32), -1, keepdims=True) + 1e-12
        ).astype(k.dtype)
        attn = jnp.einsum(
            "whqd,whkd->whqk", qn, kn, preferred_element_type=jnp.float32
        )
        attn = attn * scale[None] + bias[None].astype(attn.dtype)
        if mask is not None:
            nz, nh = mask.shape[:2]
            nw = n_win // (nz * nh)
            attn = attn.reshape(nz, nh, nw, self.heads, wlen, wlen)
            attn = attn + mask[:, :, None, None].astype(attn.dtype)
            attn = attn.reshape(n_win, self.heads, wlen, wlen)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "whqk,whkd->whqd", attn, v, preferred_element_type=jnp.float32
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(n_win, wlen, C)
        out = W.window_reverse(out, win3, (1, H, Wd))
        out = self._dense(out, self.dim, "proj")
        if self.shifted:
            out = jnp.roll(out, (shift[1], shift[2]), axis=(1, 2))
        # residual-post-norm (Swin-V2): x + norm(attn(x)), x + norm(mlp(x))
        x = x + nn.LayerNorm(dtype=x.dtype, name="norm1")(out[0])
        m = self._dense(x, self.dim * 4, "Dense_0")
        m = self._dense(nn.gelu(m), self.dim, "Dense_1")
        return x + nn.LayerNorm(dtype=x.dtype, name="norm2")(m)

    def _v1_block(self, x):
        from skyrim_tpu.ops.flash_window_attention import use_pallas

        H, Wd, C = x.shape
        wh, ww = self.window
        win3 = (1, wh, ww)
        shift = (0, wh // 2 if self.shifted else 0, ww // 2 if self.shifted else 0)

        mask = W.shift_attention_mask((1, H, Wd), win3, shift, (1, self.valid_h, Wd))
        mask = jnp.asarray(mask) if mask is not None else None
        head_dim = self.dim // self.heads
        bias_table = self.param(
            "rel_bias",
            nn.initializers.truncated_normal(0.02),
            (W.earth_bias_table_size(win3), self.heads),
        )
        bias = bias_table[W.earth_bias_index(win3)].transpose(2, 0, 1)

        if use_pallas():
            # whole block in ONE Pallas kernel — same fused path as
            # Pangu's PanguBlock (ops/fused_block.py): the activation
            # makes 2 HBM passes instead of ~30, the block commutes
            # with the shift roll, and the param holders share the XLA
            # path's checkpoint tree (path-seeded RNG → identical init).
            from skyrim_tpu.ops.fused_block import (
                DenseParams,
                LNParams,
                fused_swin_block_4d,
            )

            C = self.dim
            ln1 = LNParams(name="LayerNorm_0")(C)
            qw, qb = DenseParams(3 * C, name="qkv")(C)
            pw, pb = DenseParams(C, name="proj")(C)
            ln2 = LNParams(name="LayerNorm_1")(C)
            w1, b1 = DenseParams(C * 4, name="Dense_0")(C)
            w2, b2 = DenseParams(C, name="Dense_1")(C * 4)
            from skyrim_tpu.parallel import fused_shard as FS

            if FS.current() is not None:
                return FS.manual_swin_block(
                    x[None], ln1, (qw, qb), bias, mask, (pw, pb), ln2,
                    (w1, b1, w2, b2), win3, self.heads, shift=shift,
                )[0]
            from skyrim_tpu.ops.roll import shift_roll

            h = x[None]
            if self.shifted:
                h = shift_roll(h, shift, forward=True)
            h = fused_swin_block_4d(
                h, ln1, (qw, qb), bias, mask, (pw, pb), ln2,
                (w1, b1, w2, b2), win3, self.heads,
            )
            if self.shifted:
                h = shift_roll(h, shift, forward=False)
            return h[0]

        from skyrim_tpu.parallel import fused_shard as _FS

        assert _FS.current() is None, (
            "lon-manual regions require the fused Pallas path "
            "(set SKYRIM_FORCE_PALLAS=1 on CPU)"
        )
        h = nn.LayerNorm(dtype=x.dtype)(x)
        h = h[None]  # (1, H, W, C) reuse 3D helpers with Z=1
        if self.shifted:
            h = jnp.roll(h, (-shift[1], -shift[2]), axis=(1, 2))
        parts = W.window_partition(h, win3)
        n_win, wlen, _ = parts.shape
        qkv = self._dense(parts, 3 * self.dim, "qkv")
        qkv = qkv.reshape(n_win, wlen, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum(
            "whqd,whkd->whqk", q, k, preferred_element_type=jnp.float32
        )
        attn = attn * (head_dim**-0.5) + bias[None].astype(attn.dtype)
        if mask is not None:
            nz, nh = mask.shape[:2]
            nw = n_win // (nz * nh)
            attn = attn.reshape(nz, nh, nw, self.heads, wlen, wlen)
            attn = attn + mask[:, :, None, None].astype(attn.dtype)
            attn = attn.reshape(n_win, self.heads, wlen, wlen)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "whqk,whkd->whqd", attn, v, preferred_element_type=jnp.float32
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(n_win, wlen, C)
        out = W.window_reverse(out, win3, (1, H, Wd))
        out = self._dense(out, self.dim, "proj")
        if self.shifted:
            out = jnp.roll(out, (shift[1], shift[2]), axis=(1, 2))
        x = x + out[0]

        h = nn.LayerNorm(dtype=x.dtype)(x)
        h = nn.Dense(self.dim * 4, dtype=x.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=x.dtype)(h)
        return x + h


class SwinPair(nn.Module):
    """One unshifted + one shifted block — the body ``nn.scan`` repeats.

    Scanning pairs (instead of unrolling ``depth`` python blocks) is what
    makes the published 48×1536 trunk compile: XLA traces/compiles ONE
    pair and iterates it 24×, so compile time is O(1) in depth and the
    per-pair weights stream from HBM exactly as the unrolled form would.
    """

    dim: int
    heads: int
    window: tuple[int, int]
    valid_h: int
    v2: bool

    @nn.compact
    def __call__(self, x, _):
        x = SwinBlock2D(self.dim, self.heads, self.window, shifted=False,
                        valid_h=self.valid_h, v2=self.v2, name="a")(x)
        x = SwinBlock2D(self.dim, self.heads, self.window, shifted=True,
                        valid_h=self.valid_h, v2=self.v2, name="b")(x)
        return x, None


class FuXiNet(nn.Module):
    """U-Transformer: cube embed (patch p, width D/2) → 2×2 patch-merge
    down (width D) → ``depth`` Swin blocks → patch-expand up (width D/2)
    + skip concat → head.  Down/up are single GEMMs (SwinUNet-style
    patch merge/expand) rather than strided convs — the TPU-native
    formulation of the paper's U-Net down/up blocks (deviation noted in
    ARCH_FIDELITY.md)."""

    cfg: FuXiConfig

    @nn.compact
    def __call__(self, x):  # (hist·C, H, W) → (C, H, W)
        from skyrim_tpu.models.pangu import ConvParams
        from skyrim_tpu.ops.flash_window_attention import use_pallas

        cfg = self.cfg
        p = cfg.patch
        # token extents from the ACTUAL input: inside a lon-manual
        # shard_map region (parallel/fused_shard.py) x is this shard's
        # local lon chunk, so W-side geometry must not come from config
        Hin, Win = x.shape[1], x.shape[2]
        Ht, Wt = -(-Hin // p), Win // p
        Cin = x.shape[0]
        D = cfg.embed_dim
        Dc = cfg.cube_dim
        fused = use_pallas() and not self.is_initializing()
        h = x.transpose(1, 2, 0)
        h = jnp.pad(h, ((0, (-Hin) % p), (0, 0), (0, 0)))
        if fused:
            # patch embed as ONE GEMM — XLA's strided conv on this
            # geometry costs ~12 ms/step in T(2,128) layout relayouts
            # (measured with utils/op_stats); the kernel reshape is free
            # and scan-invariant.  Same math as nn.Conv (correlation,
            # stride = kernel = p).
            k, b = ConvParams((p, p, Cin, Dc), name="cube_embed")()
            pt = h.reshape(Ht, p, Wt, p, Cin).transpose(0, 2, 1, 3, 4)
            pt = pt.reshape(Ht * Wt, p * p * Cin)
            h = pt @ k.reshape(p * p * Cin, Dc).astype(h.dtype)
            h = (h + b.astype(h.dtype)).reshape(Ht, Wt, Dc)
        else:
            h = nn.Conv(Dc, (p, p), strides=(p, p), dtype=h.dtype,
                        name="cube_embed")(h)
        skip = h  # (Ht, Wt, D/2)

        # -- down: 2×2 patch merge to the U-trunk width -------------------
        He = Ht + (Ht % 2)  # even lat extent for the merge
        hd = jnp.pad(h, ((0, He - Ht), (0, 0), (0, 0)))
        Hd, Wd = He // 2, Wt // 2
        hd = hd.reshape(Hd, 2, Wd, 2, Dc).transpose(0, 2, 1, 3, 4)
        hd = hd.reshape(Hd, Wd, 4 * Dc)
        hd = nn.LayerNorm(dtype=hd.dtype, name="down_norm")(hd)
        hd = nn.Dense(D, use_bias=False, dtype=hd.dtype, name="down")(hd)

        hp = jnp.pad(hd, ((0, (-Hd) % cfg.window[0]), (0, 0), (0, 0)))
        assert cfg.depth % 2 == 0, "FuXi trunk depth must be even (shift pairs)"
        Pairs = nn.scan(
            SwinPair,
            # the int8 serving collection (quantize.split_dense_int8)
            # is stacked per pair exactly like the params it replaces
            variable_axes={"params": 0, "int8": 0},
            split_rngs={"params": True},
            length=cfg.depth // 2,
        )
        hp, _ = Pairs(
            cfg.embed_dim, cfg.num_heads, cfg.window, Hd, cfg.attn_v2,
            name="pairs",
        )(hp, None)
        hd = hp[:Hd]

        # -- up: patch expand + skip concat --------------------------------
        hu = nn.Dense(4 * Dc, use_bias=False, dtype=hd.dtype, name="up")(hd)
        hu = hu.reshape(Hd, Wd, 2, 2, Dc).transpose(0, 2, 1, 3, 4)
        hu = hu.reshape(He, Wt, Dc)[:Ht]
        hu = nn.LayerNorm(dtype=hu.dtype, name="up_norm")(hu)
        h = jnp.concatenate([hu, skip], axis=-1)  # (Ht, Wt, D)
        h = nn.Dense(Dc, dtype=h.dtype, name="fuse")(h)

        Cout = cfg.in_channels
        if fused:
            # patch recovery as one GEMM; flax ConvTranspose applies the
            # kernel spatially flipped (models/pangu.py grand_weights),
            # so flip here and converted checkpoints keep their layout
            kr, br = ConvParams((p, p, Dc, Cout), name="head")()
            wr = kr[::-1, ::-1].transpose(2, 0, 1, 3).reshape(Dc, p * p * Cout)
            y = h.reshape(Ht * Wt, Dc) @ wr.astype(h.dtype)
            y = y.reshape(Ht, Wt, p, p, Cout) + br.astype(h.dtype)
            y = y.transpose(0, 2, 1, 3, 4).reshape(Ht * p, Wt * p, Cout)
            h = y[:Hin]
        else:
            h = nn.ConvTranspose(
                Cout, (p, p), strides=(p, p), dtype=h.dtype, name="head"
            )(h)[:Hin]
        return h.transpose(2, 0, 1)


class FuXiModel(PrognosticModel):
    name = "fuxi"
    channels = ch.FUXI
    n_history = 2

    @property
    def lon_manual(self) -> bool:
        # the lon-manual shard_map path (parallel/fused_shard.py) drives
        # the V1-style fused kernels; Swin-V2 blocks shard via GSPMD
        return not self.cfg.attn_v2

    @property
    def lon_shard_divisor(self) -> int:
        # n lon shards must divide the HALF-resolution token width so
        # the U-trunk's 2×2 patch merge/expand stays shard-local
        return self.cfg.tokens[1] // 2

    def __init__(self, cfg: FuXiConfig | None = None):
        self.cfg = cfg or FuXiConfig()
        self.grid = LatLonGrid(self.cfg.lat, self.cfg.lon)
        if self.cfg.in_channels != len(self.channels):
            self.channels = tuple(f"c{i:02d}" for i in range(self.cfg.in_channels))
        self.module = FuXiNet(self.cfg)

    def init_params(self, rng):
        nc = self.cfg.in_channels
        dummy = jnp.zeros((self.n_history * nc, self.cfg.lat, self.cfg.lon), jnp.float32)
        init = jax.jit(self.module.init)
        ks = jax.random.split(rng, self.cfg.n_stages)
        # store weights bf16 at rest: compute is bf16 (weights are cast
        # at use sites, so this rounds once either way) and fp32
        # residency for three ~1.4 B stages would not fit a 16 GB chip
        to_bf16 = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
        )
        return {
            "stages": [to_bf16(init(k, dummy)["params"]) for k in ks],
            "norm": make_norm_params(nc),
        }

    def scan_cost_extra(self) -> tuple[float, float]:
        """Analytic (flops, bytes) of the trunk-scan iterations XLA's
        cost model does not count (it prices a while body once; the
        ``nn.scan`` trunk runs depth/2 pairs).  GEMM-only accounting:
        qkv 3C², proj C², MLP 8C² per token, plus window attention
        4·T·wlen·C; bytes = per-block weights (bf16) + the fused
        2-pass activation traffic — a lower bound for the XLA path,
        exact for the fused one."""
        cfg = self.cfg
        wh, ww = cfg.window
        Ht, Wt = cfg.tokens
        Hd, Wd = (Ht + Ht % 2) // 2, Wt // 2
        Hp = Hd + (-Hd) % wh
        T = Hp * Wd
        C = cfg.embed_dim
        wlen = wh * ww
        per_block_flops = 2 * T * C * (3 * C) + 2 * T * C * C \
            + 4 * T * C * (4 * C) + 4 * T * wlen * C
        per_block_bytes = 12 * C * C * 2 + 4 * T * C * 2
        uncounted = max(cfg.depth - 2, 0)  # XLA prices one pair (2 blocks)
        return (uncounted * per_block_flops, uncounted * per_block_bytes)

    def floor_params(self, params):
        """Parameters one step actually reads: ``lax.switch`` selects a
        single cascade stage, so the HBM floor counts one stage + norm,
        not every resident stage (the all-stages sum inflated the floor
        ~3x and could flip the roofline bound verdict)."""
        return {"stages": list(params["stages"][:1]), "norm": params["norm"]}

    def trim_stages(self, params, n_steps: int):
        """Drop cascade stages a rollout of ``n_steps`` can never reach —
        the device then holds only the needed stage weights (the
        TPU-native counterpart of the reference's sequential load/release
        swapping, ensemble.py:40-49)."""
        k = max(1, min(-(-n_steps // self.cfg.stage_steps), self.cfg.n_stages))
        return {**params, "stages": list(params["stages"][:k])}

    def quantize_params(self, params, min_size: int = 65536,
                        serve_int8: bool = False):
        """Weight-only int8 at rest for the cascade stages (norm stats
        stay exact).  Three ~1.37 B stages drop 8.2 → 4.1 GB resident;
        ``_forward`` dequantizes inside the taken ``lax.switch`` branch,
        so only the selected stage materializes in bf16 — a full 15-day
        cascade fits one 16 GB chip without ``trim_stages`` swapping
        (reference roadmap README.md:145 "quantization").

        ``serve_int8=True`` additionally routes the trunk's GEMMs
        (qkv/proj/MLP — ~99 % of the step FLOPs) through int8×int8→int32
        MXU matmuls via the ``int8`` flax collection: those kernels
        never materialize in bf16 at all, weight HBM traffic per step
        halves, and the int8 dots measure 1.09-1.15× the bf16 rate on
        v5e (quantize.py module docstring)."""
        from skyrim_tpu.quantize import quantize_tree, split_dense_int8

        if serve_int8 and not self.cfg.attn_v2:
            # only the Swin-V2 block consumes the int8 collection; the
            # V1 paths (fused Pallas holders / unnamed XLA Dense) would
            # hit ScopeParamNotFoundError on the removed kernels
            raise ValueError(
                "serve_int8 requires attn_v2=True (the Swin-V2 block is "
                "the int8-collection consumer); use the at-rest tier "
                "(serve_int8=False) for V1-style configs"
            )
        if not serve_int8:
            return {
                **params,
                "stages": [quantize_tree(s, min_size) for s in params["stages"]],
            }
        stages = []
        for s in params["stages"]:
            rest, int8 = split_dense_int8(s, min_size=min_size)
            stages.append({
                "params": quantize_tree(rest, min_size),
                "int8": int8 or {},
            })
        return {**params, "stages": stages}

    def _forward(self, net_params, params, x):
        from skyrim_tpu.quantize import maybe_dequantize

        if isinstance(net_params, dict) and "int8" in net_params:
            variables = {
                "params": maybe_dequantize(net_params["params"]),
                "int8": net_params["int8"],
            }
        else:
            variables = {"params": maybe_dequantize(net_params)}
        nc = self.cfg.in_channels
        xn = normalize(params["norm"], x).astype(self.compute_dtype)
        stacked = xn.reshape(self.n_history * nc, *x.shape[-2:])
        y = self.module.apply(variables, stacked).astype(jnp.float32)
        xlast = normalize(params["norm"], x[-1])
        return denormalize(params["norm"], xlast + y)

    def apply(self, params, x):
        return self._forward(params["stages"][0], params, x)[None]

    def advance(self, params, state: ModelState):
        """Cascade: pick the stage net by forecast step (short/medium/long).
        Honors ``trim_stages``-reduced trees (clamps to what's present);
        a single resident stage skips the switch entirely."""
        n_res = len(params["stages"])
        if n_res == 1:
            y = self._forward(params["stages"][0], params, state.x)
        else:
            stage = jnp.minimum(state.step // self.cfg.stage_steps, n_res - 1)
            branches = [
                (lambda p: (lambda _: self._forward(p, params, state.x)))(p)
                for p in params["stages"]
            ]
            y = jax.lax.switch(stage, branches, None)
        new_x = jnp.concatenate([state.x, y[None]], axis=0)[-self.n_history:]
        new_state = state.replace(
            x=new_x,
            step=state.step + 1,
            time_days=state.time_days + self._step_days,
        )
        return new_state, y[None]
