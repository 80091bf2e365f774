"""Post-training quantization (the reference's roadmap item,
reference README.md:145 "quantization" — never built there).

TPU-native design, two tiers:

* **Weight-only int8 at rest** — symmetric per-output-channel scales.
  The win on a 16 GB v5e is CAPACITY: FuXi's three ~1.37 B-parameter
  cascade stages are 8.2 GB resident in bf16 but 4.1 GB in int8; with
  dequantization INSIDE the stage ``lax.switch`` branch only the
  selected stage ever materializes in bf16, so a full 15-day cascade
  rollout fits a single chip without ``trim_stages`` swapping.  The
  per-step dequant cost is one stage's bytes (~1.4 GB ≈ 2 ms at HBM
  speed) against FuXi's 0.55 s compute-bound step — ~0.4 %.
* **int8×int8→int32 MXU matmuls** (``int8_dot``) — dynamic per-row
  activation scales.  MEASURED on the v5e through XLA (round 5,
  33k×1536×1536 GEMM loop): raw s8×s8→s32 runs 214 T/s vs bf16's
  182 TFLOP/s (1.09×), and 209 T/s end-to-end with the dynamic
  activation quantization (1.15×) — XLA's lowering does NOT reach the
  hardware's nominal 2× int8 rate.  The serving win is therefore the
  HBM side: trunk weights stream at half the bytes (FuXi: 2.7 →
  1.35 GB/step) on top of the ~15 % GEMM rate gain.

Everything is a pytree transform: ``quantize_tree`` /
``dequantize_tree`` round-trip any parameter pytree, skipping small or
1-D leaves (biases, norm stats, positional tables stay exact).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class QuantizedArray:
    """Symmetric int8 quantization of one array.

    ``q`` int8 with the source shape; ``scale`` f32 broadcastable to it
    (per-channel along the LAST axis).  ``dtype``/``shape`` are aux data
    (not traced) so dequantization restores the original array exactly
    in structure.
    """

    q: jax.Array
    scale: jax.Array
    dtype: Any = struct.field(pytree_node=False, default="bfloat16")

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.q.shape)) + int(np.prod(self.scale.shape)) * 4


def quantize_array(a: jax.Array, axis: int = -1) -> QuantizedArray:
    """Symmetric per-channel int8: q = round(a / s), s = amax/127 along
    every dim except ``axis`` (the output-channel dim of a weight)."""
    a = jnp.asarray(a)
    reduce_axes = tuple(i for i in range(a.ndim) if i != axis % a.ndim)
    amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(a.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QuantizedArray(q=q, scale=scale, dtype=str(a.dtype))


def dequantize_array(qa: QuantizedArray) -> jax.Array:
    return (qa.q.astype(jnp.float32) * qa.scale).astype(qa.dtype)


def _should_quantize(leaf, min_size: int) -> bool:
    if not hasattr(leaf, "shape") or not hasattr(leaf, "dtype"):
        return False
    if isinstance(leaf, QuantizedArray):
        return False
    try:
        dt = np.dtype(leaf.dtype)
    except TypeError:
        return False  # extended dtypes (PRNG keys)
    if dt not in (np.dtype(np.float32), np.dtype(jnp.bfloat16), np.dtype(np.float16)):
        return False
    return getattr(leaf, "ndim", 0) >= 2 and int(np.prod(leaf.shape)) >= min_size


def quantize_tree(tree, min_size: int = 65536, axis: int = -1):
    """int8-quantize every large (≥ ``min_size`` elements, ≥2-D) float
    leaf; small leaves (biases, layer norms, normalization stats) pass
    through exact."""
    return jax.tree.map(
        lambda a: quantize_array(a, axis) if _should_quantize(a, min_size) else a,
        tree,
    )


def dequantize_tree(tree):
    """Inverse of :func:`quantize_tree` (lossy: int8 rounding)."""
    return jax.tree.map(
        lambda a: dequantize_array(a) if isinstance(a, QuantizedArray) else a,
        tree,
        is_leaf=lambda a: isinstance(a, QuantizedArray),
    )


def is_quantized(tree) -> bool:
    return any(
        isinstance(a, QuantizedArray)
        for a in jax.tree.leaves(
            tree, is_leaf=lambda a: isinstance(a, QuantizedArray)
        )
    )


def maybe_dequantize(tree):
    """Dequantize if needed — models call this at the narrowest point
    (e.g. inside a cascade's ``lax.switch`` branch) so only the weights
    a step actually uses ever materialize in the compute dtype."""
    return dequantize_tree(tree) if is_quantized(tree) else tree


def tree_nbytes(tree) -> int:
    """Resident bytes of a (possibly partially quantized) pytree."""
    total = 0
    for a in jax.tree.leaves(tree, is_leaf=lambda a: isinstance(a, QuantizedArray)):
        if isinstance(a, QuantizedArray):
            total += a.nbytes
        elif hasattr(a, "shape"):
            try:
                itemsize = np.dtype(a.dtype).itemsize
            except TypeError:
                itemsize = 4
            total += int(np.prod(a.shape)) * itemsize
    return total


# ---------------------------------------------------------------------------
# int8 MXU matmul with dynamic activation scales
# ---------------------------------------------------------------------------


def int8_dot(x: jax.Array, w: QuantizedArray) -> jax.Array:
    """x (…, K) f32/bf16 @ quantized w (K, N) → (…, N) in x.dtype.

    Dynamic symmetric per-row activation quantization, then an
    int8×int8→int32 ``dot_general``, rescaled by (row scale × channel
    scale).  Measured v5e rate through XLA: 1.15× bf16 end-to-end
    (1.09× for the raw int8 dot — see module docstring); weight reads
    halve.
    """
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(ax > 0, ax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w.q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * w.scale.reshape(1, -1)
    return out.astype(x.dtype)


def split_dense_int8(
    tree,
    names: tuple = ("qkv", "proj", "Dense_0", "Dense_1"),
    min_size: int = 65536,
):
    """Split a flax params tree for the int8 SERVING path.

    Named Dense submodules whose kernels are large become flat int8
    variables at the parent scope — ``{name}_q`` (int8, per-output-
    channel symmetric), ``{name}_scale`` (f32, reduced over the
    contraction dim only, so stacked ``nn.scan`` kernels (P, K, N) get
    per-layer scales (P, 1, N)), ``{name}_bias`` (exact) — consumed by
    ``int8_dot`` inside the block (models/fuxi.py ``_dense``).  The
    weights never materialize in bf16 at all (vs the at-rest tier's
    in-branch dequantization) — halving their HBM traffic — and the
    int8 dot measures 1.09-1.15× the bf16 MXU rate on v5e (module
    docstring).

    Returns ``(rest, int8_tree)``: ``rest`` is the params tree with the
    converted Dense subtrees REMOVED (flax never reads them — the block
    branches on the int8 collection's presence).
    """

    def walk(t):
        if not isinstance(t, dict):
            return t, None
        rest, int8 = {}, {}
        for k, v in t.items():
            if (
                k in names
                and isinstance(v, dict)
                and "kernel" in v
                and getattr(v["kernel"], "ndim", 0) >= 2
                and int(np.prod(v["kernel"].shape)) >= min_size
            ):
                kr = jnp.asarray(v["kernel"], jnp.float32)
                amax = jnp.max(jnp.abs(kr), axis=-2, keepdims=True)
                scale = jnp.where(amax > 0, amax / 127.0, 1.0)
                q = jnp.clip(jnp.round(kr / scale), -127, 127).astype(jnp.int8)
                int8[f"{k}_q"] = q
                int8[f"{k}_scale"] = scale
                if "bias" in v:
                    int8[f"{k}_bias"] = v["bias"]
            else:
                r, i8 = walk(v)
                rest[k] = r
                if i8:
                    int8[k] = i8
        return rest, int8

    return walk(tree)
