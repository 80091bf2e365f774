"""Full-resolution numerical-stability harness (SURVEY §7 hard part 1).

The reference never validates long-rollout numerics at all (its models
are frozen upstream artifacts, e.g. /root/reference/skyrim/core/models/
pangu.py delegates to earth2mip); here the model math is ours, so
stability is a tested property:

1. ``stability_rollout`` — N full-resolution steps on device from a
   climatological synthetic IC, with the model's normalization stats
   set to the SAME climatology (data/ic.py ``climatology_stats``), so
   the net sees ~N(0,1) inputs exactly as a trained artifact would.
   A stats-only ``lax.scan`` carries per-step normalized-space RMS /
   max-abs / finite flags and never materializes the output stack
   (40 full-res frames would be ~11 GiB — more than the chip's HBM).

2. ``precision_divergence`` — the same rollout in the production
   compute dtype (bf16) vs fp32 with ``jax.default_matmul_precision
   ("highest")``, reporting per-step relative L2 divergence in
   normalized space: the closest offline proxy to an
   allclose-against-reference check.
"""

from __future__ import annotations

import datetime
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from skyrim_tpu.models.base import PrognosticModel, make_norm_params, normalize


def climatological_norm(channels) -> dict:
    """Norm params whose stats match data/ic.py's synthetic climatology."""
    from skyrim_tpu.data.ic import climatology_stats

    stats = [climatology_stats(c) for c in channels]
    return make_norm_params(
        len(channels),
        mean=[m for m, _ in stats],
        std=[s for _, s in stats],
    )


def climatological_params(model: PrognosticModel, rng: jax.Array) -> Any:
    """init_params with normalization stats pinned to the climatology."""
    params = model.init_params(rng)
    params = dict(params)
    params["norm"] = climatological_norm(model.channels)
    return params


def synthetic_ic(model: PrognosticModel, when: datetime.datetime | None = None):
    """Climatology-shaped IC at the model's own grid/channels (f32)."""
    from skyrim_tpu.data.ic import SyntheticSource

    when = when or datetime.datetime(2024, 1, 1)
    src = SyntheticSource(list(model.channels), grid=model.grid)
    f = src.fetch(when, n_history=model.n_history, time_step=model.time_step)
    return np.asarray(f.values, np.float32)


def stability_rollout(
    model: PrognosticModel,
    params: Any,
    x0: np.ndarray,
    n_steps: int,
) -> dict:
    """N steps on device; returns per-step normalized-space statistics.

    Keys: ``rms`` (normalized RMS per step), ``amax`` (normalized
    max-abs), ``finite`` (bool per step), plus summary fields
    ``growth_per_step_geo`` (geometric-mean step-to-step RMS ratio over
    the second half — the monotone-drift detector) and ``all_finite``.
    """
    n_calls = -(-n_steps // model.frames_out)

    # params enter as a jit ARGUMENT (closing over them would bake 256 MB
    # of weights into the program as constants — the tunneled remote
    # compile rejects such uploads with HTTP 413)
    @jax.jit
    def run(params, state):
        norm = params["norm"]

        def body(state, _):
            new_state, y = model.advance(params, state)
            yn = normalize(norm, y.astype(jnp.float32))
            stats = (
                jnp.sqrt(jnp.mean(yn**2)),
                jnp.max(jnp.abs(yn)),
                jnp.all(jnp.isfinite(y)),
            )
            return new_state, stats

        _, (rms, amax, finite) = jax.lax.scan(body, state, None, length=n_calls)
        return rms, amax, finite

    state = model.init_state(params, jnp.asarray(x0))
    rms, amax, finite = jax.tree.map(
        lambda a: np.asarray(a, np.float64), run(params, state)
    )
    rms = rms.astype(float)
    second_half = rms[len(rms) // 2 :]
    ratios = second_half[1:] / np.maximum(second_half[:-1], 1e-30)
    growth = float(np.exp(np.mean(np.log(np.maximum(ratios, 1e-30))))) if len(
        ratios
    ) else 1.0
    return {
        "n_steps": int(n_calls * model.frames_out),
        "rms": [float(v) for v in rms],
        "amax": [float(v) for v in amax],
        "finite": [bool(v) for v in finite],
        "all_finite": bool(np.all(finite)),
        "growth_per_step_geo": growth,
    }


def _with_compute_dtype(model: PrognosticModel, dtype) -> PrognosticModel:
    """A sibling instance of ``model`` whose compute dtype is ``dtype``.

    compute_dtype is a class attribute some models (GraphCast) consume
    at construction time, so a dynamic subclass re-instantiates cleanly.
    """
    cls = type(model)
    sub = type(f"{cls.__name__}_{np.dtype(dtype).name}", (cls,), {
        "compute_dtype": dtype,
    })
    if hasattr(model, "variant"):
        return sub(model.variant, cfg=getattr(model, "cfg", None))
    if getattr(model, "cfg", None) is not None:
        return sub(model.cfg)
    return sub()


def precision_divergence(
    model: PrognosticModel,
    params: Any,
    x0: np.ndarray,
    n_steps: int,
    make_fp32: Callable[[PrognosticModel], PrognosticModel] | None = None,
) -> dict:
    """Per-step relative L2 between bf16 and fp32(highest) rollouts.

    Runs step-by-step (two resident states, no output stacks); the
    fp32 trace additionally pins ``jax.default_matmul_precision`` to
    "highest" so its matmuls run full-precision even on MXU hardware.
    """
    norm = params["norm"]
    model_fp = (make_fp32 or _with_compute_dtype)(model, jnp.float32)

    step_bf = jax.jit(lambda p, s: model.advance(p, s))

    def _fp(p, s):
        with jax.default_matmul_precision("highest"):
            return model_fp.advance(p, s)

    step_fp = jax.jit(_fp)

    @jax.jit
    def rel_l2(ya, yb):
        a = normalize(norm, ya.astype(jnp.float32))
        b = normalize(norm, yb.astype(jnp.float32))
        return jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12)

    sa = model.init_state(params, jnp.asarray(x0))
    sb = model_fp.init_state(params, jnp.asarray(x0))
    curve = []
    for _ in range(-(-n_steps // model.frames_out)):
        sa, ya = step_bf(params, sa)
        sb, yb = step_fp(params, sb)
        curve.append(float(rel_l2(ya, yb)))
    return {"n_steps": n_steps, "rel_l2": curve}
