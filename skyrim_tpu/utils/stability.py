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
    """N steps on device; returns per-advance-call statistics.

    Keys: ``rms`` (normalized RMS), ``amax`` (normalized max-abs),
    ``finite`` (bool) — ONE ENTRY PER ``advance`` CALL (for a
    frames_out > 1 model each entry covers that call's whole frame
    bundle; ``n_calls`` is the array length, ``n_steps`` the total
    frames advanced).  Summary fields: ``growth_per_step_geo``
    (geometric-mean call-to-call RMS ratio over the second half — the
    monotone-drift detector) and ``all_finite``.
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
        "n_calls": int(n_calls),
        "rms": [float(v) for v in rms],
        "amax": [float(v) for v in amax],
        "finite": [bool(v) for v in finite],
        "all_finite": bool(np.all(finite)),
        "growth_per_step_geo": growth,
    }


def _with_compute_dtype(
    model: PrognosticModel, dtype, **cfg_overrides
) -> PrognosticModel:
    """A sibling instance of ``model`` whose compute dtype is ``dtype``.

    compute_dtype is a class attribute some models (GraphCast) consume
    at construction time, so a dynamic subclass re-instantiates cleanly.
    ``cfg_overrides`` are dataclasses.replace'd into the model config —
    e.g. a higher ``edge_chunks`` for the fp32 GraphCast leg, whose
    doubled activation footprint otherwise exhausts HBM at full res.
    """
    import dataclasses

    cls = type(model)
    sub = type(f"{cls.__name__}_{np.dtype(dtype).name}", (cls,), {
        "compute_dtype": dtype,
    })
    cfg = getattr(model, "cfg", None)
    if cfg is not None and cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    if hasattr(model, "variant"):
        return sub(model.variant, cfg=cfg)
    if cfg is not None:
        return sub(cfg)
    return sub()


def precision_divergence(
    model: PrognosticModel,
    params: Any,
    x0: np.ndarray,
    n_steps: int,
    make_fp32: Callable[..., PrognosticModel] | None = None,
    fp32_cfg_overrides: dict | None = None,
    fp32_pallas: bool = False,
    sequential: bool = False,
    fp32_device: str | None = None,
    fp32_strip_cache: bool = False,
    fp32_share_cache: bool = False,
) -> dict:
    """Per-step relative L2 between bf16 and fp32(highest) rollouts.

    Runs step-by-step (two resident states, no output stacks); the
    fp32 trace additionally pins ``jax.default_matmul_precision`` to
    "highest" so its matmuls run full-precision even on MXU hardware.

    The fp32 leg is traced with the fused Pallas kernels DISABLED
    (``SKYRIM_NO_PALLAS``): their VMEM block shapes are tuned for bf16
    and some (GraphCast g2m) exceed the scoped-VMEM limit at f32, and
    the XLA fallback is the parity-tested reference path anyway — so
    the comparison is production-kernels-bf16 vs reference-XLA-fp32,
    an implementation-independent truth source.

    ``fp32_pallas=True`` keeps the kernels on for the fp32 leg instead —
    for models whose XLA fallback materializes edge-sized intermediates
    that exceed HBM at f32 full-res (GraphCast); the scoped-VMEM limit
    is raised per-compile (``xla_tpu_scoped_vmem_limit_kib``) so the
    bf16-tuned f32 kernel blocks fit the 128 MiB physical VMEM.

    ``sequential=True`` runs the two legs one after the other, staging
    the bf16 outputs on the host and DELETING the bf16 derived cache
    (``params["cache"]`` device buffers — the passed params must not be
    reused afterwards) before the fp32 leg is built: models with
    multi-GiB edge caches (GraphCast: ~5 GiB bf16 + ~10 GiB fp32)
    cannot hold both legs resident on one 16 GiB chip.

    ``fp32_device`` (e.g. ``"cpu"``) places the ENTIRE fp32 leg — cache
    build, compile, and stepping — on that backend via
    ``jax.default_device``.  GraphCast's fp32 caches alone are ~12.8 GiB
    and exhaust a 16 GiB chip even sequentially; the host's RAM is not
    so constrained, and a CPU-backend fp32 leg is additionally a
    CROSS-BACKEND truth source (different compiler lowering entirely).
    Implies the non-Pallas XLA fallback for that leg.  (On this 2-core
    host a full-res CPU leg takes hours — ``fp32_strip_cache`` below is
    the practical on-chip alternative.)

    ``fp32_strip_cache`` drops the derived edge-bias cache from the
    fp32 leg's params instead: the step recomputes the biases IN-GRAPH
    each call (models/graphcast.py handles ``cache=None``).  In
    practice the recompute inlines the static edge tables as ~150 MB of
    program constants and the tunneled remote compiler rejects the
    upload — kept for non-tunneled deployments.

    ``fp32_share_cache`` reuses the bf16 leg's DERIVED cache for the
    fp32 leg (kernels upcast the static biases at read; the stateful
    entries cast to f32 in the model).  Both legs then see IDENTICAL
    static-bias inputs and the curve isolates STEP-COMPUTE precision —
    the quantity that actually accumulates over a rollout — while
    peak HBM stays ~bf16-cache + fp32 step (~10 GiB, fits the chip).
    """
    import contextlib
    import os

    if fp32_device and not sequential:
        raise ValueError("fp32_device requires sequential=True "
                         "(the legs live on different backends)")
    norm = params["norm"]
    if make_fp32 is not None:
        model_fp = make_fp32(model, jnp.float32)
    else:
        model_fp = _with_compute_dtype(
            model, jnp.float32, **(fp32_cfg_overrides or {})
        )

    n_calls = -(-n_steps // model.frames_out)
    # donate the state: the new state aliases the old buffer, shaving
    # one full state copy off peak HBM (the GraphCast fp32 leg sits at
    # ~15.3 GiB of a 16 GiB chip without it)
    step_bf = jax.jit(lambda p, s: model.advance(p, s), donate_argnums=(1,))

    norm_np = {
        "mean": np.asarray(norm["mean"], np.float32),
        "std": np.asarray(norm["std"], np.float32),
    }

    def _host_rel_l2(ya, yb):
        a = (ya - norm_np["mean"]) / norm_np["std"]
        b = (yb - norm_np["mean"]) / norm_np["std"]
        return float(
            np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        )

    bf16_host: list[np.ndarray] = []
    if sequential:
        # leg A fully first; outputs go to host, device buffers freed
        sa = model.init_state(params, jnp.asarray(x0))
        for _ in range(n_calls):
            sa, ya = step_bf(params, sa)
            bf16_host.append(np.asarray(ya, np.float32))
        del sa  # (ya only exists when n_calls > 0)
        if n_calls:
            del ya
        # the tiled bf16 cache survives only when the fp32 leg shares
        # it verbatim (share + pallas); the share + fallback mode
        # rebuilds a plan-layout bf16 cache instead, so free this one
        if (not (fp32_share_cache and fp32_pallas)
                and isinstance(params, dict) and "cache" in params):
            for leaf in jax.tree.leaves(params["cache"]):
                if hasattr(leaf, "delete"):
                    leaf.delete()

    def _make_params_fp():
        # derived caches (params["cache"]) are config- and dtype-shaped —
        # rebuild them for the fp32 model
        if isinstance(params, dict) and "cache" in params:
            return model_fp.prepare_params(
                {k: v for k, v in params.items() if k != "cache"}
            )
        return params

    dev_ctx = (
        jax.default_device(jax.devices(fp32_device)[0])
        if fp32_device else contextlib.nullcontext()
    )

    def _fp(p, s):
        with jax.default_matmul_precision("highest"):
            return model_fp.advance(p, s)

    with dev_ctx:
        if fp32_device:
            # host copies of the source weights so cache build and
            # stepping never touch the accelerator
            base = jax.tree.map(
                lambda a: np.asarray(a) if hasattr(a, "shape") else a,
                {k: v for k, v in params.items() if k != "cache"},
            ) if isinstance(params, dict) else params
            prev = os.environ.get("SKYRIM_NO_PALLAS")
            os.environ["SKYRIM_NO_PALLAS"] = "1"
            try:
                params_fp = model_fp.prepare_params(dict(base))
                sb0 = model_fp.init_state(params_fp, jnp.asarray(x0))
                step_fp = jax.jit(_fp).lower(params_fp, sb0).compile()
            finally:
                if prev is None:
                    os.environ.pop("SKYRIM_NO_PALLAS", None)
                else:
                    os.environ["SKYRIM_NO_PALLAS"] = prev
        else:
            if (fp32_share_cache and not fp32_pallas
                    and isinstance(params, dict)):
                # fp32 XLA-fallback leg with a BF16 cache in the
                # fallback's (plan) layout: 4.9 GiB resident vs 6.7
                # tiled / 12.8 f32, and the chunk-scanned fallback
                # bounds step temps — the only combination measured to
                # fit GraphCast's fp32 leg on the 16 GiB chip.  Built
                # by the BF16 model under SKYRIM_NO_PALLAS (the tiled
                # leg-A cache was deleted above).
                prev = os.environ.get("SKYRIM_NO_PALLAS")
                os.environ["SKYRIM_NO_PALLAS"] = "1"
                try:
                    # cache built by a bf16 sibling carrying the SAME
                    # cfg overrides as the fp32 model (an edge_chunks
                    # override changes the cache's chunk layout)
                    model_bf = _with_compute_dtype(
                        model, model.compute_dtype,
                        **(fp32_cfg_overrides or {}),
                    )
                    params_fp = model_bf.prepare_params(
                        {k: v for k, v in params.items() if k != "cache"}
                    )
                finally:
                    if prev is None:
                        os.environ.pop("SKYRIM_NO_PALLAS", None)
                    else:
                        os.environ["SKYRIM_NO_PALLAS"] = prev
            elif fp32_share_cache and isinstance(params, dict):
                params_fp = dict(params)  # bf16 cache shared verbatim
            elif fp32_strip_cache and isinstance(params, dict):
                params_fp = {k: v for k, v in params.items() if k != "cache"}
            elif not fp32_pallas:
                # the fp32 leg compiles under SKYRIM_NO_PALLAS, so its
                # derived cache must be built in the SAME (plan) layout
                prev = os.environ.get("SKYRIM_NO_PALLAS")
                os.environ["SKYRIM_NO_PALLAS"] = "1"
                try:
                    params_fp = _make_params_fp()
                finally:
                    if prev is None:
                        os.environ.pop("SKYRIM_NO_PALLAS", None)
                    else:
                        os.environ["SKYRIM_NO_PALLAS"] = prev
            else:
                params_fp = _make_params_fp()
            sb0 = model_fp.init_state(params_fp, jnp.asarray(x0))
            if fp32_pallas:
                step_fp = jax.jit(_fp, donate_argnums=(1,)).lower(
                    params_fp, sb0
                ).compile(
                    compiler_options={"xla_tpu_scoped_vmem_limit_kib": 130048}
                )
            else:
                prev = os.environ.get("SKYRIM_NO_PALLAS")
                os.environ["SKYRIM_NO_PALLAS"] = "1"
                try:
                    # AOT-compile the fp32 leg while the env guard is
                    # active — use_pallas() is consulted at trace time
                    step_fp = jax.jit(_fp, donate_argnums=(1,)).lower(
                        params_fp, sb0
                    ).compile()
                finally:
                    if prev is None:
                        os.environ.pop("SKYRIM_NO_PALLAS", None)
                    else:
                        os.environ["SKYRIM_NO_PALLAS"] = prev

        curve = []
        if sequential:
            sb = sb0
            for t in range(n_calls):
                sb, yb = step_fp(params_fp, sb)
                curve.append(
                    _host_rel_l2(bf16_host[t], np.asarray(yb, np.float32))
                )
            return {
                "n_steps": n_steps, "rel_l2": curve, "mode": "sequential",
                "fp32_device": fp32_device or "default",
            }

    @jax.jit
    def rel_l2(ya, yb):
        a = normalize(norm, ya.astype(jnp.float32))
        b = normalize(norm, yb.astype(jnp.float32))
        return jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12)

    sa = model.init_state(params, jnp.asarray(x0))
    sb = sb0
    for _ in range(n_calls):
        sa, ya = step_bf(params, sa)
        sb, yb = step_fp(params_fp, sb)
        curve.append(float(rel_l2(ya, yb)))
    return {"n_steps": n_steps, "rel_l2": curve}


def perturbation_control(
    model: PrognosticModel,
    params: Any,
    x0: np.ndarray,
    n_steps: int,
    eps: float = 1e-6,
) -> dict:
    """fp-identical control: same dtype/kernels, ε-perturbed IC.

    Runs TWO rollouts at the model's production dtype from ``x0`` and
    ``x0 + ε·std·noise`` and reports the per-step relative L2 between
    them in normalized space.  This isolates the model's chaotic
    amplification (Lyapunov growth) from precision error: if the
    bf16-vs-fp32 divergence curve (``precision_divergence``) grows at
    the same rate as this control, the divergence is chaos amplifying
    the initial rounding difference — not accumulating kernel error —
    and the achievable step-N allclose tolerance against any reference
    is bounded below by ε·(growth rate)^N regardless of implementation.
    """
    rng = np.random.default_rng(0)
    std = np.asarray(params["norm"]["std"], np.float32)
    noise = rng.standard_normal(x0.shape).astype(np.float32)
    x0p = x0 + eps * std.reshape((1, -1) + (1,) * (x0.ndim - 2)) * noise

    n_calls = -(-n_steps // model.frames_out)
    step = jax.jit(lambda p, s: model.advance(p, s))
    norm = params["norm"]

    @jax.jit
    def rel_l2(ya, yb):
        a = normalize(norm, ya.astype(jnp.float32))
        b = normalize(norm, yb.astype(jnp.float32))
        return jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12)

    sa = model.init_state(params, jnp.asarray(x0))
    sb = model.init_state(params, jnp.asarray(x0p))
    curve = []
    for _ in range(n_calls):
        sa, ya = step(params, sa)
        sb, yb = step(params, sb)
        curve.append(float(rel_l2(ya, yb)))
    growth = (
        (curve[-1] / max(curve[0], 1e-30)) ** (1.0 / max(len(curve) - 1, 1))
        if len(curve) > 1 else 1.0
    )
    # tolerance floor implied at the LAST step for an IC that differs
    # by one bf16 ulp (~4e-3 relative).  For eps ABOVE the ulp the
    # curve scales ~linearly in eps, so downscale; for sub-ulp eps the
    # trajectory difference is already dominated by per-step bf16
    # rounding (the r05 artifacts show step-1 divergence saturating at
    # the same ~1 % as the bf16-vs-fp32 curve) — the measured curve IS
    # the rounding-noise floor, so no upscaling is valid.
    implied = float(curve[-1] * min(4e-3 / eps, 1.0)) if curve else None
    return {
        "n_steps": n_steps, "eps": eps, "rel_l2": curve,
        "growth_per_step": float(growth),
        "implied_bf16_floor_last_step": implied,
    }  # fmt: skip


def delta_decomposition(
    model: PrognosticModel,
    params: Any,
    x0: np.ndarray,
    n_steps: int,
) -> dict:
    """Per-step RMS of the state AND of the state increment.

    Separates two benign random-weight behaviors from genuine
    numerical defects:

    * residual models (GraphCast, Pangu): an untrained net's increment
      is dominated by its response to the STATIC inputs (geometry
      features, biases), which repeats every step — uncorrelated parts
      random-walk (rms² ≈ rms₀² + t·rms_Δ²), a converged constant
      pattern accumulates LINEARLY (rms ≈ b·t).  Both are
      sub-exponential; a per-step geometric ratio misreads either as
      monotone drift (GraphCast r05: linear fit rel-err 0.003 with
      slope ≈ the constant increment rms — drift, not instability);
    * direct-prediction models (SFNO): an untrained net is a spectral
      contraction, so the state decays geometrically toward the net's
      fixed point.

    Returns per-call ``rms`` (state), ``rms_delta`` (increment), the
    random-walk fit residual ``walk_fit_rel_err``, the LINEAR fit
    (``linear_fit_rel_err``, ``linear_slope`` — compare the slope to
    median rms_delta), and ``contraction_ratio`` (mean rms ratio) for
    the decay case.  Small fit residual (≲0.1) identifies the regime.
    """
    n_calls = -(-n_steps // model.frames_out)
    norm = params["norm"]

    @jax.jit
    def run(params, state):
        def body(carry, _):
            state, prev = carry
            new_state, y = model.advance(params, state)
            yn = normalize(norm, y.astype(jnp.float32))
            stats = (
                jnp.sqrt(jnp.mean(yn**2)),
                jnp.sqrt(jnp.mean((yn - prev) ** 2)),
            )
            return (new_state, yn), stats

        # prev carries one frame bundle per advance call (frames_out
        # frames) so the carry structure matches body's yn for
        # multi-frame models (DLWP emits 2 frames/call)
        x_last = normalize(norm, state.x[-1].astype(jnp.float32))
        prev0 = jnp.broadcast_to(
            x_last[None], (model.frames_out, *x_last.shape)
        )
        (_, _), (rms, rms_d) = jax.lax.scan(
            body, (state, prev0), None, length=n_calls
        )
        return rms, rms_d

    state = model.init_state(params, jnp.asarray(x0))
    rms, rms_d = jax.tree.map(lambda a: np.asarray(a, float), run(params, state))
    # random-walk fit: rms(t)^2 vs rms(0)^2 + t * median(rms_delta^2)
    t = np.arange(1, len(rms) + 1, dtype=float)
    pred = np.sqrt(rms[0] ** 2 + (t - 1) * float(np.median(rms_d**2)))
    fit_err = float(
        np.linalg.norm(rms - pred) / (np.linalg.norm(rms) + 1e-12)
    )
    ratios = rms[1:] / np.maximum(rms[:-1], 1e-30)
    # linear drift fit: rms(t) ≈ a + b·t — the converged-constant-
    # increment regime has b ≈ median(rms_delta)
    A = np.vstack([t, np.ones_like(t)]).T
    coef, *_ = np.linalg.lstsq(A, rms, rcond=None)
    lin_err = float(
        np.linalg.norm(rms - A @ coef) / (np.linalg.norm(rms) + 1e-12)
    )
    return {
        "rms": [float(v) for v in rms],
        "rms_delta": [float(v) for v in rms_d],
        "walk_fit_rel_err": fit_err,
        "linear_fit_rel_err": lin_err,
        "linear_slope": float(coef[0]),
        "contraction_ratio": float(np.mean(ratios)) if len(ratios) else 1.0,
    }


def params_divergence(
    model: PrognosticModel,
    params_a: Any,
    params_b: Any,
    x0: np.ndarray,
    n_steps: int,
) -> dict:
    """Per-step relative L2 between rollouts of the SAME model under two
    parameter trees (e.g. bf16 vs int8-at-rest weights) — the
    weight-quantization analog of ``precision_divergence``: same
    compute dtype and kernels, only the weights differ."""
    n_calls = -(-n_steps // model.frames_out)
    norm = params_a["norm"]
    step = jax.jit(lambda p, s: model.advance(p, s))

    @jax.jit
    def rel_l2(ya, yb):
        a = normalize(norm, ya.astype(jnp.float32))
        b = normalize(norm, yb.astype(jnp.float32))
        return jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12)

    sa = model.init_state(params_a, jnp.asarray(x0))
    sb = model.init_state(params_b, jnp.asarray(x0))
    curve = []
    for _ in range(n_calls):
        sa, ya = step(params_a, sa)
        sb, yb = step(params_b, sb)
        curve.append(float(rel_l2(ya, yb)))
    return {"n_steps": n_steps, "rel_l2": curve}
