"""SPMD wrappers: sharded state, replicated params, sharded step/rollout.

TPU-first scaling story (net-new vs the single-GPU reference, SURVEY.md
§2.10): the (C, H, W) state tensor is domain-decomposed over the mesh's
``lat``/``lon`` axes; parameters are replicated; ``dp`` carries ensemble
members / init-times / training batch.  The model forward runs under
``jit`` with sharding constraints — XLA GSPMD partitions the windowed
attention, convolutions and FFTs and inserts the halo/all-to-all
collectives over ICI.  Explicit shard_map halo exchange (halo.py) is
the escape hatch for custom Pallas kernels.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skyrim_tpu.models.base import ModelState, PrognosticModel
from skyrim_tpu.parallel.mesh import AXES


def _maybe_xla_fallback(mesh: Mesh):
    """GSPMD cannot auto-partition Pallas custom-calls: on a >1-device
    mesh, trace the model through its pure-XLA composition (which GSPMD
    partitions, inserting halo/all-to-all collectives).  Single-device
    meshes keep the fused kernels.

    This is now only the fallback for models WITHOUT a lon-manual path:
    the window-attention family (Pangu/FuXi/FengWu) keeps its fused
    Pallas kernels on multi-device meshes via the whole-step shard_map in
    parallel/fused_shard.py (see :func:`_step_mode`).  For the spectral
    models (AFNO/SFNO) the XLA path under GSPMD *is* the intended
    multi-chip design — their token mixing is global (DFT/SHT matmuls)
    and XLA inserts the all-to-alls.
    """
    import contextlib

    from skyrim_tpu.ops.flash_window_attention import xla_fallback

    return xla_fallback() if mesh.size > 1 else contextlib.nullcontext()


def _step_mode(model: PrognosticModel, mesh: Mesh) -> str:
    """'manual' (shard_map, fused kernels survive), 'gspmd' (XLA
    fallback), or 'local' (single device, fused kernels, no collectives).
    """
    from skyrim_tpu.ops.flash_window_attention import use_pallas
    from skyrim_tpu.parallel import fused_shard as FS

    if mesh.size == 1:
        return "local"
    if use_pallas() and FS.supports_lon_manual(model, mesh):
        return "manual"
    return "gspmd"


def _manual_specs(mesh: Mesh, tree):
    """Per-leaf PartitionSpec for a state pytree: spatial trailing dims
    over (lat, lon) — mesh lat is 1 on the manual path — scalars
    replicated."""

    def spec(a):
        if hasattr(a, "ndim") and a.ndim >= 2:
            return compatible_spec(a.shape, mesh, state_spec(a.ndim))
        return P()

    return jax.tree.map(spec, tree)


def state_spec(n_spatial_dims: int = 4) -> P:
    """(..., C, H, W) → shard H over 'lat', W over 'lon'.

    NOTE on axis choice: at 0.25° the canonical grid is 721×1440.
    721 = 7·103 barely divides, so production meshes put the spatial
    shards on the (periodic, highly divisible) longitude axis — e.g.
    ``make_mesh(dp, 1, n_chips)``; latitude sharding is for grids that
    divide.  Non-divisible dims degrade to replicated via
    :func:`compatible_spec` (JAX requires exact divisibility).
    """
    return P(*([None] * (n_spatial_dims - 2)), AXES.lat, AXES.lon)


def compatible_spec(shape: tuple[int, ...], mesh: Mesh, spec: P) -> P:
    """Drop sharding on dims the mesh cannot divide evenly."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for size, axis in zip(shape, parts):
        if axis is None:
            out.append(None)
            continue
        n = mesh.shape[axis] if isinstance(axis, str) else 1
        out.append(axis if n > 0 and size % n == 0 else None)
    return P(*out)


def shard_state(mesh: Mesh, state: ModelState) -> ModelState:
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            spec = compatible_spec(x.shape, mesh, state_spec(x.ndim))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, state)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_advance(model: PrognosticModel, mesh: Mesh):
    """Jitted advance with state spatially sharded and params replicated.

    When the model supports the lon-manual path, the whole step runs in
    ONE shard_map: every Pallas kernel executes on its local lon chunk
    and only the window-cover ring exchanges touch ICI — the fused
    kernels survive multi-device meshes (round-1 VERDICT item 1).
    """
    mode = _step_mode(model, mesh)

    def advance(params, state):
        if mode == "manual":
            from skyrim_tpu.parallel import fused_shard as FS

            nlon = mesh.shape[AXES.lon]
            sspecs = _manual_specs(mesh, state)
            pspecs = jax.tree.map(lambda _: P(), params)
            H, W = model.grid.shape
            y_spec = compatible_spec(
                (model.frames_out, len(model.channels), H, W), mesh, state_spec(4)
            )

            def body(p, s):
                with FS.lon_manual(AXES.lon, nlon):
                    return model.advance(p, s)

            new_state, y = jax.shard_map(
                body, mesh=mesh, in_specs=(pspecs, sspecs),
                out_specs=(sspecs, y_spec),
                check_vma=False,
            )(params, state)
            return new_state, y
        with _maybe_xla_fallback(mesh):
            new_state, y = model.advance(params, state)
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, compatible_spec(y.shape, mesh, state_spec(y.ndim)))
        )
        return new_state, y

    return jax.jit(advance, donate_argnums=(1,))


def sharded_scan_rollout(model: PrognosticModel, mesh: Mesh, n_steps: int):
    """Whole rollout under one jit with spatial sharding.

    Manual-path models run the ENTIRE scan inside one shard_map — zero
    GSPMD boundaries; per-step communication is only the window-cover
    ring exchange over ICI.
    """
    n_calls = -(-n_steps // model.frames_out)
    mode = _step_mode(model, mesh)

    @partial(jax.jit, donate_argnums=(1,))
    def run(params, state):
        if mode == "manual":
            from skyrim_tpu.parallel import fused_shard as FS

            nlon = mesh.shape[AXES.lon]
            sspecs = _manual_specs(mesh, state)
            pspecs = jax.tree.map(lambda _: P(), params)
            H, W = model.grid.shape
            y_spec = compatible_spec(
                (n_calls * model.frames_out, len(model.channels), H, W),
                mesh,
                P(None, None, AXES.lat, AXES.lon),
            )

            def body_local(p, s0):
                def step(carry, _):
                    with FS.lon_manual(AXES.lon, nlon):
                        s, y = model.advance(p, carry)
                    return s, y

                final, ys = jax.lax.scan(step, s0, None, length=n_calls)
                return final, ys.reshape(-1, *ys.shape[2:])

            return jax.shard_map(
                body_local, mesh=mesh, in_specs=(pspecs, sspecs),
                out_specs=(sspecs, y_spec), check_vma=False,
            )(params, state)

        def body(carry, _):
            with _maybe_xla_fallback(mesh):
                s, y = model.advance(params, carry)
            y = jax.lax.with_sharding_constraint(
                y,
                NamedSharding(mesh, compatible_spec(y.shape, mesh, state_spec(y.ndim))),
            )
            return s, y

        final, ys = jax.lax.scan(body, state, None, length=n_calls)
        return final, ys.reshape(-1, *ys.shape[2:])

    return run


def dp_ensemble_rollout(model: PrognosticModel, mesh: Mesh, n_steps: int):
    """Batched members over the dp axis: ICs (B, hist, C, H, W) → outputs
    (B, n, C, H, W).  Members run simultaneously across ``dp`` — the
    TPU-parallel replacement for the reference's sequential load/release
    ensemble loop (ensemble.py:86-98)."""
    n_calls = -(-n_steps // model.frames_out)
    mode = _step_mode(model, mesh)
    H, W = model.grid.shape
    base = P(AXES.dp, None, None, AXES.lat, AXES.lon)
    batch_sharding = NamedSharding(
        mesh,
        compatible_spec((mesh.shape[AXES.dp], 1, 1, H, W), mesh, base),
    )

    @partial(jax.jit, out_shardings=None)
    def run(params, x0_batch):
        def one(x0):
            state = model.init_state(params, x0)

            def body(carry, _):
                s, y = model.advance(params, carry)
                return s, y

            _, ys = jax.lax.scan(body, state, None, length=n_calls)
            return ys.reshape(-1, *ys.shape[2:])

        if mode == "manual":
            # shard_map over BOTH dp and lon: members vmap over the local
            # batch; the fused kernels stay live, with the window-cover
            # ring over lon inside each member's step
            from skyrim_tpu.parallel import fused_shard as FS

            nlon = mesh.shape[AXES.lon]
            x_spec = compatible_spec(x0_batch.shape, mesh, base)
            pspecs = jax.tree.map(lambda _: P(), params)
            y_spec = compatible_spec(
                (x0_batch.shape[0], n_calls * model.frames_out,
                 len(model.channels), H, W),
                mesh,
                base,
            )

            def body_local(p, xb):
                def one_local(x0):
                    state = model.init_state(p, x0)

                    def step(carry, _):
                        with FS.lon_manual(AXES.lon, nlon):
                            return model.advance(p, carry)

                    _, ys = jax.lax.scan(step, state, None, length=n_calls)
                    return ys.reshape(-1, *ys.shape[2:])

                return jax.vmap(one_local)(xb)

            return jax.shard_map(
                body_local, mesh=mesh, in_specs=(pspecs, x_spec),
                out_specs=y_spec, check_vma=False,
            )(params, x0_batch)

        x0_batch = jax.lax.with_sharding_constraint(x0_batch, batch_sharding)
        with _maybe_xla_fallback(mesh):
            return jax.vmap(one)(x0_batch)

    return run
