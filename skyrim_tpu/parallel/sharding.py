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
    meshes keep the fused kernels."""
    import contextlib

    from skyrim_tpu.ops.flash_window_attention import xla_fallback

    return xla_fallback() if mesh.size > 1 else contextlib.nullcontext()


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
    """Jitted advance with state spatially sharded and params replicated."""

    def spec_of(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return NamedSharding(mesh, state_spec(x.ndim))
        return NamedSharding(mesh, P())

    def advance(params, state):
        with _maybe_xla_fallback(mesh):
            new_state, y = model.advance(params, state)
        y = jax.lax.with_sharding_constraint(
            y, NamedSharding(mesh, compatible_spec(y.shape, mesh, state_spec(y.ndim)))
        )
        return new_state, y

    return jax.jit(advance, donate_argnums=(1,))


def sharded_scan_rollout(model: PrognosticModel, mesh: Mesh, n_steps: int):
    """Whole rollout under one jit with spatial sharding."""
    n_calls = -(-n_steps // model.frames_out)

    @partial(jax.jit, donate_argnums=(1,))
    def run(params, state):
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

        x0_batch = jax.lax.with_sharding_constraint(x0_batch, batch_sharding)
        with _maybe_xla_fallback(mesh):
            return jax.vmap(one)(x0_batch)

    return run
