"""Explicit halo exchange over the device mesh (shard_map + ppermute).

GSPMD inserts halos automatically for stock ops; this module is the
explicit path for custom Pallas kernels and for overlap control
(SURVEY.md §7 hard part 4).  Conventions: H (latitude) is sharded on
the ``lat`` axis — edges are NOT periodic (poles); W (longitude) on
``lon`` — periodic wrap, which is physically real on the globe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from skyrim_tpu.parallel.mesh import AXES


def _neighbor_slices(x, halo: int, axis: int, axis_name: str, periodic: bool):
    """Exchange ``halo`` rows with both neighbors along a mesh axis.

    Returns (from_prev, from_next) blocks, zero-filled at non-periodic
    edges.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    take_lo = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    take_hi = jax.lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis], axis=axis)

    # send my high edge → next rank's "from_prev"; my low edge → prev rank
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(take_hi, axis_name, fwd)
    from_next = jax.lax.ppermute(take_lo, axis_name, bwd)

    if not periodic:
        zero = jnp.zeros_like(from_prev)
        from_prev = jnp.where(idx == 0, zero, from_prev)
        from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return from_prev, from_next


def halo_pad(
    x: jax.Array,
    mesh: Mesh,
    halo_lat: int = 0,
    halo_lon: int = 0,
) -> jax.Array:
    """Pad a (..., H, W) array with neighbor halos across the mesh.

    Output local shape grows by 2·halo along each exchanged dim.  Lat
    edges (poles) are zero-filled; lon wraps periodically.  Runs as a
    shard_map so the ppermutes ride ICI directly.
    """
    ndim = x.ndim
    spec = P(*([None] * (ndim - 2)), AXES.lat, AXES.lon)
    out_spec = spec

    @partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=out_spec,
        check_vma=False,
    )
    def exchange(xl):
        h_ax, w_ax = ndim - 2, ndim - 1
        if halo_lat:
            if mesh.shape[AXES.lat] > 1:
                prev, nxt = _neighbor_slices(xl, halo_lat, h_ax, AXES.lat, False)
            else:
                prev = jnp.zeros_like(jax.lax.slice_in_dim(xl, 0, halo_lat, axis=h_ax))
                nxt = prev
            xl = jnp.concatenate([prev, xl, nxt], axis=h_ax)
        if halo_lon:
            if mesh.shape[AXES.lon] > 1:
                prev, nxt = _neighbor_slices(xl, halo_lon, w_ax, AXES.lon, True)
            else:
                prev = jax.lax.slice_in_dim(
                    xl, xl.shape[w_ax] - halo_lon, xl.shape[w_ax], axis=w_ax
                )
                nxt = jax.lax.slice_in_dim(xl, 0, halo_lon, axis=w_ax)
            xl = jnp.concatenate([prev, xl, nxt], axis=w_ax)
        return xl

    return exchange(x)
