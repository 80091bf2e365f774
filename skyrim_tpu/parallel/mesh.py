"""Device mesh construction and axis conventions.

The reference has no distributed machinery at all (SURVEY.md §2.10);
this layer is net-new and TPU-first.  Axis names:

- ``dp``   — data parallel: ensemble members / init times / batch
- ``lat``  — spatial domain decomposition over latitude rows
- ``lon``  — spatial domain decomposition over longitude columns

Spatial sharding rides ICI (halo exchanges between neighbors); ``dp``
is the outermost axis so it lands on DCN across hosts.  Multi-host
initialization is ``jax.distributed.initialize`` + the same mesh over
all processes' devices.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    dp: str = "dp"
    lat: str = "lat"
    lon: str = "lon"


AXES = MeshAxes()


def make_mesh(
    dp: int = 1,
    lat: int = 1,
    lon: int = 1,
    devices=None,
) -> Mesh:
    """Build a (dp, lat, lon) mesh over the available devices.

    Any axis may be -1 to absorb the remaining devices (exactly one).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    sizes = [dp, lat, lon]
    wild = [i for i, s in enumerate(sizes) if s == -1]
    fixed = int(np.prod([s for s in sizes if s != -1]))
    if wild:
        if len(wild) > 1:
            raise ValueError("at most one axis may be -1")
        sizes[wild[0]] = n // fixed
        fixed = int(np.prod(sizes))
    if fixed != n:
        raise ValueError(f"mesh {tuple(sizes)} does not cover {n} devices")
    dev_mesh = mesh_utils.create_device_mesh(tuple(sizes), devices=devices.ravel())
    return Mesh(dev_mesh, (AXES.dp, AXES.lat, AXES.lon))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1, devices=jax.devices()[:1])


def state_sharding(mesh: Mesh) -> NamedSharding:
    """Canonical sharding for (..., C, H, W) state: spatial decomposition."""
    ndim_spec = P(None, None, AXES.lat, AXES.lon)
    return NamedSharding(mesh, ndim_spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_count() -> int:
    return jax.process_count()


def maybe_initialize_distributed():
    """Multi-host init when launched under a multi-process runtime."""
    if os.environ.get("SKYRIM_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["SKYRIM_COORDINATOR"],
            num_processes=int(os.environ.get("SKYRIM_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("SKYRIM_PROCESS_ID", "0")),
        )
