"""Multi-process (multi-host / DCN) worker: one rank of a global mesh.

The TPU-world analog of a fake-backend test (SURVEY.md §4): N CPU
processes — each owning its local devices — initialize
``jax.distributed``, build ONE global mesh spanning all processes, and
run (a) a cross-process psum and (b) a tiny lon-sharded ``sharded_advance``
whose halo ring crosses the process boundary.  That exercises the exact
code path a v5e pod slice uses across hosts: ``jax.distributed.initialize``
→ global mesh → XLA collectives over DCN (here: gloo over TCP).

Launch (each rank; ranks discover each other via the coordinator):

    SKYRIM_COORDINATOR=127.0.0.1:<port> SKYRIM_NUM_PROCESSES=2 \
    SKYRIM_PROCESS_ID=<r> JAX_PLATFORMS=cpu \
    python -m skyrim_tpu.parallel.mp_worker --local-devices 2

Prints ``mp_worker rank=R ... ok`` per check; exits nonzero on any
mismatch.  tests/parallel/test_multiprocess.py drives two ranks and the
driver's dryrun tier records the result in MULTICHIP_r{N}.json.

NOTE: run with the axon sitecustomize disabled (unset
``PALLAS_AXON_POOL_IPS``): its import-time PJRT registration creates
the backend before ``jax.distributed.initialize`` runs, and the CPU
client then comes up single-process (1 global device).
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # Multi-process CPU needs an inter-process collectives backend;
    # gloo-over-TCP is the DCN stand-in.  Must be configured before the
    # backend is instantiated (jax_num_cpu_devices likewise).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", args.local_devices)

    from skyrim_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    rank = jax.process_index()
    nproc = jax.process_count()
    devs = jax.devices()
    n = len(devs)
    assert n == nproc * args.local_devices, (
        f"rank {rank}: expected {nproc * args.local_devices} global "
        f"devices, got {n}"
    )
    print(f"mp_worker rank={rank} procs={nproc} global_devices={n} ok",
          flush=True)

    from skyrim_tpu.parallel.mesh import AXES, make_mesh

    # one global lon ring across ALL processes: the halo exchange of the
    # spatial decomposition crosses the process (DCN) boundary
    mesh = make_mesh(dp=1, lat=1, lon=n)

    # (a) cross-process reduction
    x = np.arange(float(n * 3)).reshape(n, 3)
    sh = NamedSharding(mesh, P(AXES.lon, None))
    xs = jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(xs)
    expect = float(x.sum())
    assert float(total) == expect, f"psum {float(total)} != {expect}"
    print(f"mp_worker rank={rank} psum({expect}) ok", flush=True)

    # (b) tiny Pangu sharded step, lon ring spanning both processes
    from skyrim_tpu.models.pangu import PanguConfig, PanguModel
    from skyrim_tpu.parallel.sharding import (
        _step_mode, compatible_spec, state_spec, sharded_advance,
    )

    cfg = PanguConfig(lat=49, lon=96, embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 2, 2))
    model = PanguModel("pangu6", cfg=cfg)
    params_host = model.init_params(jax.random.key(0))
    rep = NamedSharding(mesh, P())

    def global_put(a, sharding):
        # device_put refuses shardings spanning non-addressable devices
        # (other processes); make_array_from_callback hands each process
        # only its addressable shards of the process-identical host value
        h = np.asarray(a)
        return jax.make_array_from_callback(
            h.shape, sharding, lambda i: h[i])

    params = jax.tree.map(lambda a: global_put(a, rep), params_host)

    rng = np.random.default_rng(0)  # same IC on every rank
    ic = rng.normal(size=model.state_shape).astype(np.float32)
    state0 = model.init_state(params, ic)

    def put(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            data = global_put(jax.random.key_data(a), rep)
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(a))
        if hasattr(a, "ndim") and a.ndim >= 2:
            spec = compatible_spec(a.shape, mesh, state_spec(a.ndim))
            return global_put(a, NamedSharding(mesh, spec))
        return global_put(a, rep)

    state = jax.tree.map(put, state0)
    mode = _step_mode(model, mesh)
    adv = sharded_advance(model, mesh)
    for _ in range(args.steps):
        state, y = adv(params, state)
    m = jax.jit(jnp.mean, out_shardings=rep)(y)
    mv = float(m)
    assert np.isfinite(mv) and mv != 0.0, f"bad step mean {mv}"

    # parity: the cross-process sharded rollout must match local
    # single-device semantics (each rank recomputes the reference on
    # its own device 0 — no mesh, no collectives, same params + IC)
    local_state = model.init_state(params_host, ic)
    for _ in range(args.steps):
        local_state, ly = jax.jit(model.advance)(params_host, local_state)
    lv = float(jnp.mean(ly))
    assert abs(mv - lv) <= 1e-4 * max(1.0, abs(lv)), (
        f"cross-process mean {mv} != local reference {lv}"
    )
    print(f"mp_worker rank={rank} sharded_advance mode={mode} "
          f"mesh=lon{n} steps={args.steps} mean={mv:.4e} "
          f"parity(local)={lv:.4e} ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
