"""Ad-hoc Pangu stage bisection profiler (not part of the suite)."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from skyrim_tpu.models.pangu import PanguConfig, PanguModel


def step_time(cfg, label, n=3):
    m = PanguModel("pangu6", cfg=cfg)
    params = m.init_params(jax.random.key(0))
    x0 = np.zeros(m.state_shape, np.float32)
    state0 = jax.tree.map(jnp.asarray, m.init_state(params, x0))

    @jax.jit
    def step_sum(params, state):
        s, y = m.advance(params, state)
        return s, jnp.mean(y.astype(jnp.float32))

    s, mm = step_sum(params, state0)
    float(mm)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        s2, mm = step_sum(params, state0)
        float(mm)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)
    return best


full = PanguConfig()
step_time(full, "full (2,6,6,2)")
step_time(PanguConfig(depths=(0, 0, 0, 0)), "embed+recover only")
step_time(PanguConfig(depths=(2, 0, 0, 2)), "outer stages only")
step_time(PanguConfig(depths=(0, 6, 6, 0)), "middle stages only")
step_time(PanguConfig(depths=(1, 0, 0, 0)), "one outer block")
step_time(PanguConfig(depths=(0, 1, 0, 0)), "one middle block")
