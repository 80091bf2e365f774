"""Ad-hoc single-model step timer (not part of the suite)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from skyrim_tpu.models import MODELS

name = sys.argv[1] if len(sys.argv) > 1 else "graphcast"
model = MODELS[name]()
params = model.init_params(jax.random.key(0))
x0 = np.zeros(model.state_shape, np.float32)
state0 = jax.tree.map(jnp.asarray, model.init_state(params, x0))


@jax.jit
def step_sum(params, state):
    s, y = model.advance(params, state)
    return s, jnp.mean(y.astype(jnp.float32))


t0 = time.perf_counter()
s, m = step_sum(params, state0)
float(m)
print(f"compile+1st: {time.perf_counter()-t0:.2f}s")
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    s2, m = step_sum(params, state0)
    float(m)
    best = min(best, time.perf_counter() - t0)
print(f"{name} step: {best*1000:.1f} ms")
