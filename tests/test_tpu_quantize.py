"""On-chip int8 tier (opt-in: SKYRIM_TEST_TPU=1 + -m tpu).

Pins the MEASURED int8 facts (round 5): XLA's s8×s8→s32 lowering on
v5e runs ~1.09-1.15× the bf16 MXU rate (NOT the hardware's nominal
2×), so the serving win is halved weight traffic + capacity; and the
int8-at-rest FuXi cascade holds all three ~1.37 B stages resident on
one 16 GB chip — the capacity claim quantize.py makes.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    not os.environ.get("SKYRIM_TEST_TPU"), reason="set SKYRIM_TEST_TPU=1"
)


@requires_tpu
def test_int8_dot_production_shape_accuracy_and_rate():
    """int8_dot at the FuXi trunk GEMM shape: accurate (<2% mean rel
    error on N(0,1) data) and not slower than bf16 by more than 10%
    (measured 1.15× FASTER; the bound guards against a silent fallback
    to a dequantize-then-bf16 path)."""
    import time

    import jax
    import jax.numpy as jnp

    from functools import partial

    from skyrim_tpu.quantize import int8_dot, quantize_array

    M, K = 33120, 1536
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = rng.normal(size=(K, K)).astype(np.float32) * 0.02
    wq = quantize_array(jnp.asarray(w))
    wb = jnp.asarray(w).astype(jnp.bfloat16)

    out = np.asarray(int8_dot(x, wq), np.float32)
    ref = np.asarray(x @ wb, np.float32)
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    assert rel.mean() < 0.02, rel.mean()

    @partial(jax.jit, static_argnums=(2,))
    def loop_bf16(x, w, n):
        def body(c, _):
            return (c @ w), jnp.float32(0)
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    @partial(jax.jit, static_argnums=(2,))
    def loop_int8(x, wq, n):
        def body(c, _):
            return int8_dot(c, wq), jnp.float32(0)
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    def timed(f, *args):
        float(f(*args, 12))
        float(f(*args, 3))
        ts = []
        for n in (12, 3):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(*args, n))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[0] - ts[1]) / 9

    t_bf = timed(loop_bf16, x, wb)
    t_i8 = timed(loop_int8, x, wq)
    assert t_i8 < 1.1 * t_bf, (t_bf, t_i8)


@requires_tpu
def test_fuxi_int8_at_rest_full_cascade_resident():
    """The capacity claim on the chip: all 3 FuXi stages int8-at-rest
    (~4.1 GB vs 8.2 GB bf16) plus state fit, and a rollout crossing a
    stage boundary executes without trim_stages."""
    import jax
    import jax.numpy as jnp

    from skyrim_tpu.models import MODELS
    from skyrim_tpu.quantize import tree_nbytes

    model = MODELS["fuxi"]()
    params = model.init_params(jax.random.key(0))
    qparams = model.quantize_params(params)  # at-rest, ALL 3 stages
    del params
    resident = tree_nbytes(qparams["stages"])
    assert resident < 5.0e9, f"{resident/1e9:.1f} GB at rest"
    x0 = np.zeros(model.state_shape, np.float32)
    state = jax.tree.map(jnp.asarray, model.init_state(qparams, x0))
    step = jax.jit(lambda p, s: model.advance(p, s))
    # hop the state to just before the stage-0→1 boundary, then step
    # across it so the lax.switch takes a non-zero branch on chip
    state = state.replace(step=jnp.int32(model.cfg.stage_steps - 1))
    for _ in range(2):
        state, y = step(qparams, state)
    assert np.isfinite(np.asarray(jnp.mean(y.astype(jnp.float32))))
