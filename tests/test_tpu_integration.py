"""Real-TPU integration tier (opt-in: SKYRIM_TEST_TPU=1 + -m tpu).

The default unit tier forces CPU (conftest); these exercise the Pallas
kernels and full-size models on the actual chip.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    not os.environ.get("SKYRIM_TEST_TPU"), reason="set SKYRIM_TEST_TPU=1"
)


@requires_tpu
def test_flash_attention_compiled_parity():
    import jax
    import jax.numpy as jnp

    from skyrim_tpu.ops.flash_window_attention import (
        flash_window_attention,
        reference_window_attention,
    )

    rng = np.random.default_rng(0)
    n_win, heads, wlen, hd, nw = 60, 6, 144, 32, 30
    q, k, v = (
        jnp.asarray(rng.normal(size=(n_win, heads, wlen, hd)), jnp.bfloat16)
        for _ in range(3)
    )
    bias = jnp.asarray(rng.normal(size=(heads, wlen, wlen)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((2, 1, wlen, wlen)) > 0.9, -1e9, 0.0).astype(np.float32)
    )
    out = np.asarray(
        jax.jit(flash_window_attention, static_argnums=(5,))(q, k, v, bias, mask, nw),
        np.float32,
    )
    ref = np.asarray(
        reference_window_attention(q, k, v, bias, mask, nw), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=5e-2)


@requires_tpu
def test_pangu_full_size_step_finite():
    import jax
    import jax.numpy as jnp

    from skyrim_tpu.models.pangu import PanguModel

    model = PanguModel("pangu6")
    params = model.init_params(jax.random.key(0))
    x = jnp.zeros(model.state_shape, jnp.float32)
    y = jax.jit(model.apply)(params, x)
    assert bool(jnp.isfinite(jnp.mean(y)))


def _full_size(name):
    """Full-resolution production model per family (the configs the
    reference actually runs, SURVEY.md §2.1)."""
    from skyrim_tpu.models import MODELS

    return MODELS[name]("pangu6") if name == "pangu" else MODELS[name]()


@requires_tpu
@pytest.mark.parametrize(
    "name",
    ["pangu", "fourcastnet", "fourcastnet_v2", "dlwp", "graphcast", "fuxi",
     "fengwu"],
)
def test_full_size_rollout_finite_and_bounded(name):
    """Every family must run FULL-SIZE on the chip: one jitted 3-step
    rollout (scan, on-device feedback) stays finite and the step-to-step
    output scale may not explode (drift bound ≤10× per step on random
    normal ICs) — 'runs on hardware' as a tested property, not a bench
    side effect (round-2 VERDICT items 1/9)."""
    import jax
    import jax.numpy as jnp

    from skyrim_tpu.rollout import scan_rollout

    model = _full_size(name)
    params = model.init_params(jax.random.key(0))
    if hasattr(model, "trim_stages"):
        params = model.trim_stages(params, 3)  # one resident FuXi stage
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=model.state_shape).astype(np.float32)
    _, ys = scan_rollout(model, params, jax.tree.map(jnp.asarray,
                                                     model.init_state(params, x0)),
                         n_steps=3)
    ys = np.asarray(ys, np.float32)
    assert ys.shape[0] >= 3
    assert np.isfinite(ys).all(), f"{name}: non-finite rollout output"
    scales = [np.abs(ys[t]).mean() + 1e-9 for t in range(3)]
    for t in range(1, 3):
        assert scales[t] / scales[t - 1] < 10.0, (
            f"{name}: output scale exploded {scales[t-1]:.3g}→{scales[t]:.3g} "
            f"at step {t}"
        )
