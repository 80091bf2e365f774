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
