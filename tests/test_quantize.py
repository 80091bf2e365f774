"""Post-training quantization (skyrim_tpu/quantize.py) — the reference's
roadmap capability (reference README.md:145), built TPU-native here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyrim_tpu.quantize import (
    QuantizedArray,
    dequantize_array,
    dequantize_tree,
    int8_dot,
    is_quantized,
    maybe_dequantize,
    quantize_array,
    quantize_tree,
    tree_nbytes,
)


def test_quantize_roundtrip_error_bound(rng):
    w = rng.normal(size=(256, 384)).astype(np.float32) * np.linspace(
        0.1, 10.0, 384
    )  # per-channel dynamic range
    qa = quantize_array(w)
    assert qa.q.dtype == jnp.int8 and qa.scale.shape == (1, 384)
    back = np.asarray(dequantize_array(QuantizedArray(qa.q, qa.scale, "float32")))
    # symmetric rounding: |err| ≤ scale/2 per channel
    bound = np.asarray(qa.scale)[0] / 2 + 1e-7
    assert (np.abs(back - w) <= bound[None, :]).all()


def test_quantize_tree_skips_small_and_counts_bytes(rng):
    tree = {
        "big": rng.normal(size=(512, 512)).astype(np.float32),
        "bias": rng.normal(size=(512,)).astype(np.float32),
        "norm": {"mean": np.zeros((7, 1, 1), np.float32)},
    }
    qt = quantize_tree(tree, min_size=1024)
    assert isinstance(qt["big"], QuantizedArray)
    assert not isinstance(qt["bias"], QuantizedArray)  # 1-D passes through
    assert not isinstance(qt["norm"]["mean"], QuantizedArray)
    assert is_quantized(qt) and not is_quantized(tree)
    # ≈4× smaller than f32 for the quantized leaf
    assert tree_nbytes(qt) < tree_nbytes(tree) / 3.5
    back = dequantize_tree(qt)
    assert back["big"].dtype == jnp.float32
    np.testing.assert_array_equal(back["bias"], tree["bias"])
    # maybe_dequantize is identity on plain trees
    assert maybe_dequantize(tree) is tree


def test_int8_dot_accuracy(rng):
    x = rng.normal(size=(64, 256)).astype(np.float32)
    w = rng.normal(size=(256, 128)).astype(np.float32)
    exact = x @ w
    out = np.asarray(jax.jit(int8_dot)(jnp.asarray(x), quantize_array(w)))
    rel = np.abs(out - exact) / (np.abs(exact).mean() + 1e-6)
    assert rel.mean() < 0.01 and rel.max() < 0.1


def test_int8_dot_batched_shapes(rng):
    x = rng.normal(size=(2, 8, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    out = int8_dot(jnp.asarray(x, jnp.bfloat16), quantize_array(w))
    assert out.shape == (2, 8, 16) and out.dtype == jnp.bfloat16


@pytest.fixture
def small_fuxi():
    from skyrim_tpu.models.fuxi import FuXiConfig, FuXiModel

    cfg = FuXiConfig(
        lat=49, lon=96, in_channels=5, embed_dim=16, depth=2, num_heads=2,
        stage_steps=2,
    )
    model = FuXiModel(cfg)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_fuxi_quantized_cascade(small_fuxi, rng):
    """Quantized stages run through the real advance/switch path and
    stay close to the bf16 forward; resident bytes drop ~2× vs bf16."""
    model, params = small_fuxi
    qparams = model.quantize_params(params, min_size=256)
    # toy stage: bf16→int8 halves only the large leaves and per-channel
    # scales add overhead, so just require a strict reduction here; the
    # asymptotic 2× (bf16) ratio is pinned on a production-sized leaf:
    assert tree_nbytes(qparams["stages"][0]) < tree_nbytes(params["stages"][0]) * 0.92
    big = jnp.zeros((1536, 4608), jnp.bfloat16)
    qbig = quantize_tree({"w": big}, min_size=1024)
    assert tree_nbytes(qbig) / tree_nbytes({"w": big}) < 0.51

    x = rng.normal(size=model.state_shape).astype(np.float32)
    y0 = np.asarray(jax.jit(model.apply)(params, x))
    y1 = np.asarray(jax.jit(model.apply)(qparams, x))
    assert np.isfinite(y1).all()
    # int8 weights perturb a bf16 forward only modestly
    denom = np.abs(y0).mean() + 1e-6
    assert np.abs(y1 - y0).mean() / denom < 0.15

    # multi-stage switch: step through a stage boundary under jit
    state = model.init_state(qparams, x)
    step = jax.jit(lambda p, s: model.advance(p, s))
    outs = []
    for _ in range(4):  # stage_steps=2 → crosses into stage 1
        state, y = step(qparams, state)
        outs.append(np.asarray(y))
    assert all(np.isfinite(o).all() for o in outs)


def test_fuxi_int8_serving_path(small_fuxi, rng):
    """serve_int8: trunk GEMMs run as int8 MXU dots via the ``int8``
    collection — the bf16 kernels are REMOVED from the params tree,
    outputs stay close to the bf16 forward, and the cascade switch
    still steps across a stage boundary."""
    model, params = small_fuxi
    sparams = model.quantize_params(params, min_size=256, serve_int8=True)

    # the served kernels left the params tree entirely
    stage = sparams["stages"][0]
    assert "int8" in stage and stage["int8"], "int8 collection missing"
    pairs_a = stage["params"]["pairs"]["a"]
    assert "qkv" not in pairs_a and "Dense_0" not in pairs_a
    i8a = stage["int8"]["pairs"]["a"]
    assert i8a["qkv_q"].dtype == jnp.int8
    # stacked nn.scan kernels get PER-LAYER scales (reduced over the
    # contraction dim only)
    assert i8a["qkv_scale"].shape[0] == i8a["qkv_q"].shape[0]

    x = rng.normal(size=model.state_shape).astype(np.float32)
    y0 = np.asarray(jax.jit(model.apply)(params, x))
    y1 = np.asarray(jax.jit(model.apply)(sparams, x))
    assert np.isfinite(y1).all()
    denom = np.abs(y0).mean() + 1e-6
    assert np.abs(y1 - y0).mean() / denom < 0.15

    state = model.init_state(sparams, x)
    step = jax.jit(lambda p, s: model.advance(p, s))
    for _ in range(4):  # stage_steps=2 → crosses into stage 1
        state, y = step(sparams, state)
        assert np.isfinite(np.asarray(y)).all()
