"""Weight-conversion tests against synthetic torch state dicts (no
network; the converters must line up structurally with our flax trees)."""

import numpy as np
import pytest

import jax

from skyrim_tpu.models.afno import AFNOConfig, FourCastNetModel
from skyrim_tpu.weights import convert

CFG = AFNOConfig(lat=32, lon=64, in_channels=4, patch=8, embed_dim=16, depth=2, num_blocks=2)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = tuple(np.shape(v))
    return out


def _synthetic_afno_state_dict(cfg: AFNOConfig):
    rng = np.random.default_rng(0)
    nb, bs = cfg.num_blocks, cfg.embed_dim // cfg.num_blocks
    Ht, Wt = cfg.tokens
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(cfg.embed_dim, cfg.in_channels, cfg.patch, cfg.patch)),
        "patch_embed.proj.bias": rng.normal(size=(cfg.embed_dim,)),
        "pos_embed": rng.normal(size=(1, Ht * Wt, cfg.embed_dim)),
        "head.weight": rng.normal(size=(cfg.patch**2 * cfg.in_channels, cfg.embed_dim)),
        "head.bias": rng.normal(size=(cfg.patch**2 * cfg.in_channels,)),
        "norm.weight": rng.normal(size=(cfg.embed_dim,)),
        "norm.bias": rng.normal(size=(cfg.embed_dim,)),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = rng.normal(size=(cfg.embed_dim,))
        sd[f"{p}.norm1.bias"] = rng.normal(size=(cfg.embed_dim,))
        sd[f"{p}.norm2.weight"] = rng.normal(size=(cfg.embed_dim,))
        sd[f"{p}.norm2.bias"] = rng.normal(size=(cfg.embed_dim,))
        sd[f"{p}.mlp.fc1.weight"] = rng.normal(size=(4 * cfg.embed_dim, cfg.embed_dim))
        sd[f"{p}.mlp.fc1.bias"] = rng.normal(size=(4 * cfg.embed_dim,))
        sd[f"{p}.mlp.fc2.weight"] = rng.normal(size=(cfg.embed_dim, 4 * cfg.embed_dim))
        sd[f"{p}.mlp.fc2.bias"] = rng.normal(size=(cfg.embed_dim,))
        sd[f"{p}.filter.w1"] = rng.normal(size=(2, nb, bs, bs))
        sd[f"{p}.filter.b1"] = rng.normal(size=(2, nb, bs))
        sd[f"{p}.filter.w2"] = rng.normal(size=(2, nb, bs, bs))
        sd[f"{p}.filter.b2"] = rng.normal(size=(2, nb, bs))
    return sd


def test_afno_converter_matches_flax_tree():
    model = FourCastNetModel(CFG)
    native = model.init_params(jax.random.key(0))
    sd = _synthetic_afno_state_dict(CFG)
    converted = convert.convert_afno(model, sd)

    native_shapes = _tree_shapes(native["net"])
    conv_shapes = _tree_shapes(converted["net"])
    assert set(conv_shapes) == set(native_shapes), (
        f"missing: {set(native_shapes) - set(conv_shapes)}; "
        f"extra: {set(conv_shapes) - set(native_shapes)}"
    )
    for k in native_shapes:
        assert conv_shapes[k] == native_shapes[k], f"shape mismatch at {k}"

    # converted params must actually run
    x = np.zeros((1, CFG.in_channels, CFG.lat, CFG.lon), np.float32)
    y = jax.jit(model.apply)(converted, x)
    assert np.isfinite(np.asarray(y)).all()


def test_linear_conversion_transposes():
    sd = {"fc.weight": np.arange(6).reshape(3, 2), "fc.bias": np.zeros(3)}
    out = convert.convert_linear(sd, "fc")
    assert out["kernel"].shape == (2, 3)


def test_conv2d_conversion_layout():
    sd = {"c.weight": np.zeros((8, 3, 5, 5)), "c.bias": np.zeros(8)}
    out = convert.convert_conv2d(sd, "c")
    assert out["kernel"].shape == (5, 5, 3, 8)
