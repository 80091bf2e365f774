"""Torch → JAX weight conversion utilities.

Conversion entry point for reference checkpoints (torch state dicts;
ONNX graphs must first be exported to a state-dict-like mapping).  The
reference never converts weights (it downloads ready ONNX/torch models,
SURVEY.md §2.9); here the mapping is explicit per architecture so
converted pytrees line up with our flax module trees.

Network egress is unavailable in this build environment, so these run
only when a user stages files locally; every converter is exercised in
tests against synthetic state dicts.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

from skyrim_tpu.utils.logging import logger


def _t(x) -> np.ndarray:
    """torch tensor (cpu) → numpy."""
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_linear(sd: Mapping, prefix: str) -> dict:
    """torch nn.Linear → flax Dense: weight is transposed."""
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_conv2d(sd: Mapping, prefix: str) -> dict:
    """torch Conv2d (O, I, kh, kw) → flax Conv (kh, kw, I, O)."""
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_conv3d(sd: Mapping, prefix: str) -> dict:
    """torch Conv3d (O, I, kd, kh, kw) → flax Conv (kd, kh, kw, I, O)."""
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_torch_file(model, path: str | Path):
    """Dispatch by model name; expects a torch-loadable state dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    logger.info("converting %d tensors for %s", len(sd), model.name)
    converter = CONVERTERS.get(model.name)
    if converter is None:
        raise NotImplementedError(f"no converter for {model.name!r}")
    return converter(model, sd)


def _convert_norm_stats(sd: Mapping, n_channels: int) -> dict | None:
    """Pull per-channel normalization stats if the checkpoint carries them."""
    from skyrim_tpu.models.base import make_norm_params

    for mk, sk in (("means", "stds"), ("center", "scale"), ("mean", "std")):
        if mk in sd and sk in sd:
            mean = _t(sd[mk]).reshape(-1)[:n_channels]
            std = _t(sd[sk]).reshape(-1)[:n_channels]
            return make_norm_params(n_channels, mean, std)
    return None


def convert_afno(model, sd: Mapping):
    """FourCastNet AFNO state dict (modulus layout) → our flax tree."""
    from skyrim_tpu.models.base import make_norm_params

    cfg = model.cfg
    net = {
        "patch_embed": convert_conv2d(sd, "patch_embed.proj"),
        "pos_embed": _t(sd["pos_embed"]).reshape(*cfg.tokens, cfg.embed_dim),
        "head": convert_linear(sd, "head"),
        "LayerNorm_0": convert_layernorm(sd, "norm"),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        nb = cfg.num_blocks
        bs = cfg.embed_dim // nb
        blk = {
            "LayerNorm_0": convert_layernorm(sd, f"{p}.norm1"),
            "LayerNorm_1": convert_layernorm(sd, f"{p}.norm2"),
            "Dense_0": convert_linear(sd, f"{p}.mlp.fc1"),
            "Dense_1": convert_linear(sd, f"{p}.mlp.fc2"),
            "AFNOMixer_0": {
                "w1_r": _t(sd[f"{p}.filter.w1"])[0].reshape(nb, bs, bs),
                "w1_i": _t(sd[f"{p}.filter.w1"])[1].reshape(nb, bs, bs),
                "b1_r": _t(sd[f"{p}.filter.b1"])[0].reshape(nb, bs),
                "b1_i": _t(sd[f"{p}.filter.b1"])[1].reshape(nb, bs),
                "w2_r": _t(sd[f"{p}.filter.w2"])[0].reshape(nb, bs, bs),
                "w2_i": _t(sd[f"{p}.filter.w2"])[1].reshape(nb, bs, bs),
                "b2_r": _t(sd[f"{p}.filter.b2"])[0].reshape(nb, bs),
                "b2_i": _t(sd[f"{p}.filter.b2"])[1].reshape(nb, bs),
            },
        }
        net[f"block_{i}"] = blk
    norm = _convert_norm_stats(sd, cfg.in_channels) or make_norm_params(cfg.in_channels)
    return {"net": net, "norm": norm}


CONVERTERS = {
    "fourcastnet": convert_afno,
}
