"""Exporter-name rename pass: traced-ONNX graphs → converter state dicts.

Round-trips synthetic FuXi/FengWu artifacts carrying EXPORTER-style
names (``onnx::MatMul_*``, bare-numbered Add constants — what
torch.onnx.export actually emits for the released artifacts the
reference loads, fuxi.py:53-54 / fengwu.py:44-53) through
weights/onnx_rename.py and the per-model converters."""

from __future__ import annotations

import numpy as np
import pytest

from skyrim_tpu.weights import convert, onnx_io
from skyrim_tpu.weights.onnx_rename import (
    fengwu_config_from_graph,
    looks_exporter_named,
    rename_fengwu_graph,
    rename_fuxi_graph,
)


class _Trace:
    """Builds a traced-export-shaped graph: ugly initializer names, one
    node per op in forward order, decoy folded constants."""

    def __init__(self):
        self.nodes = []
        self.tensors = {}
        self.n = 0
        self.cur = "input"

    def _name(self, kind):
        self.n += 1
        return (f"onnx::{kind}_{self.n}" if kind in ("MatMul", "Conv")
                else str(1000 + self.n))

    def op(self, op_type, *weights, extra_inputs=()):
        wnames = []
        for w in weights:
            nm = self._name(op_type)
            self.tensors[nm] = np.asarray(w)
            wnames.append(nm)
        out = f"t{self.n}"
        ins = [self.cur, *extra_inputs, *wnames] if op_type != "Gather" \
            else [*wnames, self.cur]
        self.nodes.append((op_type, ins, [out]))
        self.cur = out
        return out

    def linear(self, w_torch, b=None):
        """torch (out,in) Linear → MatMul with (in,out) initializer + Add."""
        self.op("MatMul", np.asarray(w_torch).T.copy())
        if b is not None:
            self.op("Add", b)

    def ln(self, w, b):
        self.op("LayerNormalization", w, b)

    def const_input(self, arr, op_type="MatMul"):
        """A folded non-parameter constant (CPB coords, masks)."""
        nm = self._name("Constant")
        self.tensors[nm] = np.asarray(arr)
        out = f"t{self.n}c"
        self.nodes.append((op_type, [nm, self.cur], [out]))
        return out

    def build(self):
        data = onnx_io.build_onnx(
            self.tensors, nodes=self.nodes,
            graph_inputs=("input",), graph_outputs=(self.cur,),
        )
        return onnx_io.read_onnx_graph_from_bytes(data)


def _trace_v2_block(tr, sd, p):
    # torch export order: qkv → logit_scale → cpb (coords const!) →
    # proj → post-norm1 → mlp → post-norm2
    tr.linear(sd[f"{p}.attn.qkv.weight"], sd.get(f"{p}.attn.qkv.bias"))
    tr.op("Mul", sd[f"{p}.attn.logit_scale"])
    tr.const_input(np.zeros((15, 2), np.float32))  # folded CPB coords
    tr.linear(sd[f"{p}.attn.cpb_mlp.0.weight"], sd[f"{p}.attn.cpb_mlp.0.bias"])
    tr.linear(sd[f"{p}.attn.cpb_mlp.2.weight"])
    tr.linear(sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
    tr.ln(sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
    tr.linear(sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
    tr.linear(sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])
    tr.ln(sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])


def _trace_v1_block(tr, sd, p, mask_shape):
    tr.ln(sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"])
    tr.linear(sd[f"{p}.attn.qkv.weight"], sd[f"{p}.attn.qkv.bias"])
    tr.op("Gather", sd[f"{p}.attn.relative_position_bias_table"])
    tr.const_input(np.zeros(mask_shape, np.float32), op_type="Add")  # mask
    tr.linear(sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"])
    tr.ln(sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"])
    tr.linear(sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"])
    tr.linear(sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"])


def _fuxi_trace(sd, cfg, stage_prefix, conv_updown=False):
    """One FuXi stage as a traced export (forward order of FuXiNet)."""
    tr = _Trace()
    p = stage_prefix
    tr.op("Conv", sd[f"{p}.cube_embed.weight"], sd[f"{p}.cube_embed.bias"])
    tr.ln(sd[f"{p}.down_norm.weight"], sd[f"{p}.down_norm.bias"])
    if conv_updown:
        tr.op("Conv", sd[f"{p}.down.weight"])
    else:
        tr.linear(sd[f"{p}.down.weight"])
    for i in range(cfg.depth):
        _trace_v2_block(tr, sd, f"{p}.blocks.{i}")
    if conv_updown:
        tr.op("ConvTranspose", sd[f"{p}.up.weight"])
    else:
        tr.linear(sd[f"{p}.up.weight"])
    tr.ln(sd[f"{p}.up_norm.weight"], sd[f"{p}.up_norm.bias"])
    tr.linear(sd[f"{p}.fuse.weight"], sd[f"{p}.fuse.bias"])
    tr.op("ConvTranspose", sd[f"{p}.head.weight"], sd[f"{p}.head.bias"])
    return tr.build()


def _fuxi_case():
    from tests.test_weights_convert import _make_fuxi_case

    return _make_fuxi_case(attn_v2=True)


def test_fuxi_rename_roundtrip():
    model, sd, native = _fuxi_case()
    cfg = model.cfg
    graph = _fuxi_trace(sd, cfg, "stages.1")
    assert looks_exporter_named(graph["initializers"])
    renamed = rename_fuxi_graph(graph, cfg, stage=1,
                                n_history=model.n_history)
    expected = {k: v for k, v in sd.items() if k.startswith("stages.1.")}
    assert set(renamed) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(renamed[k], np.asarray(expected[k]),
                                      err_msg=k)


def test_fuxi_cascade_from_onnx_files(tmp_path):
    model, sd, native = _fuxi_case()
    cfg = model.cfg
    paths = []
    for s in range(cfg.n_stages):
        tr = _Trace()
        p = f"stages.{s}"
        tr.op("Conv", sd[f"{p}.cube_embed.weight"], sd[f"{p}.cube_embed.bias"])
        tr.ln(sd[f"{p}.down_norm.weight"], sd[f"{p}.down_norm.bias"])
        tr.linear(sd[f"{p}.down.weight"])
        for i in range(cfg.depth):
            _trace_v2_block(tr, sd, f"{p}.blocks.{i}")
        tr.linear(sd[f"{p}.up.weight"])
        tr.ln(sd[f"{p}.up_norm.weight"], sd[f"{p}.up_norm.bias"])
        tr.linear(sd[f"{p}.fuse.weight"], sd[f"{p}.fuse.bias"])
        tr.op("ConvTranspose", sd[f"{p}.head.weight"], sd[f"{p}.head.bias"])
        data = onnx_io.build_onnx(tr.tensors, nodes=tr.nodes,
                                  graph_inputs=("input",))
        f = tmp_path / f"fuxi_stage{s}.onnx"
        f.write_bytes(data)
        paths.append(f)
    converted = convert.convert_fuxi_onnx_cascade(model, paths)
    ref = convert.convert_fuxi(model, sd)
    ra, rb = __import__("jax").tree.flatten(converted), \
        __import__("jax").tree.flatten(ref)
    assert ra[1] == rb[1]
    for a, b in zip(ra[0], rb[0]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-6)


def test_fuxi_conv_updown_adapter_math():
    """k=2/s=2 conv down ≡ patch-merge GEMM, ConvTranspose ≡ expand GEMM
    — verified numerically, not just by shape."""
    rng = np.random.default_rng(0)
    Dc, D = 3, 6
    H, W = 4, 4
    x = rng.normal(size=(H, W, Dc)).astype(np.float32)
    wd = rng.normal(size=(D, Dc, 2, 2)).astype(np.float32)  # torch Conv2d
    # reference: stride-2 conv
    ref = np.zeros((H // 2, W // 2, D), np.float32)
    for i in range(H // 2):
        for j in range(W // 2):
            patch = x[2 * i:2 * i + 2, 2 * j:2 * j + 2]  # (2,2,Dc)
            ref[i, j] = np.einsum("ijc,ocij->o", patch, wd)
    # adapter: FuXiNet merge flatten (ki, kj, c) @ (4Dc, D)
    kern = wd.transpose(2, 3, 1, 0).reshape(4 * Dc, D)
    merged = x.reshape(H // 2, 2, W // 2, 2, Dc).transpose(0, 2, 1, 3, 4)
    got = merged.reshape(H // 2, W // 2, 4 * Dc) @ kern
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # up: torch ConvTranspose2d (in=D, out=Dc, 2, 2), stride 2
    wu = rng.normal(size=(D, Dc, 2, 2)).astype(np.float32)
    h = rng.normal(size=(H // 2, W // 2, D)).astype(np.float32)
    ref_up = np.zeros((H, W, Dc), np.float32)
    for i in range(H // 2):
        for j in range(W // 2):
            ref_up[2 * i:2 * i + 2, 2 * j:2 * j + 2] = np.einsum(
                "d,dcij->ijc", h[i, j], wu)
    kern_up = wu.transpose(0, 2, 3, 1).reshape(D, 4 * Dc)
    e = (h @ kern_up).reshape(H // 2, W // 2, 2, 2, Dc)
    got_up = e.transpose(0, 2, 1, 3, 4).reshape(H, W, Dc)
    np.testing.assert_allclose(got_up, ref_up, atol=1e-5)


def test_fuxi_conv_updown_rename_and_convert():
    """A conv-down/up artifact renames via the fallback program and the
    adapter loads it (ARCH_FIDELITY deviation 2 resolved)."""
    model, sd, native = _fuxi_case()
    cfg = model.cfg
    Dc, D = cfg.cube_dim, cfg.embed_dim
    rng = np.random.default_rng(7)
    sd = dict(sd)
    for s in range(cfg.n_stages):
        sd[f"stages.{s}.down.weight"] = rng.normal(
            size=(D, Dc, 2, 2)).astype(np.float32)
        sd[f"stages.{s}.up.weight"] = rng.normal(
            size=(D, Dc, 2, 2)).astype(np.float32)
    graph = _fuxi_trace(sd, cfg, "stages.0", conv_updown=True)
    renamed = rename_fuxi_graph(graph, cfg, stage=0,
                                n_history=model.n_history)
    assert renamed["stages.0.down.weight"].shape == (D, Dc, 2, 2)
    # adapter: converts through convert_fuxi without shape errors and
    # with the exact lossless reshape
    full = {**{k: v for k, v in sd.items() if not k.startswith("stages.0")},
            **renamed}
    converted = convert.convert_fuxi(model, full)
    got = np.asarray(converted["stages"][0]["down"]["kernel"], np.float32)
    want = sd["stages.0.down.weight"].transpose(2, 3, 1, 0).reshape(4 * Dc, D)
    # stages are stored bf16 at rest (convert_fuxi) — compare at that
    # precision; the reshape itself is lossless
    import jax.numpy as jnp

    want_bf16 = np.asarray(jnp.asarray(want, jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(got, want_bf16)


def _fengwu_case():
    from skyrim_tpu.models.fengwu import FengWuConfig, FengWuModel

    cfg = FengWuConfig(lat=49, lon=96, levels=3, surface_channels=2,
                       level_vars=2, modal_dim=8, fuser_dim=24, depth=2,
                       num_heads=2, window=(2, 4), patch=4)
    model = FengWuModel(cfg)
    rng = np.random.default_rng(0)
    from skyrim_tpu.ops.windows import earth_bias_table_size

    n_rel = earth_bias_table_size((1, *cfg.window))
    sd = {}
    group_ch = [cfg.surface_channels] + [cfg.levels] * cfg.level_vars
    for g, ci in enumerate(group_ch):
        sd[f"encoders.{g}.weight"] = rng.normal(
            size=(cfg.modal_dim, model.n_history * ci, cfg.patch, cfg.patch)
        ).astype(np.float32)
        sd[f"encoders.{g}.bias"] = rng.normal(
            size=(cfg.modal_dim,)).astype(np.float32)
    D = cfg.fuser_dim
    sd["fuse_in.weight"] = rng.normal(
        size=(D, cfg.modal_dim * len(group_ch))).astype(np.float32)
    sd["fuse_in.bias"] = rng.normal(size=(D,)).astype(np.float32)
    for i in range(cfg.depth):
        p = f"fuser.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{p}.{ln}.weight"] = rng.normal(size=(D,)).astype(np.float32)
            sd[f"{p}.{ln}.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[f"{p}.attn.qkv.weight"] = rng.normal(
            size=(3 * D, D)).astype(np.float32)
        sd[f"{p}.attn.qkv.bias"] = rng.normal(size=(3 * D,)).astype(np.float32)
        sd[f"{p}.attn.relative_position_bias_table"] = rng.normal(
            size=(n_rel, cfg.num_heads)).astype(np.float32)
        sd[f"{p}.attn.proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{p}.attn.proj.bias"] = rng.normal(size=(D,)).astype(np.float32)
        sd[f"{p}.mlp.fc1.weight"] = rng.normal(
            size=(4 * D, D)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = rng.normal(size=(4 * D,)).astype(np.float32)
        sd[f"{p}.mlp.fc2.weight"] = rng.normal(
            size=(D, 4 * D)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = rng.normal(size=(D,)).astype(np.float32)
    for g, co in enumerate(group_ch):
        sd[f"decoders.{g}.weight"] = rng.normal(
            size=(D, co, cfg.patch, cfg.patch)).astype(np.float32)
        sd[f"decoders.{g}.bias"] = rng.normal(size=(co,)).astype(np.float32)
    return model, cfg, sd


def _fengwu_trace(sd, cfg, n_groups):
    tr = _Trace()
    for g in range(n_groups):
        tr.op("Conv", sd[f"encoders.{g}.weight"], sd[f"encoders.{g}.bias"])
    tr.linear(sd["fuse_in.weight"], sd["fuse_in.bias"])
    wlen = cfg.window[0] * cfg.window[1]
    for i in range(cfg.depth):
        _trace_v1_block(tr, sd, f"fuser.{i}", (1, 2, wlen, wlen))
    for g in range(n_groups):
        tr.op("ConvTranspose", sd[f"decoders.{g}.weight"],
              sd[f"decoders.{g}.bias"])
    return tr.build()


def test_fengwu_rename_roundtrip():
    model, cfg, sd = _fengwu_case()
    graph = _fengwu_trace(sd, cfg, 1 + cfg.level_vars)
    renamed = rename_fengwu_graph(graph, cfg, n_history=model.n_history)
    assert set(renamed) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(renamed[k], sd[k], err_msg=k)
    converted = convert.convert_fengwu(model, renamed)
    assert "net" in converted and "fuse_in" in converted["net"]


def test_fengwu_config_derived_from_graph():
    """FengWuConfig widths come from the artifact's own tensors —
    whatever the real checkpoint is, the model matches it."""
    model, cfg, sd = _fengwu_case()
    graph = _fengwu_trace(sd, cfg, 1 + cfg.level_vars)
    derived = fengwu_config_from_graph(graph, lat=cfg.lat, lon=cfg.lon,
                                       n_history=model.n_history)
    assert derived.modal_dim == cfg.modal_dim
    assert derived.fuser_dim == cfg.fuser_dim
    assert derived.depth == cfg.depth
    assert derived.num_heads == cfg.num_heads
    assert derived.window == cfg.window
    assert derived.patch == cfg.patch
    assert derived.surface_channels == cfg.surface_channels
    assert derived.level_vars == cfg.level_vars
    assert derived.levels == cfg.levels


def test_fengwu_config_derived_from_sd():
    model, cfg, sd = _fengwu_case()
    derived = convert.fengwu_config_from_sd(sd, lat=cfg.lat, lon=cfg.lon,
                                            n_history=model.n_history)
    assert derived.fuser_dim == cfg.fuser_dim
    assert derived.depth == cfg.depth
    assert derived.window == cfg.window


def test_rename_fails_loudly_on_wrong_architecture():
    model, sd, _ = _fuxi_case()
    cfg = model.cfg
    graph = _fuxi_trace(sd, cfg, "stages.0")
    bad = dataclasses_replace_depth(cfg, cfg.depth + 2)
    with pytest.raises(ValueError, match="not found in"):
        rename_fuxi_graph(graph, bad, stage=0, n_history=model.n_history)


def dataclasses_replace_depth(cfg, depth):
    import dataclasses

    return dataclasses.replace(cfg, depth=depth)


def test_looks_exporter_named():
    assert looks_exporter_named(["onnx::MatMul_1", "1007", "t3"])
    assert not looks_exporter_named(
        ["stages.0.down.weight", "fuse_in.bias", "encoders.0.weight"])
