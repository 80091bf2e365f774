"""Artifact → forecast rehearsal (round-5 ask: real-weight ingestion as
a single run, not a project).

End-to-end: an exporter-faithful artifact FILE on disk → the public
loader (``convert_fuxi_onnx_cascade`` — three per-stage traced ONNX
files, as the released FuXi ships; ``load_fengwu_from_artifact`` —
config DERIVED from the artifact's tensor shapes) → the ``Skyrim``
facade's ``predict`` → a saved forecast read back and checked against a
direct rollout with the same weights.  The same flow with a real
checkpoint URL is the runbook in docs/WEIGHTS.md (reference loads its
artifacts at skyrim/core/models/fuxi.py:53-54, fengwu.py:44-53).
"""

from __future__ import annotations

import numpy as np
import pytest

from skyrim_tpu.weights import convert, onnx_io


def _write_fuxi_cascade(tmp_path):
    """Three exporter-named per-stage ONNX files, as released."""
    from tests.test_onnx_rename import _Trace, _fuxi_case, _trace_v2_block

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
    return model, paths


def test_fuxi_cascade_artifact_to_saved_forecast(tmp_path):
    from skyrim_tpu.core.skyrim import Skyrim
    from skyrim_tpu.data.ic import get_data_source
    from skyrim_tpu.io.save import load_forecast
    from skyrim_tpu.rollout import initial_condition_from_field, scan_rollout

    model, paths = _write_fuxi_cascade(tmp_path)
    params = convert.convert_fuxi_onnx_cascade(model, paths)

    sky = Skyrim("fuxi", ic_source="synthetic",
                 model_kwargs={"cfg": model.cfg}, params=params)
    assert sky.model.params is params  # the artifact weights are live
    pred, out_paths = sky.predict(
        "20240101", "0000", lead_time=12, save=True,
        save_config={"output_dir": str(tmp_path), "forecast_id": "rehearsal"},
    )
    assert len(out_paths) >= 2, "12 h at 6 h step → one file per step"
    frames = []
    for p in out_paths:
        saved = load_forecast(p)
        assert list(saved.coords["channel"]) == list(model.channels)
        frames.append(
            saved.transpose("time", "channel", "lat", "lon").data
        )
    data = np.concatenate(frames, axis=0)
    assert np.isfinite(data).all()

    # the saved fields equal a direct rollout with the same converted
    # weights from the same (deterministic) synthetic IC — weights and
    # IC actually flowed through the facade, end to end
    src = get_data_source(list(model.channels), "synthetic", grid=model.grid)
    import datetime

    ic_field = src.fetch(datetime.datetime(2024, 1, 1),
                         n_history=model.n_history,
                         time_step=model.time_step)
    x0 = initial_condition_from_field(model, ic_field)
    state = model.init_state(params, x0)
    _, ys = scan_rollout(model, params, state, n_steps=2)
    np.testing.assert_allclose(
        data[-2:], np.asarray(ys)[:2], rtol=2e-2, atol=2e-2,
    )


def test_fengwu_artifact_to_saved_forecast(tmp_path):
    """Single traced-ONNX FengWu artifact: config derived from the
    file's own tensor shapes, then facade → saved forecast."""
    from tests.test_onnx_rename import _fengwu_case, _fengwu_trace, _Trace, \
        _trace_v1_block

    from skyrim_tpu.core.skyrim import Skyrim
    from skyrim_tpu.io.save import load_forecast

    model0, cfg, sd = _fengwu_case()
    tr = _Trace()
    n_groups = 1 + cfg.level_vars
    for g in range(n_groups):
        tr.op("Conv", sd[f"encoders.{g}.weight"], sd[f"encoders.{g}.bias"])
    tr.linear(sd["fuse_in.weight"], sd["fuse_in.bias"])
    wlen = cfg.window[0] * cfg.window[1]
    for i in range(cfg.depth):
        _trace_v1_block(tr, sd, f"fuser.{i}", (1, 2, wlen, wlen))
    for g in range(n_groups):
        tr.op("ConvTranspose", sd[f"decoders.{g}.weight"],
              sd[f"decoders.{g}.bias"])
    data = onnx_io.build_onnx(tr.tensors, nodes=tr.nodes,
                              graph_inputs=("input",))
    f = tmp_path / "fengwu.onnx"
    f.write_bytes(data)

    model, params = convert.load_fengwu_from_artifact(
        f, lat=cfg.lat, lon=cfg.lon
    )
    # the config was derived from the artifact, not assumed
    assert model.cfg == cfg

    sky = Skyrim("fengwu", ic_source="synthetic",
                 model_kwargs={"cfg": model.cfg}, params=params)
    pred, out_paths = sky.predict(
        "20240101", "0000", lead_time=6, save=True,
        save_config={"output_dir": str(tmp_path), "forecast_id": "fw"},
    )
    assert out_paths
    saved = load_forecast(out_paths[0])
    arr = saved.transpose("time", "channel", "lat", "lon").data
    assert np.isfinite(arr).all()
    assert list(saved.coords["channel"]) == list(model.channels)
