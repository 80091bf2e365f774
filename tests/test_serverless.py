"""Serverless layer exercised against a stubbed ``modal`` module — the
app/image/volume/function wiring and the remote dispatch contract
(reference skyrim/modal/forecast.py:21-150) become testable without the
real SDK or network."""

import sys
import types

import pytest


class _FakeFunction:
    def __init__(self, fn, meta):
        self.fn = fn
        self.meta = meta
        self.remote_calls = []

    def remote(self, **kwargs):
        self.remote_calls.append(kwargs)
        return {"dispatched": kwargs}

    def __call__(self, **kwargs):
        return self.fn(**kwargs)


class _FakeApp:
    def __init__(self, name):
        self.name = name
        self.functions = []

    def function(self, **meta):
        def deco(fn):
            f = _FakeFunction(fn, meta)
            self.functions.append(f)
            return f
        return deco


class _FakeImage:
    def __init__(self):
        self.pip = []

    def pip_install(self, *pkgs):
        self.pip.extend(pkgs)
        return self


class _FakeVolume:
    instances = []

    def __init__(self, name):
        self.name = name
        self.commits = 0
        _FakeVolume.instances.append(self)

    def commit(self):
        self.commits += 1


@pytest.fixture
def fake_modal(monkeypatch):
    mod = types.ModuleType("modal")
    mod.App = _FakeApp
    mod.Image = types.SimpleNamespace(debian_slim=lambda: _FakeImage())
    mod.Volume = types.SimpleNamespace(
        from_name=lambda name, create_if_missing=False: _FakeVolume(name)
    )
    mod.forward = None  # analysis app only references it at runtime
    monkeypatch.setitem(sys.modules, "modal", mod)
    _FakeVolume.instances.clear()
    return mod


def test_build_app_wiring(fake_modal):
    from skyrim_tpu.serverless import build_app

    app, run_inference = build_app()
    assert app.name.startswith("skyrim-tpu-forecast-")
    assert run_inference in app.functions
    meta = run_inference.meta
    assert "/outputs" in meta["volumes"]
    assert meta["timeout"] == 900  # the reference's 15-min hard cap
    assert "skyrim-tpu" in meta["image"].pip


def test_run_remote_dispatches_kwargs(fake_modal):
    from skyrim_tpu.serverless import run_remote

    out = run_remote(model_name="pangu", date="20240507", lead_time=24)
    assert out["dispatched"]["model_name"] == "pangu"


def test_run_inference_commits_volume_for_local_output(fake_modal, monkeypatch):
    from skyrim_tpu import serverless

    app, run_inference = serverless.build_app()
    import skyrim_tpu.cli as cli

    monkeypatch.setattr(cli, "run_forecast", lambda **kw: {"ok": kw})
    result = run_inference(model_name="pangu", output_dir="/outputs")
    assert result["ok"]["model_name"] == "pangu"
    vol = _FakeVolume.instances[0]
    assert vol.commits == 1  # local target → vol.commit (reference :55-56)

    # s3 target skips the commit
    result = run_inference(model_name="pangu", output_dir="s3://bkt/x")
    assert vol.commits == 1


def test_analysis_app_wiring(fake_modal):
    from skyrim_tpu.serverless import build_analysis_app

    app, run_analysis, token = build_analysis_app(token="tok123")
    assert app.name.startswith("skyrim-tpu-analysis-")
    assert token == "tok123"
    assert run_analysis.meta["timeout"] == 86400
    assert "/outputs" in run_analysis.meta["volumes"]


def test_missing_modal_raises_clear_error(monkeypatch):
    monkeypatch.setitem(sys.modules, "modal", None)
    from skyrim_tpu.serverless import _require_modal

    with pytest.raises((RuntimeError, ImportError), match="modal|import"):
        _require_modal()
