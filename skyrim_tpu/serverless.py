"""Serverless execution layer (reference skyrim/modal/forecast.py).

The reference offloads forecasts to a Modal A100 container and serves a
JupyterLab over the output volume (modal/forecast.py:44-100).  The
TPU-native equivalent keeps the same contract — ``run_inference`` with
CLI-mirroring kwargs, a shared output volume, ``run_analysis`` for
inspection — defined lazily so the module imports cleanly where modal
is not installed (this build environment has no modal and no egress;
the CLI's ``--modal``-style offload degrades to a clear error).

On TPU pods the more common deployment is direct: provision a slice,
``pip install skyrim-tpu``, run ``forecast`` — there is no CUDA image to
pull and cold-start is the JAX compile (cached after the first run).
"""

from __future__ import annotations

import os

from skyrim_tpu.utils.logging import logger

MODAL_ENV = os.environ.get("MODAL_ENV", "dev")


def _require_modal():
    try:
        import modal  # type: ignore

        return modal
    except ImportError as e:
        raise RuntimeError(
            "serverless execution requires the `modal` package; install it "
            "and configure credentials, or run the CLI directly on a TPU VM"
        ) from e


def build_app():
    """Construct the Modal app (reference modal/forecast.py:21-57)."""
    modal = _require_modal()

    app = modal.App(f"skyrim-tpu-forecast-{MODAL_ENV}")
    image = (
        modal.Image.debian_slim()
        .pip_install("jax[tpu]", "flax", "optax", "orbax-checkpoint")
        .pip_install("skyrim-tpu")
    )
    vol = modal.Volume.from_name("skyrim-tpu-outputs", create_if_missing=True)

    @app.function(image=image, volumes={"/outputs": vol}, timeout=900)
    def run_inference(**kwargs):
        from skyrim_tpu.cli import run_forecast

        kwargs.setdefault("output_dir", "/outputs")
        result = run_forecast(**kwargs)
        if not str(kwargs["output_dir"]).startswith("s3://"):
            vol.commit()
        return result

    return app, run_inference


def run_remote(**kwargs):
    """Fire a remote forecast with CLI-mirroring kwargs."""
    _, run_inference = build_app()
    logger.info("dispatching remote forecast: %s", kwargs)
    return run_inference.remote(**kwargs)


def build_analysis_app(token: str | None = None):
    """Analysis server over the shared output volume (reference
    modal/forecast.py:60-100): a JupyterLab process on a CPU container
    with the volume mounted, exposed through a ``modal.forward`` tunnel
    guarded by a token."""
    import secrets
    import subprocess

    modal = _require_modal()
    token = token or secrets.token_urlsafe(16)

    app = modal.App(f"skyrim-tpu-analysis-{MODAL_ENV}")
    image = modal.Image.debian_slim().pip_install("jupyterlab", "skyrim-tpu")
    vol = modal.Volume.from_name("skyrim-tpu-outputs", create_if_missing=True)

    @app.function(image=image, volumes={"/outputs": vol}, timeout=86400)
    def run_analysis():
        with modal.forward(8888) as tunnel:
            logger.info("jupyter: %s/?token=%s", tunnel.url, token)
            subprocess.run(
                [
                    "jupyter", "lab",
                    "--no-browser", "--allow-root", "--ip=0.0.0.0",
                    "--port=8888", "--notebook-dir=/outputs",
                    f"--ServerApp.token={token}",
                ],
                check=True,
            )

    return app, run_analysis, token


def main(**kwargs):
    """Local entrypoint mirroring the CLI params (reference
    modal/forecast.py:103-150): ``main(model_name=…, date=…, …)``
    dispatches the forecast remotely."""
    return run_remote(**kwargs)
