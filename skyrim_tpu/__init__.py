"""skyrim_tpu — TPU-native global weather forecasting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
secondlaw-ai/skyrim (reference: skyrim/core/skyrim.py): large AI weather
models (Pangu-Weather, GraphCast, FourCastNet v1/v2, DLWP, FuXi, FengWu)
run as autoregressive forecast rollouts, with operational initial-condition
sources (GFS/IFS/ENS/CDS), NetCDF/Zarr persistence, ensembles, evaluation,
plotting, a CLI — all built TPU-first: on-device `lax.scan` rollouts,
`jax.sharding.Mesh` domain decomposition, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist XLA executables across processes (off: SKYRIM_NO_JAX_CACHE).

    Weather-model steps are compiled once per (model, shape, sharding);
    every CLI run / bench / test process otherwise pays that compile
    again — minutes per model at 0.25°.  This only sets config knobs;
    jax backends stay uninitialized.
    """
    import os

    if os.environ.get("SKYRIM_NO_JAX_CACHE"):
        return
    try:
        import jax

        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "skyrim_tpu", "jax_cache"
            ),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from skyrim_tpu.channels import CHANNEL_SETS, parse_channel  # noqa: F401
from skyrim_tpu.field import Field  # noqa: F401


_LAZY = {
    "Skyrim": ("skyrim_tpu.core", "Skyrim"),
    "GlobalModel": ("skyrim_tpu.core", "GlobalModel"),
    "GlobalEnsemble": ("skyrim_tpu.core", "GlobalEnsemble"),
    "GlobalPrediction": ("skyrim_tpu.core", "GlobalPrediction"),
    "GlobalPredictionRollout": ("skyrim_tpu.core", "GlobalPredictionRollout"),
    "MODELS": ("skyrim_tpu.models", "MODELS"),
    "SaveConfig": ("skyrim_tpu.io", "SaveConfig"),
    "save_forecast": ("skyrim_tpu.io", "save_forecast"),
    "load_forecast": ("skyrim_tpu.io", "load_forecast"),
    "read_forecast": ("skyrim_tpu.io", "read_forecast"),
    "ic_ensemble_forecast": ("skyrim_tpu.core.ic_ensemble", "ic_ensemble_forecast"),
}


def __getattr__(name):
    # Lazy imports keep `import skyrim_tpu` light (no jax compile at import).
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'skyrim_tpu' has no attribute {name!r}")
