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
