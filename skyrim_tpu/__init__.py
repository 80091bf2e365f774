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


def __getattr__(name):
    # Lazy imports keep `import skyrim_tpu` light (no jax compile at import).
    if name == "Skyrim":
        from skyrim_tpu.core import Skyrim

        return Skyrim
    if name == "GlobalPrediction":
        from skyrim_tpu.core import GlobalPrediction

        return GlobalPrediction
    if name == "MODELS":
        from skyrim_tpu.models import MODELS

        return MODELS
    raise AttributeError(f"module 'skyrim_tpu' has no attribute {name!r}")
