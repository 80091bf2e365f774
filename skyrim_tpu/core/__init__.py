from skyrim_tpu.core.prediction import (  # noqa: F401
    GlobalPrediction,
    GlobalPredictionRollout,
)
from skyrim_tpu.core.model import GlobalModel, adjust_lead_time  # noqa: F401
from skyrim_tpu.core.ensemble import GlobalEnsemble  # noqa: F401
from skyrim_tpu.core.skyrim import Skyrim  # noqa: F401
