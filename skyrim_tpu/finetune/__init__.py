from skyrim_tpu.finetune.trainer import Trainer, TrainConfig  # noqa: F401
from skyrim_tpu.finetune.dataset import FineTuneDataset  # noqa: F401
