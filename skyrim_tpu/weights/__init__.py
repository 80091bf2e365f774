from skyrim_tpu.weights.registry import (  # noqa: F401
    load_params,
    save_checkpoint,
    load_checkpoint,
    checkpoint_dir,
)
