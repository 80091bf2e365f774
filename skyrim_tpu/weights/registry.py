"""Weight registry: checkpoint cache + conversion entry points.

Replaces earth2mip's ``registry.get_model("e2mip://...")`` download/cache
(reference skyrim/core/models/pangu.py:45-46, SURVEY.md §2.9): model
parameters live as orbax checkpoints under ``SKYRIM_WEIGHTS_DIR``
(default ``~/.cache/skyrim_tpu/weights/<model>``).  ``load_params``
resolution order:

1. an existing orbax checkpoint for the model name,
2. a torch/onnx file staged for conversion (weights/convert.py),
3. fresh random initialization (logged loudly — offline environments
   cannot download the reference checkpoints).
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

from skyrim_tpu.io.save import LOCAL_CACHE
from skyrim_tpu.utils.logging import logger


def checkpoint_dir(model_name: str) -> Path:
    root = os.environ.get("SKYRIM_WEIGHTS_DIR", os.path.join(LOCAL_CACHE, "weights"))
    return Path(root) / model_name


def save_checkpoint(model_name: str, params, step: int = 0) -> str:
    import orbax.checkpoint as ocp

    if isinstance(params, dict) and "cache" in params:
        # derived data (PrognosticModel.prepare_params rebuilds it on load)
        params = {k: v for k, v in params.items() if k != "cache"}
    path = checkpoint_dir(model_name) / str(step)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.absolute(), params, force=True)
    ckptr.wait_until_finished()
    logger.success("saved checkpoint %s", path)
    return str(path)


def load_checkpoint(model_name: str, step: int | None = None, template=None):
    import orbax.checkpoint as ocp

    base = checkpoint_dir(model_name)
    if not base.exists():
        raise FileNotFoundError(f"no checkpoints under {base}")
    steps = sorted(int(p.name) for p in base.iterdir() if p.name.isdigit())
    if not steps:
        raise FileNotFoundError(f"no checkpoint steps under {base}")
    step = steps[-1] if step is None else step
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        restored = ckptr.restore(
            (base / str(step)).absolute(),
            ocp.args.StandardRestore(template),
        )
    else:
        restored = ckptr.restore((base / str(step)).absolute())
    logger.info("restored %s checkpoint step %d", model_name, step)
    return restored


def load_params(model, rng=None, allow_init: bool = True):
    """Best-effort parameter load for a PrognosticModel instance."""
    try:
        template = None
        return model.prepare_params(load_checkpoint(model.name))
    except FileNotFoundError:
        pass
    staged = checkpoint_dir(model.name).with_suffix(".pt")
    if staged.exists():
        from skyrim_tpu.weights.convert import convert_torch_file

        params = convert_torch_file(model, staged)
        save_checkpoint(model.name, params)
        return model.prepare_params(params)
    if not allow_init:
        raise FileNotFoundError(
            f"no weights for {model.name!r}; set SKYRIM_WEIGHTS_DIR or stage a "
            f"torch file at {staged}"
        )
    logger.warning(
        "no pretrained weights for %r — using random initialization "
        "(outputs are not meteorologically meaningful)", model.name
    )
    rng = rng if rng is not None else jax.random.key(0)
    return model.init_params(rng)
