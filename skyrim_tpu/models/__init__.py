"""Model registry (reference skyrim/core/models/__init__.py:9-17).

Lazy: importing the registry doesn't build any model. ``MODELS[name]``
returns the PrognosticModel class; construct then ``init_params`` /
``load_params``.
"""

from __future__ import annotations

import importlib

from skyrim_tpu.models.base import ModelState, PrognosticModel  # noqa: F401

_MODEL_MODULES = {
    "pangu": ("skyrim_tpu.models.pangu", "PanguModel"),
    "fourcastnet": ("skyrim_tpu.models.afno", "FourCastNetModel"),
    "fourcastnet_v2": ("skyrim_tpu.models.sfno", "FourCastNetV2Model"),
    "dlwp": ("skyrim_tpu.models.dlwp", "DLWPModel"),
    "graphcast": ("skyrim_tpu.models.graphcast", "GraphCastModel"),
    "fuxi": ("skyrim_tpu.models.fuxi", "FuXiModel"),
    "fengwu": ("skyrim_tpu.models.fengwu", "FengWuModel"),
}


class _Registry(dict):
    def __missing__(self, name):
        if name not in _MODEL_MODULES:
            raise KeyError(
                f"unknown model {name!r}; available: {sorted(_MODEL_MODULES)}"
            )
        module_name, cls_name = _MODEL_MODULES[name]
        cls = getattr(importlib.import_module(module_name), cls_name)
        self[name] = cls
        return cls

    def __contains__(self, name):
        return name in _MODEL_MODULES

    def keys(self):
        return _MODEL_MODULES.keys()


MODELS = _Registry()

AVAILABLE_MODELS = list(_MODEL_MODULES)
