"""Full-resolution numerical-stability tier (SURVEY §7 hard part 1).

Opt-in like the rest of the real-TPU tier (SKYRIM_TEST_TPU=1 + -m tpu).
The committed evidence artifact (STABILITY_r04.json, produced by
stability_evidence.py) runs 40 steps + a 10-step precision-divergence
curve; this test keeps the same machinery live at a runtime-sane depth
so regressions are caught by `pytest -m tpu`, not only at round end.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    not os.environ.get("SKYRIM_TEST_TPU"), reason="set SKYRIM_TEST_TPU=1"
)


def _flagship(name):
    from skyrim_tpu.models import MODELS

    return MODELS[name]("pangu6") if name == "pangu" else MODELS[name]()


@requires_tpu
@pytest.mark.parametrize("name", ["pangu", "fourcastnet_v2", "graphcast"])
def test_full_res_rollout_stable(name):
    """10 full-res steps from a climatological IC: finite throughout,
    no monotone normalized-RMS drift.

    The 1.05/step bound would catch genuine exponential drift while
    admitting the benign random-weight behaviors the decomposition
    harness (utils/stability.delta_decomposition) attributes: residual
    models random-walk at ≤ ~1.04/step over the second half (GraphCast
    measured 1.035, STABILITY artifacts), direct-prediction models
    contract (< 1)."""
    import jax

    from skyrim_tpu.utils.stability import (
        climatological_params,
        stability_rollout,
        synthetic_ic,
    )

    model = _flagship(name)
    params = climatological_params(model, jax.random.key(0))
    x0 = synthetic_ic(model)
    r = stability_rollout(model, params, x0, 10)
    assert r["all_finite"], f"{name}: non-finite output in rollout"
    assert r["growth_per_step_geo"] < 1.05, (
        f"{name}: monotone drift, growth/step {r['growth_per_step_geo']:.3f} "
        f"rms {r['rms']}"
    )
    assert max(r["amax"]) < 1e4, f"{name}: normalized max-abs {max(r['amax'])}"


@requires_tpu
def test_bf16_fp32_divergence_bounded_first_step():
    """One Pangu step bf16 vs fp32(highest): relative L2 stays at the
    bf16 rounding scale (≲5 %), not a structural divergence."""
    import jax

    from skyrim_tpu.utils.stability import (
        climatological_params,
        precision_divergence,
        synthetic_ic,
    )

    model = _flagship("pangu")
    params = climatological_params(model, jax.random.key(0))
    x0 = synthetic_ic(model)
    d = precision_divergence(model, params, x0, 2)
    assert np.all(np.isfinite(d["rel_l2"]))
    assert d["rel_l2"][0] < 0.05, f"step-1 bf16 divergence {d['rel_l2'][0]:.3g}"
