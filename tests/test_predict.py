"""Fast inference path: ic_feature_frame + StabilityPredictor.

The product's serving claim (reference README.md:56: ML stability
prediction >= 1e5x faster than direct integration) requires scoring
NEW initial conditions without integrating.  Contract under test:

1. ``ic_feature_frame`` reproduces the pre-integration columns of an
   ``analyze_population`` frame bitwise on the same population (they
   are computed before the first step there too).
2. ``StabilityPredictor`` loads the committed headline artifacts and
   scores a fresh population end to end, applying the shipped
   per-cohort operating points.
"""

import os

import jax
import numpy as np
import pytest

from nbodysimproject_tpu.analysis.batch import (analyze_population,
                                                ic_feature_frame)
from nbodysimproject_tpu.core.config import SimConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _population(B=6, n=3, d=2, seed=0, n_slots=None):
    """(B, n_slots, d) population with n valid bodies — the slot-padded
    layout every pipeline frame uses (generators emit n_slots=8)."""
    rng = np.random.default_rng(seed)
    n_slots = n if n_slots is None else n_slots
    pos = rng.normal(size=(B, n_slots, d)) * 1.5
    vel = 0.1 * rng.normal(size=(B, n_slots, d))
    mass = np.abs(rng.normal(size=(B, n_slots))) + 0.5
    mask = np.arange(n_slots)[None, :] < n
    mask = np.broadcast_to(mask, (B, n_slots)).copy()
    return mass, pos, vel, mask


def test_ic_frame_matches_analysis_pre_columns():
    cfg = SimConfig(integrator_mode="ham_soft", slot_bucket=8)
    mass, pos, vel, mask = _population()
    kw = dict(G=1.0, softening=0.05, min_softening=0.0, dt=0.01)
    df_ic = ic_feature_frame(mass, pos, vel, mask, cfg, **kw)
    df_an = analyze_population(mass, pos, vel, mask, cfg, n_steps=40,
                               mode="full", show_progress=False, **kw)
    assert len(df_ic.columns) > 40
    for c in df_ic.columns:
        assert c in df_an.columns, c
        a = df_ic[c].to_numpy()
        b = df_an[c].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_array_equal(a, b, err_msg=c)
        else:
            assert (a == b).all(), c


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REPO, "data",
                                    "headline_pre_model_metadata.json")),
    reason="headline artifacts not present")
def test_predictor_scores_fresh_population():
    from nbodysimproject_tpu.ml.predict import StabilityPredictor

    prefix = os.path.join(REPO, "data", "headline_pre_")
    cfg = SimConfig(integrator_mode="ham_soft", slot_bucket=8,
                    fast_float32=True)
    mass, pos, vel, mask = _population(B=8, seed=3, n_slots=8)
    for kind in ("gbdt", "mlp"):
        pred = StabilityPredictor(prefix=prefix, model=kind)
        prob, stable = pred.predict_population(
            mass, pos, vel, mask, cfg, G=1.0, softening=0.05,
            min_softening=0.0, dt=0.01,
            cohorts=["random"] * 8)
        assert prob.shape == (8,) and np.isfinite(prob).all()
        assert ((prob >= 0) & (prob <= 1)).all()
        assert stable.dtype == bool
        # the shipped operating-point policy must actually be applied:
        # schema-v2 calibration block (global threshold + per-cohort
        # recall-floor overrides) when present, legacy per-cohort raw
        # thresholds otherwise
        if pred.calibration:
            pts = pred.calibration.get("cohort_operating_points") or {}
            thr = float(pts.get("random",
                                pred.calibration["global_threshold"]))
            np.testing.assert_array_equal(stable, prob > thr)
        elif "random" in pred.cohort_thresholds:
            thr = pred.cohort_thresholds["random"]
            np.testing.assert_array_equal(stable, prob > thr)
