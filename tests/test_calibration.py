"""Per-cohort probability calibration (ml/calibrate.py) and its
predictor integration (ml/predict.py schema-v2 ``calibration`` block).

Round-4 policy replacing the raw per-cohort Youden thresholds the
round-3 headline shipped (reference anchor minbody/train_mlp.py:141-187
ships one global Youden threshold and nothing else): isotonic curves
per cohort + ONE operating point on the calibrated probability.
"""

import numpy as np
import pytest

from nbodysimproject_tpu.ml.calibrate import (
    apply_curve, calibrated_probability, choose_global_threshold,
    evaluate_policy, fit_cohort_calibration, fit_isotonic_curve)


def _synthetic(n, rng, miscal):
    """Scores whose true P(y=1) is a known monotone distortion of the
    raw score: y ~ Bernoulli(raw ** miscal)."""
    raw = rng.uniform(0.01, 0.99, n)
    p_true = raw ** miscal
    y = (rng.uniform(size=n) < p_true).astype(np.float64)
    return raw, p_true, y


def test_isotonic_curve_monotone_and_calibrated():
    rng = np.random.RandomState(0)
    raw, p_true, y = _synthetic(20000, rng, miscal=3.0)
    curve = fit_isotonic_curve(raw, y)
    pc = apply_curve(raw, curve)
    # monotone in the raw score
    order = np.argsort(raw)
    assert (np.diff(pc[order]) >= -1e-12).all()
    assert pc.min() >= 0.0 and pc.max() <= 1.0
    # closer to the true conditional than the raw score is
    assert np.abs(pc - p_true).mean() < 0.5 * np.abs(raw - p_true).mean()


def test_cohort_calibration_fallback_rules():
    rng = np.random.RandomState(1)
    raw_a, _, y_a = _synthetic(5000, rng, miscal=2.0)
    raw_b, _, y_b = _synthetic(5000, rng, miscal=0.5)
    # cohort c: too small for its own curve; cohort d: one-class
    raw_c, _, y_c = _synthetic(100, rng, miscal=1.0)
    raw_d = rng.uniform(0.8, 0.99, 1000)
    y_d = np.ones(1000)
    raw = np.concatenate([raw_a, raw_b, raw_c, raw_d])
    y = np.concatenate([y_a, y_b, y_c, y_d])
    cohorts = np.array(["a"] * 5000 + ["b"] * 5000 + ["c"] * 100
                       + ["d"] * 1000)
    calib = fit_cohort_calibration(raw, y, cohorts)
    assert set(calib["cohorts"]) == {"a", "b"}
    assert calib["schema_version"] == 2

    pc = calibrated_probability(raw, cohorts, calib)
    # cohort-specific curves route per cohort...
    np.testing.assert_allclose(pc[cohorts == "a"],
                               apply_curve(raw_a, calib["cohorts"]["a"]))
    np.testing.assert_allclose(pc[cohorts == "b"],
                               apply_curve(raw_b, calib["cohorts"]["b"]))
    # ...and uncurved cohorts fall back to the pooled curve
    np.testing.assert_allclose(pc[cohorts == "c"],
                               apply_curve(raw_c, calib["__pooled__"]))
    # the two distortions are different, so the curves must differ
    probe = np.linspace(0.1, 0.9, 9)
    assert not np.allclose(apply_curve(probe, calib["cohorts"]["a"]),
                           apply_curve(probe, calib["cohorts"]["b"]),
                           atol=0.05)


def test_global_threshold_maximises_balanced_accuracy():
    rng = np.random.RandomState(2)
    # well-calibrated probabilities: BA-optimal threshold ~ the class
    # balance point; verify against a brute-force grid
    pc = rng.uniform(0, 1, 30000)
    y = (rng.uniform(size=30000) < pc).astype(np.float64)
    thr = choose_global_threshold(pc, y)

    def ba(t):
        pred = pc > t
        return 0.5 * (pred[y == 1].mean() + 1.0 - pred[y == 0].mean())

    best = max(ba(t) for t in np.linspace(0.01, 0.99, 99))
    assert ba(thr) >= best - 5e-3


def test_evaluate_policy_report_shape_and_overall():
    rng = np.random.RandomState(3)
    raw, _, y = _synthetic(4000, rng, miscal=2.0)
    cohorts = np.array((["hierarchical"] * 2000)
                       + (["close_encounter_boundary"] * 2000))
    calib = fit_cohort_calibration(raw, y, cohorts)
    thr = choose_global_threshold(
        calibrated_probability(raw, cohorts, calib), y)
    rep = evaluate_policy(raw, y, cohorts, calib, thr)
    assert {"hierarchical", "close_encounter_boundary", "__overall__",
            "__hierarchical_union__",
            "__close_encounter_union__"} <= set(rep)
    ov = rep["__overall__"]
    # recompute overall BA by hand
    pc = calibrated_probability(raw, cohorts, calib)
    pred = pc > thr
    tpr = pred[y == 1].mean()
    tnr = 1.0 - pred[y == 0].mean()
    assert ov["balanced_accuracy"] == pytest.approx(0.5 * (tpr + tnr))
    assert ov["threshold"] == pytest.approx(thr)


def test_predictor_applies_calibration_block():
    """ml/predict.py:102-108 — a shipped schema-v2 ``calibration``
    block reroutes predict_frame through the calibrated probability and
    the single global operating point (legacy per-cohort raw thresholds
    otherwise)."""
    import os

    import pandas as pd

    from nbodysimproject_tpu.ml.predict import StabilityPredictor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prefix = os.path.join(repo, "data", "headline_pre_")
    pred = StabilityPredictor(prefix=prefix, model="gbdt")
    rng = np.random.RandomState(4)
    df = pd.DataFrame(rng.normal(size=(64, len(pred.feature_names))),
                      columns=pred.feature_names)
    cohorts = np.array(["random"] * 32 + ["hierarchical"] * 32)

    pred.calibration = None
    raw_prob, legacy_verdict = pred.predict_frame(df, cohorts=cohorts)

    # synthetic block: identity pooled curve, a squaring curve for
    # 'hierarchical', operating point 0.3 on the calibrated scale
    xs = np.linspace(0, 1, 21)
    pred.calibration = {
        "schema_version": 2, "method": "isotonic",
        "global_threshold": 0.3,
        "__pooled__": {"x": list(xs), "y": list(xs)},
        "cohorts": {"hierarchical": {"x": list(xs), "y": list(xs ** 2)}},
    }
    prob, verdict, raw = pred.predict_frame(df, cohorts=cohorts,
                                            return_raw=True)
    np.testing.assert_allclose(raw, raw_prob)
    np.testing.assert_allclose(prob[:32], np.interp(raw[:32], xs, xs))
    np.testing.assert_allclose(prob[32:], np.interp(raw[32:], xs, xs ** 2))
    np.testing.assert_array_equal(verdict, prob > 0.3)
    assert not np.array_equal(verdict, legacy_verdict) or \
        (prob > 0.3).mean() in (0.0, 1.0)


def test_recall_floor_thresholds_meet_floor_with_max_precision():
    """choose_recall_floor_thresholds: the shipped point is the
    max-precision threshold whose within-cohort TPR still meets the
    floor — one step tighter would break the constraint."""
    from nbodysimproject_tpu.ml.calibrate import (
        choose_recall_floor_thresholds)

    rng = np.random.RandomState(5)
    # rare-positive cohort (like close_encounter): 2% stable
    n = 20000
    y = (rng.uniform(size=n) < 0.02).astype(np.float64)
    prob = np.clip(rng.normal(0.2 + 0.5 * y, 0.15), 0, 1)
    cohorts = np.array(["close_encounter"] * n)
    pts = choose_recall_floor_thresholds(prob, y, cohorts,
                                         {"close_encounter": 0.9})
    t = pts["close_encounter"]
    tpr = (prob[y == 1] > t).mean()
    assert tpr >= 0.9
    # maximal: the next-larger candidate threshold (the k-th positive
    # score itself) would drop below the floor
    pos = np.sort(prob[y == 1])[::-1]
    k = int(np.ceil(0.9 * len(pos)))
    assert (prob[y == 1] > pos[k - 1]).mean() < 0.9
    # a cohort absent from the data / with no positives is skipped
    pts2 = choose_recall_floor_thresholds(
        prob, np.zeros(n), cohorts, {"close_encounter": 0.9})
    assert pts2 == {}


def test_evaluate_policy_and_predictor_apply_cohort_points():
    """Per-cohort operating points override the global threshold for
    their cohort only, in both evaluate_policy and predict_frame."""
    import os

    import pandas as pd

    from nbodysimproject_tpu.ml.predict import StabilityPredictor

    rng = np.random.RandomState(6)
    raw, _, y = _synthetic(4000, rng, miscal=2.0)
    cohorts = np.array((["close_encounter"] * 2000)
                       + (["hierarchical"] * 2000))
    calib = fit_cohort_calibration(raw, y, cohorts)
    calib["global_threshold"] = 0.5
    calib["cohort_operating_points"] = {"close_encounter": 0.1}
    rep = evaluate_policy(raw, y, cohorts, calib, 0.5)
    rep_none = evaluate_policy(raw, y, cohorts, calib, 0.5,
                               cohort_points={})
    # the overridden cohort moves (lower threshold -> TPR up), the
    # other cohort is untouched
    assert rep["close_encounter"]["tpr"] >= \
        rep_none["close_encounter"]["tpr"]
    assert rep["hierarchical"] == rep_none["hierarchical"]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pred = StabilityPredictor(
        prefix=os.path.join(repo, "data", "headline_pre_"), model="gbdt")
    df = pd.DataFrame(rng.normal(size=(64, len(pred.feature_names))),
                      columns=pred.feature_names)
    pc_cohorts = np.array(["close_encounter"] * 32 + ["random"] * 32)
    xs = np.linspace(0, 1, 21)
    pred.calibration = {
        "schema_version": 2, "method": "isotonic",
        "global_threshold": 0.9,
        "cohort_operating_points": {"close_encounter": -1.0},
        "__pooled__": {"x": list(xs), "y": list(xs)}, "cohorts": {}}
    prob, verdict = pred.predict_frame(df, cohorts=pc_cohorts)
    # threshold -1 -> every CE row verdicts stable; others use 0.9
    assert verdict[:32].all()
    np.testing.assert_array_equal(verdict[32:], prob[32:] > 0.9)
    # without cohorts the global threshold applies everywhere
    prob2, verdict2 = pred.predict_frame(df)
    np.testing.assert_array_equal(verdict2, prob2 > 0.9)
