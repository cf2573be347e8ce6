"""Per-cohort probability calibration for the stability classifiers.

Replaces the round-3 raw per-cohort Youden thresholds (VERDICT round-3
next-round item 4): those traded overall balanced accuracy 0.940 ->
0.878 for within-cohort recall, and the close-encounter threshold of
0.008 bought its TPR at precision 0.054.  Isotonic regression per
cohort maps the model's raw score to an honest cohort-conditional
P(stable | x); a single cost-curve-chosen operating point on the
calibrated probability then serves every cohort at once, so nothing is
juggled per cohort at inference time.

Reference anchor: minbody/train_mlp.py:141-187 ships one global Youden
threshold and nothing else — this module is the productised
improvement on that operating-point rule.

Shipped metadata schema (``calibration`` block, schema_version 2):

    {"schema_version": 2, "method": "isotonic",
     "global_threshold": t,                    # on CALIBRATED prob
     "cohorts": {name: {"x": [...], "y": [...]}},
     "__pooled__": {"x": [...], "y": [...]}}   # fallback curve

Curves are stored as interpolation breakpoints (the isotonic fit's
unique thresholds), applied with ``np.interp`` — no sklearn needed at
inference time.
"""

from __future__ import annotations

import numpy as np


def fit_isotonic_curve(prob, y) -> dict:
    """Fit isotonic P(y=1 | prob) and return interp breakpoints."""
    from sklearn.isotonic import IsotonicRegression

    iso = IsotonicRegression(y_min=0.0, y_max=1.0, out_of_bounds="clip")
    iso.fit(np.asarray(prob, np.float64), np.asarray(y, np.float64))
    return {"x": [float(v) for v in iso.X_thresholds_],
            "y": [float(v) for v in iso.y_thresholds_]}


def apply_curve(prob, curve) -> np.ndarray:
    x = np.asarray(curve["x"], np.float64)
    yv = np.asarray(curve["y"], np.float64)
    if len(x) == 0:
        return np.asarray(prob, np.float64)
    return np.interp(np.asarray(prob, np.float64), x, yv)


def fit_cohort_calibration(prob, y, cohorts, *, min_rows: int = 500,
                           min_class: int = 25) -> dict:
    """Isotonic curves per cohort plus the pooled fallback.

    A cohort gets its own curve only when it has enough rows AND both
    classes are represented (an all-one-class cohort has no estimable
    conditional and falls back to the pooled curve, which at least
    preserves ranking).
    """
    prob = np.asarray(prob, np.float64)
    y = np.asarray(y, np.float64)
    cohorts = np.asarray([str(c) for c in cohorts])
    calib = {"schema_version": 2, "method": "isotonic",
             "__pooled__": fit_isotonic_curve(prob, y), "cohorts": {}}
    for c in sorted(set(cohorts.tolist())):
        sel = cohorts == c
        ys = y[sel]
        n_pos = int((ys == 1).sum())
        n_neg = int((ys == 0).sum())
        if sel.sum() >= min_rows and min(n_pos, n_neg) >= min_class:
            calib["cohorts"][c] = fit_isotonic_curve(prob[sel], ys)
    return calib


def calibrated_probability(prob, cohorts, calib) -> np.ndarray:
    """Map raw scores through the cohort's curve (pooled fallback)."""
    prob = np.asarray(prob, np.float64)
    out = apply_curve(prob, calib["__pooled__"])
    if cohorts is None:
        return out
    cohorts = np.asarray([str(c) for c in cohorts])
    for c, curve in calib.get("cohorts", {}).items():
        sel = cohorts == c
        if sel.any():
            out[sel] = apply_curve(prob[sel], curve)
    return out


def _binary_report(y, pred, prob=None) -> dict:
    y = np.asarray(y, np.float64)
    pred = np.asarray(pred, np.float64)
    tp = float(((pred == 1) & (y == 1)).sum())
    tn = float(((pred == 0) & (y == 0)).sum())
    fp = float(((pred == 1) & (y == 0)).sum())
    fn = float(((pred == 0) & (y == 1)).sum())
    tpr = tp / max(tp + fn, 1.0)
    tnr = tn / max(tn + fp, 1.0)
    out = {"n": int(len(y)), "stable_fraction": float(y.mean()),
           "tpr": tpr, "tnr": tnr,
           "precision": tp / max(tp + fp, 1.0),
           "balanced_accuracy": 0.5 * (tpr + tnr),
           "accuracy": (tp + tn) / max(len(y), 1)}
    if prob is not None and 0.0 < y.mean() < 1.0:
        from sklearn.metrics import roc_auc_score

        out["auroc"] = float(roc_auc_score(y, prob))
    return out


def choose_global_threshold(prob_cal, y, *, grid_points: int = 199) -> float:
    """Operating point on the CALIBRATED probability: maximise overall
    balanced accuracy over a quantile grid (the cost curve with equal
    class weights — the metric the round-3 per-cohort thresholds
    sacrificed)."""
    prob_cal = np.asarray(prob_cal, np.float64)
    y = np.asarray(y, np.float64)
    best_t, best_ba = 0.5, -1.0
    qs = np.unique(np.quantile(prob_cal,
                               np.linspace(0.005, 0.995, grid_points)))
    for t in qs:
        pred = prob_cal > t
        tpr = pred[y == 1].mean() if (y == 1).any() else 0.0
        tnr = 1.0 - pred[y == 0].mean() if (y == 0).any() else 0.0
        ba = 0.5 * (tpr + tnr)
        if ba > best_ba:
            best_ba, best_t = ba, float(t)
    return best_t


def choose_recall_floor_thresholds(prob_cal, y, cohorts, floors, *,
                                   min_pos: int = 10,
                                   counts_out: dict | None = None) -> dict:
    """Recall-constrained per-cohort operating points on the CALIBRATED
    probability: for each cohort named in ``floors`` (cohort -> minimum
    TPR), the LARGEST threshold whose within-cohort TPR still meets the
    floor — i.e. the maximum-precision point subject to the recall
    constraint.  Calibration is monotone, so this is exactly the
    cohort's ROC point at that recall; shipping it alongside the global
    BA-optimal threshold lets rare-positive cohorts (close-encounter:
    ~0.5% stable) keep recall without dragging every other cohort's
    operating point with them (the round-3 failure mode).

    A key may also be a TUPLE of cohort names: their positives are
    pooled for the fit and every member ships the same threshold —
    the right call when the individual cohorts are too rare-positive
    to pin a recall floor on their own (close-encounter: a 131k draw
    yields only ~35 positives per cohort per split half).

    Returns {cohort: threshold} for the cohorts with at least
    ``min_pos`` positives in the fit split; cohorts below that are
    skipped with a warning (a floor pinned to a handful of positive
    scores — in the limit, nextafter() below a single sample — is
    noise, not an operating point; ``fit_cohort_calibration`` applies
    the same philosophy via ``min_class``).  ``counts_out``, if given,
    receives {cohort: n_positives_used} for every SHIPPED point so the
    calibration block can record the evidence behind each threshold."""
    prob_cal = np.asarray(prob_cal, np.float64)
    y = np.asarray(y, np.float64)
    cohorts = np.asarray([str(c) for c in cohorts])
    points = {}
    for key, floor in floors.items():
        members = (key,) if isinstance(key, str) else tuple(key)
        sel = np.isin(cohorts, members) & (y == 1)
        n_pos = int(sel.sum())
        if n_pos < int(min_pos):
            if n_pos:
                print(f"[calibrate] recall floor for {members} skipped: "
                      f"{n_pos} positive(s) < min_pos={min_pos}")
            continue
        pos = np.sort(prob_cal[sel])[::-1]
        k = int(np.ceil(float(floor) * len(pos)))
        k = min(max(k, 1), len(pos))
        # pred = prob > thr is strict, so step just below the k-th
        # largest positive score to include it
        thr = float(np.nextafter(pos[k - 1], -np.inf))
        for c in members:
            points[c] = thr
            if counts_out is not None:
                counts_out[c] = n_pos
    return points


def evaluate_policy(prob_raw, y, cohorts, calib, thr,
                    cohort_points=None) -> dict:
    """Per-cohort + union + overall test report at the shipped policy
    (calibrated probability > thr, with any per-cohort operating
    points from ``calib["cohort_operating_points"]`` overriding the
    global threshold for their cohort), mirroring the layout of
    tools/run_headline_dataset.py::calibrated_operating_points so the
    metrics JSONs stay comparable across rounds."""
    cohorts = np.asarray([str(c) for c in cohorts])
    pc = calibrated_probability(prob_raw, cohorts, calib)
    if cohort_points is None:
        cohort_points = calib.get("cohort_operating_points", {})
    thr_vec = np.full(len(pc), float(thr))
    for c, t in (cohort_points or {}).items():
        thr_vec[cohorts == c] = float(t)
    pred = (pc > thr_vec).astype(np.float64)
    report = {}
    for c in sorted(set(cohorts.tolist())):
        sel = cohorts == c
        report[c] = _binary_report(y[sel], pred[sel], pc[sel])
        report[c]["calibrated"] = c in calib.get("cohorts", {})
    for stem in ("hierarchical", "close_encounter"):
        sel = np.array([c.startswith(stem) for c in cohorts])
        if sel.any():
            report[f"__{stem}_union__"] = _binary_report(
                y[sel], pred[sel], pc[sel])
    report["__overall__"] = _binary_report(y, pred, pc)
    report["__overall__"]["threshold"] = float(thr)
    return report
