#!/usr/bin/env python
"""Probabilistic (horizon-averaged) stability labels on the boundary-
hierarchical cohort.

Motivation (ROADMAP round-4 item 2): tools/horizon_stability.py
measured that 14.25% of boundary-hierarchical is_stable labels flip
under horizon doubling — ~70% of the classifier's residual error on
the hardest slice is intrinsic finite-horizon label noise, not
underfit.  The reference bakes the horizon into the label definition
(a single n_steps verdict, stability_analyzer.py:226-231 applied at
ml_training_pipeline.py:33's clamped n_steps); this experiment asks
whether a SOFT label — the fraction of horizons at which the verdict
says stable, p = mean_h is_stable(h) — trains a better classifier
against a longer-horizon ground truth than any single hard label.

Protocol
  1. one boundary-hierarchical population (B systems, seeded);
  2. full-mode analysis at horizons {H, 2H, 4H} (train labels) and at
     8H on the held-out test split only (the truth proxy none of the
     training labels saw);
  3. four GBDTs on identical pre-integration features / splits:
       hard@H      — the production protocol (baseline)
       hard@4H     — "just integrate longer" control
       consensus   — majority vote over the three horizons
       soft        — cross-entropy on p via row duplication with
                     weights (p, 1-p)  [a proper scoring rule for
                     probabilistic targets]
  4. all evaluated on the test split against is_stable@8H (AUROC /
     balanced accuracy at 0.5), plus Brier score against the test
     systems' own horizon-averaged p.

Each horizon's frame is cached to data/prob_labels_h{steps}.csv.gz so
re-runs skip the integration.

Run on the TPU: python tools/prob_labels.py
Env: PL_B (16384), PL_STEPS (1000), PL_OUT, PL_COHORT
(``boundary_hier`` default; ``diverse3d`` runs the same protocol on
the 3-D diverse mixture — ROADMAP: the 3-D uncertain band is
chaos-noisy, so 3-D label denoising is where soft labels should pay).
Writes data/prob_labels_metrics.json (or *_3d for diverse3d).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np

B = int(os.environ.get("PL_B", 16384))
H = int(os.environ.get("PL_STEPS", 1000))
COHORT = os.environ.get("PL_COHORT", "boundary_hier")
_suffix = "" if COHORT == "boundary_hier" else f"_{COHORT}"
OUT = os.environ.get("PL_OUT", f"data/prob_labels_metrics{_suffix}.json")
HORIZONS = [H, 2 * H, 4 * H]
TRUTH_H = 8 * H
TEST_FRAC = 0.2


def log(msg):
    print(f"[prob-labels] {msg}", file=sys.stderr, flush=True)


def _analyze_cached(cache, mass, pos, vel, mask, soft, steps):
    """Full-mode analysis at ``steps``, cached as a schema-parity CSV."""
    import pandas as pd

    from nbodysimproject_tpu.analysis.batch import analyze_population
    from nbodysimproject_tpu.generators.pipeline import _PIPE_CFG
    from nbodysimproject_tpu.ml.dataset import StabilityDataset

    if os.path.exists(cache):
        log(f"cache hit {cache}")
        return pd.read_csv(cache, comment="#")
    t0 = time.perf_counter()
    df = analyze_population(mass, pos, vel, mask, _PIPE_CFG, G=1.0,
                            softening=np.asarray(soft), min_softening=0.0,
                            dt=0.01, n_steps=steps, mode="full",
                            show_progress=False)
    log(f"n_steps={steps}: analysed {len(df)} systems in "
        f"{time.perf_counter() - t0:.1f}s "
        f"(stable {df['is_stable'].mean():.4f})")
    StabilityDataset.save(cache, df, include_scaler=False)
    return df


def _fit(X, y, w=None):
    from sklearn.ensemble import HistGradientBoostingClassifier

    clf = HistGradientBoostingClassifier(
        max_iter=200, learning_rate=0.1, max_leaf_nodes=31,
        early_stopping=True, validation_fraction=0.1, random_state=0)
    clf.fit(X, y, sample_weight=w)
    return clf


def _fit_soft(X, p):
    """Cross-entropy on soft targets: each row enters twice, once as
    class 1 with weight p and once as class 0 with weight 1-p."""
    keep1 = p > 0.0
    keep0 = p < 1.0
    X2 = np.concatenate([X[keep1], X[keep0]])
    y2 = np.concatenate([np.ones(keep1.sum()), np.zeros(keep0.sum())])
    w2 = np.concatenate([p[keep1], 1.0 - p[keep0]])
    return _fit(X2, y2, w2)


def _eval(clf, X, y_true, p_true):
    from sklearn.metrics import balanced_accuracy_score, roc_auc_score

    prob = clf.predict_proba(X)[:, 1]
    return {
        "auroc_vs_truth": float(roc_auc_score(y_true, prob)),
        "balanced_accuracy_vs_truth": float(
            balanced_accuracy_score(y_true, prob > 0.5)),
        "brier_vs_soft": float(np.mean((prob - p_true) ** 2)),
    }


def main():
    import jax

    from nbodysimproject_tpu.generators.pipeline import (
        boundary_hier_population, diverse_population)
    from nbodysimproject_tpu.ml.dataset import StabilityDataset

    log(f"device={jax.devices()[0]} B={B} cohort={COHORT} "
        f"horizons={HORIZONS} truth={TRUTH_H}")
    if COHORT == "boundary_hier":
        mass, pos, vel, mask, soft, _t = boundary_hier_population(
            jax.random.PRNGKey(23), B, n_slots=8)
    elif COHORT == "diverse3d":
        mass, pos, vel, mask, soft, _t = diverse_population(
            jax.random.PRNGKey(23), B, n_slots=8, dim=3)
    else:
        raise SystemExit(f"unknown PL_COHORT {COHORT!r}")
    jax.block_until_ready(mass)
    soft_np = np.asarray(soft)

    frames = {}
    for steps in HORIZONS:
        frames[steps] = _analyze_cached(
            f"data/prob_labels{_suffix}_h{steps}.csv.gz", mass, pos, vel,
            mask, soft_np, steps)

    # deterministic split (the frames are row-aligned with the
    # generated population: analyze_population preserves order)
    rng = np.random.default_rng(42)
    perm = rng.permutation(B)
    n_test = int(round(B * TEST_FRAC))
    test_idx = np.sort(perm[:n_test])
    train_idx = np.sort(perm[n_test:])

    # truth proxy: 8x-horizon verdict on the test systems only
    take = lambda a: np.asarray(a)[test_idx]
    df_truth = _analyze_cached(
        f"data/prob_labels{_suffix}_truth_h{TRUTH_H}.csv.gz", take(mass),
        take(pos), take(vel), take(mask), soft_np[test_idx], TRUTH_H)
    y_truth = df_truth["is_stable"].values.astype(int)

    # pre-integration features from the base frame (IC-derived: same
    # at every horizon)
    Xall, _yh, names = StabilityDataset.load(
        f"data/prob_labels{_suffix}_h{H}.csv.gz", features="pre")
    labels = {s: frames[s]["is_stable"].values.astype(int)
              for s in HORIZONS}
    p_soft = np.mean([labels[s] for s in HORIZONS], axis=0)
    consensus = (p_soft >= 0.5).astype(int)

    res = {"B": B, "cohort": COHORT, "horizons": HORIZONS,
           "truth_horizon": TRUTH_H,
           "n_test": int(n_test), "features": "pre",
           "stable_fraction": {str(s): float(labels[s].mean())
                               for s in HORIZONS},
           "stable_fraction_truth": float(y_truth.mean()),
           "flip_rate_H_vs_4H": float(
               (labels[H] != labels[4 * H]).mean())}

    Xtr, Xte = Xall[train_idx], Xall[test_idx]
    p_te = p_soft[test_idx]

    arms = {
        "hard_1x": (_fit, (Xtr, labels[H][train_idx])),
        "hard_4x": (_fit, (Xtr, labels[4 * H][train_idx])),
        "consensus": (_fit, (Xtr, consensus[train_idx])),
        "soft": (_fit_soft, (Xtr, p_soft[train_idx])),
    }
    for name, (fn, args) in arms.items():
        t0 = time.perf_counter()
        clf = fn(*args)
        res[name] = _eval(clf, Xte, y_truth, p_te)
        log(f"{name}: {res[name]} ({time.perf_counter() - t0:.1f}s)")

    # how far even a perfect model could get: the training-protocol
    # labels themselves scored against the truth
    from sklearn.metrics import balanced_accuracy_score, roc_auc_score

    res["label_ceiling"] = {
        "hard_1x_vs_truth_ba": float(
            balanced_accuracy_score(y_truth, labels[H][test_idx])),
        "hard_4x_vs_truth_ba": float(
            balanced_accuracy_score(y_truth, labels[4 * H][test_idx])),
        "soft_vs_truth_auroc": float(roc_auc_score(y_truth, p_te)),
    }
    log(f"label ceilings: {res['label_ceiling']}")

    os.makedirs("data", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
