#!/usr/bin/env python
"""Active-learning acquisition-policy evaluation (VERDICT round-2
stretch item 9 / ROADMAP item 6).

Pool-based protocol on the labelled headline dataset: the pool's
labels exist but are hidden; an acquisition policy reveals them in
rounds (revealing a label "costs" one full-mode stability analysis —
the expensive step this loop is designed to spend wisely).  Two arms:

* ``uncertain`` — rank the unlabelled pool by |p - tau| under the
  current classifier (tau = the validation-Youden threshold) and
  reveal the most uncertain K,
* ``random``   — reveal a uniform K (the baseline every AL paper
  compares against).

Both arms start from the same seed set and are evaluated on the same
held-out test split after every round (AUROC + balanced accuracy),
reporting the per-revealed-label AUROC delta.  Classifier: the
pre-integration-features GBDT (sklearn HistGradientBoosting — the
fallback estimator of ml/train_lightgbm.py), so the result speaks to
the honest (non-circular) headline protocol.

Reference hook: the reference has no AL loop; its closest analog is
the focused boundary datasets (minbody/ml_training_pipeline.py:137-199)
— hand-picked hard cohorts.  This tool automates that selection.

Usage:
    AL_CSV=data/stability_1M.csv.gz python tools/active_learning.py
Writes data/active_learning_metrics.json.
"""

import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

CSV = os.environ.get("AL_CSV", "data/stability_1M.csv.gz")
SEED0 = int(os.environ.get("AL_SEED_SIZE", 8192))
K = int(os.environ.get("AL_ACQUIRE", 8192))
ROUNDS = int(os.environ.get("AL_ROUNDS", 5))
TEST_N = int(os.environ.get("AL_TEST_N", 65536))
POOL_N = int(os.environ.get("AL_POOL_N", 262144))
OUT = os.environ.get("AL_OUT", "data/active_learning_metrics.json")
RNG = np.random.default_rng(int(os.environ.get("AL_SEED", 42)))


def log(msg):
    print(f"[al] {msg}", file=sys.stderr, flush=True)


def _fit(X, y):
    from sklearn.ensemble import HistGradientBoostingClassifier

    clf = HistGradientBoostingClassifier(
        max_iter=200, learning_rate=0.1, max_leaf_nodes=31,
        early_stopping=True, validation_fraction=0.1, random_state=0)
    clf.fit(X, y)
    return clf


def _youden(prob, y):
    order = np.quantile(prob, np.linspace(0.01, 0.99, 99))
    best_t, best_j = 0.5, -1.0
    for t in order:
        pred = prob > t
        tpr = pred[y == 1].mean() if (y == 1).any() else 0.0
        tnr = 1.0 - pred[y == 0].mean() if (y == 0).any() else 0.0
        if tpr + tnr - 1.0 > best_j:
            best_j, best_t = tpr + tnr - 1.0, float(t)
    return best_t


def _eval(clf, X, y):
    from sklearn.metrics import balanced_accuracy_score, roc_auc_score

    prob = clf.predict_proba(X)[:, 1]
    return {"auroc": float(roc_auc_score(y, prob)),
            "balanced_accuracy": float(
                balanced_accuracy_score(y, prob > 0.5))}


def run_arm(name, X_pool, y_pool, X_test, y_test, seed_idx):
    labelled = list(seed_idx)
    unlabelled = np.setdiff1d(np.arange(len(y_pool)), seed_idx)
    curve = []
    for r in range(ROUNDS + 1):
        t0 = time.perf_counter()
        clf = _fit(X_pool[labelled], y_pool[labelled])
        m = _eval(clf, X_test, y_test)
        m["n_labelled"] = len(labelled)
        curve.append(m)
        log(f"{name} round {r}: n={len(labelled)} "
            f"AUROC={m['auroc']:.4f} BA={m['balanced_accuracy']:.4f} "
            f"({time.perf_counter() - t0:.0f}s)")
        if r == ROUNDS or not len(unlabelled):
            break
        if name == "uncertain":
            prob_lab = clf.predict_proba(X_pool[labelled])[:, 1]
            tau = _youden(prob_lab, y_pool[labelled])
            prob = clf.predict_proba(X_pool[unlabelled])[:, 1]
            pick = np.argsort(np.abs(prob - tau))[:K]
        else:
            pick = RNG.choice(len(unlabelled), size=min(K, len(unlabelled)),
                              replace=False)
        chosen = unlabelled[pick]
        labelled.extend(chosen.tolist())
        unlabelled = np.setdiff1d(unlabelled, chosen)
    return curve


def main():
    from nbodysimproject_tpu.ml.dataset import StabilityDataset

    log(f"loading {CSV} (pre-integration features)")
    X, y, feat = StabilityDataset.load(CSV, features="pre")
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    n = len(y)
    perm = RNG.permutation(n)
    test_idx = perm[:TEST_N]
    pool_idx = perm[TEST_N:TEST_N + POOL_N]
    X_test, y_test = X[test_idx], y[test_idx]
    X_pool, y_pool = X[pool_idx], y[pool_idx]
    seed_idx = RNG.choice(len(y_pool), size=SEED0, replace=False)
    log(f"pool={len(y_pool)} test={len(y_test)} seed={SEED0} "
        f"K={K} rounds={ROUNDS}")

    results = {"csv": CSV, "pool": int(len(y_pool)),
               "test": int(len(y_test)), "seed": SEED0, "acquire_k": K,
               "rounds": ROUNDS, "features": "pre",
               "n_features": int(X.shape[1])}
    for arm in ("uncertain", "random"):
        results[arm] = run_arm(arm, X_pool, y_pool, X_test, y_test,
                               seed_idx)

    # headline comparison: AUROC gained per revealed label after the
    # seed round (the quantity that decides whether mining the
    # uncertain band beats generating more random systems)
    for arm in ("uncertain", "random"):
        c = results[arm]
        gained = c[-1]["auroc"] - c[0]["auroc"]
        revealed = c[-1]["n_labelled"] - c[0]["n_labelled"]
        results[f"{arm}_auroc_per_1k_labels"] = 1000.0 * gained / max(
            revealed, 1)
    results["uncertain_minus_random_final_auroc"] = (
        results["uncertain"][-1]["auroc"] - results["random"][-1]["auroc"])

    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
