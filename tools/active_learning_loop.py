#!/usr/bin/env python
"""The REAL active-learning loop (round-2 VERDICT stretch item 9).

Unlike tools/active_learning.py (pool-based label reveals — an
acquisition-POLICY evaluation), this closes the loop the way the
product would run it:

1. train a base classifier on a subsample of the 1M headline frame,
2. generate a FRESH population and score it with the fast inference
   path (ml/predict.py: ic_feature_frame, no integration),
3. acquire the K most uncertain systems (|p - tau|, tau = validation
   Youden) and, as the control arm, K random systems,
4. pay the real labelling cost — full-mode TPU analysis — ONLY for
   the acquired systems,
5. retrain each arm and evaluate on the fixed held-out test split of
   the headline frame.

Writes data/active_learning_loop_metrics.json.
Run on the TPU: python tools/active_learning_loop.py
"""

import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np

CSV = os.environ.get("ALL_CSV", "data/stability_1M.csv.gz")
BASE_N = int(os.environ.get("ALL_BASE_N", 131072))
POOL_B = int(os.environ.get("ALL_POOL_B", 131072))
K = int(os.environ.get("ALL_K", 8192))
N_STEPS = int(os.environ.get("ALL_STEPS", 1000))
OUT = os.environ.get("ALL_OUT", "data/active_learning_loop_metrics.json")
RNG = np.random.default_rng(int(os.environ.get("ALL_SEED", 99)))


def log(msg):
    print(f"[al-loop] {msg}", file=sys.stderr, flush=True)


def _fit(X, y):
    from sklearn.ensemble import HistGradientBoostingClassifier

    clf = HistGradientBoostingClassifier(
        max_iter=200, learning_rate=0.1, max_leaf_nodes=31,
        early_stopping=True, validation_fraction=0.1, random_state=0)
    clf.fit(X, y)
    return clf


def _youden(prob, y):
    best_t, best_j = 0.5, -1.0
    for t in np.quantile(prob, np.linspace(0.01, 0.99, 99)):
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


def main():
    from nbodysimproject_tpu.analysis.batch import (analyze_population,
                                                    ic_feature_frame)
    from nbodysimproject_tpu.generators.pipeline import (_PIPE_CFG,
                                                         headline_population)
    from nbodysimproject_tpu.ml.dataset import StabilityDataset
    from nbodysimproject_tpu.ml.predict import feature_matrix

    log(f"device={jax.devices()[0]} base={BASE_N} pool={POOL_B} K={K}")
    X, y, feat = StabilityDataset.load(CSV, features="pre")
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    perm = RNG.permutation(len(y))
    test_idx = perm[:131072]
    val_idx = perm[131072:131072 + 32768]
    base_idx = perm[131072 + 32768:131072 + 32768 + BASE_N]
    X_te, y_te = X[test_idx], y[test_idx]

    t0 = time.perf_counter()
    base = _fit(X[base_idx], y[base_idx])
    m_base = _eval(base, X_te, y_te)
    tau = _youden(base.predict_proba(X[val_idx])[:, 1], y[val_idx])
    log(f"base ({BASE_N}): AUROC={m_base['auroc']:.4f} "
        f"BA={m_base['balanced_accuracy']:.4f} tau={tau:.3f} "
        f"({time.perf_counter() - t0:.0f}s)")

    # fresh pool, scored WITHOUT integration
    t0 = time.perf_counter()
    mass, pos, vel, mask, soft, types = headline_population(
        jax.random.PRNGKey(777), POOL_B, n_slots=8)
    soft_np = np.asarray(soft)
    df_pool = ic_feature_frame(mass, pos, vel, mask, _PIPE_CFG, G=1.0,
                               softening=soft_np, min_softening=0.0,
                               dt=0.01)
    Xp = feature_matrix(df_pool, feat)
    prob = base.predict_proba(Xp)[:, 1]
    t_score = time.perf_counter() - t0
    log(f"pool scored without integration: {POOL_B} systems in "
        f"{t_score:.1f}s ({POOL_B / t_score:.0f} systems/s incl. "
        f"generation + features + compile)")

    pick_u = np.argsort(np.abs(prob - tau))[:K]
    pick_r = RNG.choice(POOL_B, size=K, replace=False)

    results = {"csv": CSV, "base_n": BASE_N, "pool_b": POOL_B, "k": K,
               "n_steps": N_STEPS, "tau": tau, "base": m_base,
               "pool_score_seconds": t_score}
    arms = {"uncertain": pick_u, "random": pick_r}
    for name, pick in arms.items():
        t0 = time.perf_counter()
        sl = np.asarray(pick)
        df_lab = analyze_population(
            np.asarray(mass)[sl], np.asarray(pos)[sl],
            np.asarray(vel)[sl], np.asarray(mask)[sl], _PIPE_CFG, G=1.0,
            softening=soft_np[sl], min_softening=0.0, dt=0.01,
            n_steps=N_STEPS, mode="full", show_progress=False)
        t_lab = time.perf_counter() - t0
        ya = df_lab["is_stable"].to_numpy(np.float64)
        ok = np.isfinite(ya)
        Xa = feature_matrix(df_lab, feat)[ok]
        ya = ya[ok]
        log(f"{name}: analysed {len(ya)} systems in {t_lab:.1f}s "
            f"(stable {ya.mean():.3f})")
        clf = _fit(np.concatenate([X[base_idx], Xa]),
                   np.concatenate([y[base_idx], ya]))
        m = _eval(clf, X_te, y_te)
        m["label_seconds"] = t_lab
        m["acquired_stable_fraction"] = float(ya.mean())
        m["delta_auroc_vs_base"] = m["auroc"] - m_base["auroc"]
        m["delta_ba_vs_base"] = (m["balanced_accuracy"]
                                 - m_base["balanced_accuracy"])
        results[name] = m
        log(f"{name}: AUROC={m['auroc']:.4f} (+{m['delta_auroc_vs_base']:.4f}) "
            f"BA={m['balanced_accuracy']:.4f} "
            f"(+{m['delta_ba_vs_base']:.4f})")

    results["uncertain_minus_random_auroc"] = (
        results["uncertain"]["auroc"] - results["random"]["auroc"])
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
