"""Gradient-boosted-tree stability classifier.

Parity: ``minbody/train_lightgbm.py:27-111``: binary GBDT with
GridSearchCV over num_leaves [31, 50, 70, 100] x learning rate
[0.01, 0.05, 0.1, 0.2], 5-fold stratified CV, roc_auc scoring, test
metrics, artifact saving.

lightgbm is not installed in this image (environment constraint); when
absent the trainer degrades to sklearn's HistGradientBoostingClassifier
with an equivalent grid (max_leaf_nodes x learning_rate) so the
component stays functional.
"""

from __future__ import annotations

import pickle

import numpy as np

from .dataset import StabilityDataset
from .data_utils import DataUtils
from ..utils.seeding import set_global_seed

try:
    import lightgbm as lgb

    _HAVE_LGB = hasattr(lgb, "LGBMClassifier")
except Exception:
    _HAVE_LGB = False


def _make_estimator_and_grid():
    import os

    # NB_GBDT_GRID=fast: single known-good configuration (the winner of
    # every full grid run so far at >= 131k rows: 100 leaves, lr 0.1)
    # for million-row refreshes on 1-vCPU hosts, where the 16-point
    # grid's 80 fits cost more wall clock than the TPU analysis that
    # produced the dataset (5,855 s at 1M in round 3).  Recorded in the
    # metrics JSON via the best_params log either way.
    fast = os.environ.get("NB_GBDT_GRID") == "fast"
    if _HAVE_LGB:
        est = lgb.LGBMClassifier(objective="binary", random_state=42)
        grid = {"num_leaves": [100] if fast else [31, 50, 70, 100],
                "learning_rate": [0.1] if fast else [0.01, 0.05, 0.1, 0.2]}
        return est, grid
    from sklearn.ensemble import HistGradientBoostingClassifier

    est = HistGradientBoostingClassifier(random_state=42)
    grid = {"max_leaf_nodes": [100] if fast else [31, 50, 70, 100],
            "learning_rate": [0.1] if fast else [0.01, 0.05, 0.1, 0.2]}
    return est, grid


def train_gbdt(csv_path: str = "stability_data.csv", cv: int = 5,
               prefix: str = "", features: str = "all",
               hold_out_val: bool = False, return_probs: bool = False):
    """Train the GBDT.  ``hold_out_val=True`` keeps the validation
    split out of the fit so operating thresholds can be calibrated on
    it (per-cohort thresholds, VERDICT round-2 item 2); the default
    refits on train+val like the reference's direct split.
    ``return_probs=True`` returns (metrics, extras) with the val/test
    probabilities for downstream calibration."""
    from sklearn.model_selection import GridSearchCV, StratifiedKFold
    from sklearn.metrics import (accuracy_score, precision_score,
                                 recall_score, f1_score, roc_auc_score)

    X, y, feature_names = StabilityDataset.load(csv_path,
                                                features=features)
    if len(X) == 0:
        print("[error] No data loaded")
        return None

    out = DataUtils.split_and_scale(X, y, test_size=0.15, val_size=0.15,
                                    seed=42)
    X_train, X_val, X_test, y_train, y_val, y_test, scaler = out

    if hold_out_val:
        X_fit, y_fit = X_train, y_train
    else:
        # trees don't need the val split — refit on train+val like the
        # reference's direct train split
        X_fit = np.concatenate([X_train, X_val])
        y_fit = np.concatenate([y_train, y_val])

    est, grid = _make_estimator_and_grid()
    import os as _os

    cv = int(_os.environ.get("NB_GBDT_CV", cv))  # fold override for
    # 1-vCPU million-row refreshes (pairs with NB_GBDT_GRID=fast)
    n_splits = min(cv, max(2, int(min(np.sum(y_fit == 0), np.sum(y_fit == 1)))))
    gs = GridSearchCV(est, grid, scoring="roc_auc",
                      cv=StratifiedKFold(n_splits=n_splits, shuffle=True,
                                         random_state=42),
                      n_jobs=-1)
    gs.fit(X_fit, y_fit)
    print(f"Best params: {gs.best_params_}  (cv roc_auc={gs.best_score_:.4f})")

    model = gs.best_estimator_
    probs = model.predict_proba(X_test)[:, 1]
    preds = (probs > 0.5).astype(int)
    metrics = dict(
        accuracy=float(accuracy_score(y_test, preds)),
        precision=float(precision_score(y_test, preds, zero_division=0)),
        recall=float(recall_score(y_test, preds, zero_division=0)),
        f1=float(f1_score(y_test, preds, zero_division=0)),
        auroc=float(roc_auc_score(y_test, probs)) if len(set(y_test)) > 1
        else float("nan"),
    )
    from sklearn.metrics import balanced_accuracy_score

    metrics["balanced_accuracy"] = float(
        balanced_accuracy_score(y_test, preds))
    print("Test metrics:", {k: round(v, 4) for k, v in metrics.items()})

    if _HAVE_LGB:
        model.booster_.save_model(prefix + "model.txt")
    else:
        with open(prefix + "gbdt_model.pkl", "wb") as f:
            pickle.dump(model, f)
    with open(prefix + "scaler.pkl", "wb") as f:
        pickle.dump(scaler, f)
    print("Model + scaler saved")
    if return_probs:
        extras = dict(prob_val=model.predict_proba(X_val)[:, 1],
                      y_val=y_val, prob_test=probs, y_test=y_test)
        return metrics, extras
    return metrics


def main():
    set_global_seed(42)
    return train_gbdt()


if __name__ == "__main__":
    main()
