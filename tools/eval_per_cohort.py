#!/usr/bin/env python
"""Per-cohort classifier metrics (ROADMAP round-2 item: harden the
headline with within-cohort evidence).

Trains the headline MLP on pre-integration features and reports
AUROC / balanced accuracy overall AND per generator cohort
(random / hierarchical / polygon / close_encounter) on the test split.
A classifier that only learned cohort identity scores ~0.5 AUROC
within each cohort; real dynamics transfer shows up as within-cohort
discrimination.

Usage: python tools/eval_per_cohort.py [csv] [out_json]
(defaults: data/stability_131k.csv.gz, data/per_cohort_metrics.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# sitecustomize force-sets jax_platforms="axon,cpu"; pin CPU so this
# tool never contends with a TPU dataset run (the tunnel is
# single-client)
if os.environ.get("COHORT_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    csv = sys.argv[1] if len(sys.argv) > 1 else "data/stability_131k.csv.gz"
    out_json = sys.argv[2] if len(sys.argv) > 2 \
        else "data/per_cohort_metrics.json"

    import pandas as pd

    from nbodysimproject_tpu.ml.data_utils import DataUtils
    from nbodysimproject_tpu.ml.dataset import StabilityDataset
    from nbodysimproject_tpu.ml.train_mlp import (MLPTrainer,
                                                  _binary_metrics)

    X, y, feats = StabilityDataset.load(csv, features="pre")
    df = pd.read_csv(csv, comment="#")
    valid = ~np.isnan(df["is_stable"].values.astype(np.float64))
    cohorts = df.loc[valid, "system_type"].values if "system_type" in df \
        else np.array(["unknown"] * len(y))
    assert len(cohorts) == len(y)

    # recover the test-row indices: the splitter depends only on
    # (n, y, seed, stratify), so splitting an index vector with the
    # same parameters reproduces the partition exactly
    idx = np.arange(len(y))[:, None].astype(np.float64)
    I_tr, I_val, I_te, y_tr, y_val, y_te, _sc = DataUtils.split_and_scale(
        idx, y, test_size=0.15, val_size=0.15, seed=42)
    # undo the identity "scaling" by reading the raw index back
    te_idx = np.round(_sc.inverse_transform(I_te)[:, 0]).astype(int) \
        if hasattr(_sc, "inverse_transform") else I_te[:, 0].astype(int)

    trainer = MLPTrainer(csv, features="pre")
    data = trainer.load_and_prepare_data()
    X_tr, y_tr2, X_val2, y_val2, X_te2, y_te2 = data
    np.testing.assert_array_equal(y_te2, y[te_idx].astype(np.float32))
    trainer.train(X_tr, y_tr2, X_val2, y_val2)
    trainer.compute_optimal_threshold(X_val2, y_val2)

    prob = np.asarray(trainer.predict_proba(X_te2)).ravel()
    pred = (prob > trainer.optimal_threshold).astype(np.float64)

    results = {"overall": _binary_metrics(y_te2, pred, prob),
               "n_test": int(len(y_te2)), "cohorts": {}}
    te_cohort = cohorts[te_idx]
    for c in sorted(set(te_cohort.tolist())):
        sel = te_cohort == c
        yt, pp, pb = y_te2[sel], pred[sel], prob[sel]
        row = {"n": int(sel.sum()),
               "stable_fraction": float(yt.mean())}
        if 0.0 < yt.mean() < 1.0:
            row.update(_binary_metrics(yt, pp, pb))
            # the global Youden threshold can sit entirely above/below a
            # skewed cohort's scores (BA collapses to 0.5 even at high
            # AUROC); report the cohort-optimal threshold BA as the
            # achievable within-cohort discrimination
            best_ba = 0.0
            for t in np.quantile(pb, np.linspace(0.01, 0.99, 99)):
                pt = (pb > t).astype(np.float64)
                tpr = pt[yt == 1].mean() if (yt == 1).any() else 0.0
                tnr = 1.0 - pt[yt == 0].mean() if (yt == 0).any() else 0.0
                best_ba = max(best_ba, 0.5 * (tpr + tnr))
            row["balanced_accuracy_cohort_threshold"] = float(best_ba)
        results["cohorts"][str(c)] = row
        print(f"[cohort] {c}: n={row['n']} stable={row['stable_fraction']:.3f} "
              f"auroc={row.get('auroc', float('nan')):.4f} "
              f"ba={row.get('balanced_accuracy', float('nan')):.4f}",
              file=sys.stderr)

    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
