#!/usr/bin/env python
"""Out-of-distribution evaluation of the headline classifier on the
boundary-focused cohort.

The reference ships focused dataset modes (boundary / stable /
unstable, ml_training_pipeline.py:137-199) but never evaluates its
models on them.  This tool generates a seeded boundary-focused
population — systems near the stability edge, the hardest regime —
analyses it (full mode), and scores the SAVED headline MLP (trained on
the diverse dataset) on it without retraining: a transfer test the
within-training-distribution test split cannot provide.

Usage: python tools/eval_boundary.py [n_systems] [model_prefix] [out_json]
defaults: 4096, data/headline_pre_, data/boundary_ood_metrics.json
Env: BOUNDARY_CSV (cache path, default data/stability_boundary.csv.gz),
     BOUNDARY_STEPS (default 1000).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_X64", "0")


def main():
    n_systems = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    prefix = sys.argv[2] if len(sys.argv) > 2 else "data/headline_pre_"
    out_json = sys.argv[3] if len(sys.argv) > 3 \
        else "data/boundary_ood_metrics.json"
    csv = os.environ.get("BOUNDARY_CSV", "data/stability_boundary.csv.gz")
    n_steps = int(os.environ.get("BOUNDARY_STEPS", 1000))

    import numpy as np

    from nbodysimproject_tpu.generators.pipeline import MLTrainingPipeline
    from nbodysimproject_tpu.ml.dataset import StabilityDataset
    from nbodysimproject_tpu.ml.train_mlp import MLPTrainer, _binary_metrics
    from nbodysimproject_tpu.utils.seeding import set_global_seed

    if not os.path.exists(csv):
        set_global_seed(1234)
        pipe = MLTrainingPipeline(n_systems=n_systems, n_steps=n_steps)
        df = pipe.generate_focused_dataset("boundary")
        StabilityDataset.save(csv, df, include_scaler=False)
        print(f"[boundary] saved {csv} ({len(df)} rows, "
              f"stable={df['is_stable'].mean():.3f})", file=sys.stderr)

    trainer = MLPTrainer.load_model(prefix=prefix)
    X, y, names = StabilityDataset.load(csv, features="pre")
    # align columns to the model's training feature order; boundary
    # frames produced by the facade path may lack schedule-metadata
    # columns the batched pipeline emits — zero-fill those (they are
    # standardized, so 0 = training mean)
    idx = {c: i for i, c in enumerate(names)}
    Xa = np.zeros((len(X), len(trainer.feature_names)), np.float64)
    missing = []
    for j, c in enumerate(trainer.feature_names):
        if c in idx:
            Xa[:, j] = X[:, idx[c]]
        else:
            missing.append(c)
    if missing:
        print(f"[boundary] zero-filled {len(missing)} model features "
              f"absent from the boundary frame: {missing[:6]}...",
              file=sys.stderr)
    Xs = trainer.scaler.transform(Xa)
    if missing:
        mz = [trainer.feature_names.index(c) for c in missing]
        Xs[:, mz] = 0.0
    prob = np.asarray(trainer.predict_proba(Xs.astype(np.float32))).ravel()
    pred = (prob > trainer.optimal_threshold).astype(np.float64)

    m = _binary_metrics(y, pred, prob)
    m["n"] = int(len(y))
    m["stable_fraction"] = float(np.mean(y))
    m["zero_filled_features"] = missing
    print(f"[boundary] OOD: n={m['n']} stable={m['stable_fraction']:.3f} "
          f"auroc={m['auroc']:.4f} ba={m['balanced_accuracy']:.4f}",
          file=sys.stderr)
    with open(out_json, "w") as f:
        json.dump(m, f, indent=2)
    print(f"wrote {out_json}", file=sys.stderr)


if __name__ == "__main__":
    main()
