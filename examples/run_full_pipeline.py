#!/usr/bin/env python
"""End-to-end BASELINE config #5: batched dataset generation ->
feature CSV -> MLP + GBDT stability classifiers.

Usage:  python examples/run_full_pipeline.py [n_systems] [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.utils import set_global_seed


def main(n_systems: int = 4096, n_steps: int = 500, csv_path: str = "stability_data.csv"):
    set_global_seed(42)
    pipe = nb.MLTrainingPipeline(n_systems=n_systems, n_steps=n_steps, dt=0.01)

    t0 = time.time()
    df = pipe.generate_diverse_dataset_batched()
    t_gen = time.time() - t0
    print(f"[pipeline] generated+analyzed {len(df)} systems in {t_gen:.1f}s "
          f"({len(df)/t_gen:.1f} systems/s)")
    print(f"[pipeline] stable fraction: {df['is_stable'].mean():.3f}  "
          f"pathological: {int(df['pathological_energy'].sum())}")

    nb.StabilityDataset.save(csv_path, df)

    # features="pre": the honest protocol — pre-integration columns
    # only.  Training on the full frame (the reference's own protocol)
    # scores a meaningless ~1.0 AUROC because the post-integration
    # group contains the quantities that define is_stable.
    print("\n=== MLP (flax/optax) ===")
    trainer = nb.MLPTrainer(csv_path, features="pre")
    mlp_metrics = trainer.run()

    print("\n=== GBDT ===")
    gbdt_metrics = nb.ml.train_lightgbm.train_gbdt(csv_path, cv=3,
                                                   features="pre")

    print("\n=== summary ===")
    print("MLP :", {k: round(v, 4) for k, v in (mlp_metrics or {}).items()})
    print("GBDT:", {k: round(v, 4) for k, v in (gbdt_metrics or {}).items()})
    return mlp_metrics, gbdt_metrics


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    main(n, s)
