#!/usr/bin/env python
"""The honest ML headline run (VERDICT round-1 item 1).

1. Generate a 131,072-system diverse population (reference scale:
   155k) and analyse it in full mode on the TPU.
2. Persist the ~95-column schema-parity dataset
   (data/stability_131k.csv.gz, feature_names header + scaler columns).
3. Train the MLP and GBDT on PRE-INTEGRATION features only (per-body
   ICs + initial_* + schedule metadata) — the post-integration group
   contains the quantities that define is_stable, so the round-1
   0.999-AUROC number trained on them was circular.
4. Report AUROC / balanced accuracy vs the reference's published
   0.953 +- 0.006 / 0.92 (README.md:12, resultsNbody.pdf section 3),
   plus the leakage-contrast metrics on the full feature set.

Writes data/headline_metrics.json.
"""

import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np

B = int(os.environ.get("HEADLINE_B", 131072))
N_STEPS = int(os.environ.get("HEADLINE_STEPS", 1000))
SEED = int(os.environ.get("HEADLINE_SEED", 42))
CSV = os.environ.get("HEADLINE_CSV",
                     f"data/stability_{B // 1024}k.csv.gz")
METRICS_JSON = os.environ.get("HEADLINE_METRICS",
                              "data/headline_metrics.json")


def log(msg):
    print(f"[headline] {msg}", file=sys.stderr, flush=True)


def main():
    from nbodysimproject_tpu.generators.pipeline import (diverse_population,
                                                         _PIPE_CFG)
    from nbodysimproject_tpu.analysis.batch import analyze_population
    from nbodysimproject_tpu.ml.dataset import StabilityDataset

    log(f"device={jax.devices()[0]} B={B} steps={N_STEPS}")

    if os.environ.get("HEADLINE_REUSE") == "1" and os.path.exists(CSV):
        # resume mode: keep the persisted dataset, redo training only
        import pandas as pd

        log(f"reusing existing {CSV}")
        df = pd.read_csv(CSV, comment="#")
        t_an = float("nan")
        return finish(df, CSV, t_an, reused=True)

    t0 = time.perf_counter()
    mass, pos, vel, mask, soft, types = diverse_population(
        jax.random.PRNGKey(SEED), B, n_slots=8)
    jax.block_until_ready(mass)
    log(f"generation: {time.perf_counter() - t0:.1f}s")

    # analyse in fixed-size chunks: keeps the per-bucket jitted program
    # shapes identical across chunks (compile once, reuse) and bounds
    # HBM residency, which is what makes the 1M-system sweep fit on one
    # chip.  id_offset preserves the per-system MEGNO key derivation,
    # so a chunked run is bit-identical to a monolithic one.
    CHUNK = min(B, int(os.environ.get("HEADLINE_CHUNK", 131072)))
    soft_np = np.asarray(soft)
    t0 = time.perf_counter()
    parts = []
    for start in range(0, B, CHUNK):
        sl = slice(start, start + CHUNK)
        part = analyze_population(mass[sl], pos[sl], vel[sl], mask[sl],
                                  _PIPE_CFG, G=1.0, softening=soft_np[sl],
                                  min_softening=0.0, dt=0.01,
                                  n_steps=N_STEPS, mode="full", seed=SEED,
                                  show_progress=False, id_offset=start)
        part["simulation_id"] = np.arange(start, start + len(part))
        parts.append(part)
        if B > CHUNK:
            log(f"chunk {start // CHUNK + 1}/{-(-B // CHUNK)}: "
                f"{time.perf_counter() - t0:.1f}s elapsed")
    df = parts[0] if len(parts) == 1 else __import__("pandas").concat(
        parts, ignore_index=True)
    t_an = time.perf_counter() - t0
    df["system_type"] = types
    log(f"analysis: {t_an:.1f}s -> {B / t_an:.1f} systems/s")
    log(f"stable fraction: {df['is_stable'].mean():.4f}  "
        f"pathological: {df['pathological_energy'].mean():.4f}  "
        f"capped: {df['n_sub_capped'].mean():.4f}  cols={len(df.columns)}")

    os.makedirs("data", exist_ok=True)
    t0 = time.perf_counter()
    StabilityDataset.save(CSV, df, include_scaler=True)
    log(f"saved {CSV} in {time.perf_counter() - t0:.1f}s")
    return finish(df, CSV, t_an)


def finish(df, CSV, t_an, reused=False):
    """Training + metrics on a persisted dataset (separated so a
    crashed/killed training phase can resume with HEADLINE_REUSE=1
    without redoing the TPU analysis)."""
    B = len(df)
    results = {
        "dataset": {
            "path": CSV,
            "rows": int(len(df)),
            "columns": int(len(df.columns)),
            "stable_fraction": float(df["is_stable"].mean()),
            "n_steps": N_STEPS,
            "dt": 0.01,
            "analysis_seconds": None if reused else t_an,
            "systems_per_second": None if reused else B / t_an,
            "cohorts": {k: int(v) for k, v in
                        df["system_type"].value_counts().items()},
        },
        "reference": {"auroc": 0.953, "auroc_err": 0.006,
                      "balanced_accuracy": 0.92,
                      "source": "README.md:12, resultsNbody.pdf 3.1/3.4"},
    }

    # ---- classifiers ---------------------------------------------------
    from nbodysimproject_tpu.ml.train_mlp import MLPTrainer
    from nbodysimproject_tpu.ml.train_lightgbm import train_gbdt

    for group in ("pre", "all"):
        log(f"training MLP on '{group}' features...")
        t0 = time.perf_counter()
        trainer = MLPTrainer(CSV, features=group)
        data = trainer.load_and_prepare_data()
        X_train, y_train, X_val, y_val, X_test, y_test = data
        trainer.train(X_train, y_train, X_val, y_val)
        trainer.compute_optimal_threshold(X_val, y_val)
        m = trainer.evaluate(X_test, y_test)
        m["train_seconds"] = time.perf_counter() - t0
        m["n_features"] = int(X_train.shape[1])
        results[f"mlp_{group}"] = m
        log(f"MLP[{group}]: AUROC={m['auroc']:.4f} "
            f"BA={m['balanced_accuracy']:.4f} ({m['train_seconds']:.0f}s)")
        if group == "pre":
            trainer.save_model(prefix="data/headline_pre_")

    for group in ("pre",):
        log(f"training GBDT on '{group}' features...")
        t0 = time.perf_counter()
        m = train_gbdt(CSV, prefix="data/headline_pre_gbdt_",
                       features=group)
        m["train_seconds"] = time.perf_counter() - t0
        results[f"gbdt_{group}"] = m
        log(f"GBDT[{group}]: AUROC={m['auroc']:.4f} "
            f"BA={m['balanced_accuracy']:.4f} ({m['train_seconds']:.0f}s)")

    with open(METRICS_JSON, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {METRICS_JSON}")


if __name__ == "__main__":
    main()
