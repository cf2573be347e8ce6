#!/usr/bin/env python
"""Hierarchical-cohort hardening experiment (ROADMAP round-3 item 2).

The diverse mixture's hierarchical cohort is prior-dominated (93.7%
stable), so the headline classifier's *within-hierarchical* AUROC is
only ~0.55 — it reads the prior, not the dynamics.  This tool:

1. generates a boundary-hierarchical cohort (separation U(2,10) across
   the Mardling–Aarseth edge, velocity noise U(0.05,0.3)) and analyses
   it on the TPU (``generators.pipeline.boundary_hier_population``);
2. retrains the pre-integration MLP on the diverse 131k training split
   AUGMENTED with the boundary cohort (identical architecture, split
   seed, and evaluation protocol as tools/eval_per_cohort.py);
3. reports within-hierarchical AUROC/BA on the UNCHANGED diverse test
   split, side by side with the unaugmented baseline, plus metrics on
   a held-out boundary test set.

Usage: python tools/run_boundary_hier.py [n_boundary] [out_json]
defaults: 65536, data/boundary_hier_metrics.json
Env: BH_CSV (data/stability_bhier.csv.gz), BH_BASE
(data/stability_131k.csv.gz), BH_STEPS (1000), BH_CHUNK (65536).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np


def log(msg):
    print(f"[bhier] {msg}", file=sys.stderr, flush=True)


def main():
    n_boundary = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    out_json = sys.argv[2] if len(sys.argv) > 2 \
        else "data/boundary_hier_metrics.json"
    csv_bh = os.environ.get("BH_CSV", "data/stability_bhier.csv.gz")
    csv_base = os.environ.get("BH_BASE", "data/stability_131k.csv.gz")
    n_steps = int(os.environ.get("BH_STEPS", 1000))
    chunk = int(os.environ.get("BH_CHUNK", 65536))

    import pandas as pd

    from nbodysimproject_tpu.analysis.batch import analyze_population
    from nbodysimproject_tpu.generators.pipeline import (
        boundary_hier_population, _PIPE_CFG)
    from nbodysimproject_tpu.ml.data_utils import DataUtils, StandardScaler
    from nbodysimproject_tpu.ml.dataset import StabilityDataset
    from nbodysimproject_tpu.ml.train_mlp import MLPTrainer, _binary_metrics

    # ---- 1. boundary cohort dataset -----------------------------------
    if not os.path.exists(csv_bh):
        log(f"device={jax.devices()[0]} generating {n_boundary} "
            f"boundary-hier systems...")
        sep_range = (float(os.environ.get("BH_SEP_LO", 2.0)),
                     float(os.environ.get("BH_SEP_HI", 10.0)))
        noise_range = (float(os.environ.get("BH_NOISE_LO", 0.05)),
                       float(os.environ.get("BH_NOISE_HI", 0.3)))
        log(f"sep={sep_range} noise={noise_range}")
        mass, pos, vel, mask, soft, types = boundary_hier_population(
            jax.random.PRNGKey(777), n_boundary, n_slots=8,
            sep_range=sep_range, noise_range=noise_range)
        jax.block_until_ready(mass)
        t0 = time.perf_counter()
        parts = []
        soft_np = np.asarray(soft)
        for start in range(0, n_boundary, chunk):
            sl = slice(start, start + chunk)
            part = analyze_population(
                mass[sl], pos[sl], vel[sl], mask[sl], _PIPE_CFG, G=1.0,
                softening=soft_np[sl], min_softening=0.0, dt=0.01,
                n_steps=n_steps, mode="full", seed=777,
                show_progress=False, id_offset=start)
            part["simulation_id"] = np.arange(start, start + len(part))
            parts.append(part)
        df_bh = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True)
        df_bh["system_type"] = types
        t_an = time.perf_counter() - t0
        log(f"analysis: {t_an:.1f}s -> {n_boundary / t_an:.1f} systems/s; "
            f"stable={df_bh['is_stable'].mean():.3f} "
            f"pathological={df_bh['pathological_energy'].mean():.3f}")
        StabilityDataset.save(csv_bh, df_bh, include_scaler=False)
        log(f"saved {csv_bh}")

    # ---- 2. aligned feature frames ------------------------------------
    X1, y1, feats1 = StabilityDataset.load(csv_base, features="pre")
    X2, y2, feats2 = StabilityDataset.load(csv_bh, features="pre")
    common = [c for c in feats1 if c in set(feats2)]
    log(f"base features={len(feats1)} boundary={len(feats2)} "
        f"common={len(common)}")
    a1 = np.stack([X1[:, feats1.index(c)] for c in common], 1)
    a2 = np.stack([X2[:, feats2.index(c)] for c in common], 1)

    df1 = pd.read_csv(csv_base, comment="#")
    valid1 = ~np.isnan(df1["is_stable"].values.astype(np.float64))
    cohorts1 = df1.loc[valid1, "system_type"].values
    assert len(cohorts1) == len(y1)

    # the eval_per_cohort split recovery: split an index vector with the
    # same (n, y, seed, stratify) parameters
    idx = np.arange(len(y1))[:, None].astype(np.float64)
    _, I_val, I_te, _, _, _, sc_idx = DataUtils.split_and_scale(
        idx, y1, test_size=0.15, val_size=0.15, seed=42)
    te_idx = np.round(sc_idx.inverse_transform(I_te)[:, 0]).astype(int)
    va_idx = np.round(sc_idx.inverse_transform(I_val)[:, 0]).astype(int)
    te_mask = np.zeros(len(y1), bool)
    te_mask[te_idx] = True
    va_mask = np.zeros(len(y1), bool)
    va_mask[va_idx] = True
    tr_mask = ~(te_mask | va_mask)

    rng = np.random.default_rng(7)
    perm2 = rng.permutation(len(y2))
    n_te2 = int(0.15 * len(y2))
    te2, tr2 = perm2[:n_te2], perm2[n_te2:]

    results = {"boundary_dataset": {
        "path": csv_bh, "rows": int(len(y2)),
        "stable_fraction": float(np.mean(y2))}}

    def fit_and_eval(tag, X_tr, y_tr):
        scaler = StandardScaler()
        Xs_tr = scaler.fit_transform(X_tr)
        trainer = MLPTrainer(features="pre")
        trainer.scaler = scaler
        Xs_va = scaler.transform(a1[va_mask])
        trainer.train(Xs_tr.astype(np.float32), y_tr.astype(np.float32),
                      Xs_va.astype(np.float32),
                      y1[va_mask].astype(np.float32))
        trainer.compute_optimal_threshold(
            Xs_va.astype(np.float32), y1[va_mask].astype(np.float32))
        out = {}
        for name, Xe, ye, coh in (
                ("diverse_test", a1[te_mask], y1[te_mask],
                 cohorts1[te_mask]),
                ("boundary_test", a2[te2], y2[te2], None)):
            prob = np.asarray(trainer.predict_proba(
                scaler.transform(Xe).astype(np.float32))).ravel()
            pred = (prob > trainer.optimal_threshold).astype(np.float64)
            out[name] = _binary_metrics(ye, pred, prob)
            out[name]["n"] = int(len(ye))
            if coh is not None:
                sel = coh == "hierarchical"
                yt, pp, pb = ye[sel], pred[sel], prob[sel]
                if 0.0 < yt.mean() < 1.0:
                    m = _binary_metrics(yt, pp, pb)
                    m["n"] = int(sel.sum())
                    m["stable_fraction"] = float(yt.mean())
                    out["within_hierarchical"] = m
        results[tag] = out
        h = out.get("within_hierarchical", {})
        log(f"{tag}: diverse AUROC={out['diverse_test']['auroc']:.4f} "
            f"within-hier AUROC={h.get('auroc', float('nan')):.4f} "
            f"boundary AUROC={out['boundary_test']['auroc']:.4f}")
        return trainer

    fit_and_eval("baseline", a1[tr_mask], y1[tr_mask])
    fit_and_eval("augmented",
                 np.concatenate([a1[tr_mask], a2[tr2]]),
                 np.concatenate([y1[tr_mask], y2[tr2]]))

    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_json}")


if __name__ == "__main__":
    main()
