#!/usr/bin/env python
"""Serving example: score fresh systems for stability WITHOUT integrating.

The reference's headline capability is ML stability prediction >= 1e5x
faster than direct integration (minbody/README.md:56); this is the
productised TPU form.  A fresh (B, N, d) population goes

    ICs -> pre-integration feature frame (one jitted program,
           analysis.batch.ic_feature_frame — no integration)
        -> shipped headline classifier (data/headline_pre_*)
        -> per-cohort calibrated thresholds from the model metadata

Usage:  python examples/predict_stability.py [n_systems]

With the repo's committed artifacts this runs out of the box; after
regenerating the headline (tools/run_headline_dataset.py) it picks up
the fresh model automatically.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.generators.pipeline import (_PIPE_CFG,
                                                     diverse_population)
from nbodysimproject_tpu.ml.predict import StabilityPredictor


def main(n_systems: int = 4096):
    # a fresh population the model has never seen (new seed)
    mass, pos, vel, mask, soft, types = diverse_population(
        jax.random.PRNGKey(2026), n_systems, n_slots=8)
    jax.block_until_ready(mass)

    # repo-anchored artifact prefix: the example works from any CWD
    pred = StabilityPredictor(
        prefix=os.path.join(REPO, "data", "headline_pre_"), model="gbdt")

    t0 = time.time()
    prob, is_stable = pred.predict_population(
        mass, pos, vel, mask, _PIPE_CFG, softening=np.asarray(soft),
        cohorts=types)
    t_first = time.time() - t0
    t0 = time.time()
    prob, is_stable = pred.predict_population(
        mass, pos, vel, mask, _PIPE_CFG, softening=np.asarray(soft),
        cohorts=types)
    t_warm = time.time() - t0

    print(f"[predict] {n_systems} systems: first call {t_first:.2f}s "
          f"(incl. jit), warm {t_warm:.3f}s "
          f"-> {n_systems / t_warm:,.0f} systems/s")
    print(f"[predict] predicted stable fraction: {is_stable.mean():.3f}")
    for c in sorted(set(types)):
        m = np.asarray([t == c for t in types])
        print(f"[predict]   {c:28s} n={int(m.sum()):5d} "
              f"stable={is_stable[m].mean():.3f} "
              f"mean_prob={prob[m].mean():.3f}")
    return prob, is_stable


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
