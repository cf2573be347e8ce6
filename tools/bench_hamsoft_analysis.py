#!/usr/bin/env python
"""ham_soft full-mode analysis throughput at B=16k (VERDICT round-1
item 3 target: >= 130 systems/s; round-1 measured 65/s)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import numpy as np


def main():
    B = int(os.environ.get("HS_BATCH", 16384))
    n_steps = int(os.environ.get("HS_STEPS", 1000))
    dim = int(os.environ.get("HS_DIM", 2))
    print(f"[hs-bench] device={jax.devices()[0]} B={B} steps={n_steps} "
          f"dim={dim}", file=sys.stderr, flush=True)

    from nbodysimproject_tpu.generators.pipeline import (diverse_population,
                                                         _PIPE_CFG)
    from nbodysimproject_tpu.analysis.batch import analyze_population

    t0 = time.perf_counter()
    mass, pos, vel, mask, soft, types = diverse_population(
        jax.random.PRNGKey(0), B, n_slots=8, dim=dim)
    jax.block_until_ready(mass)
    t_gen = time.perf_counter() - t0
    print(f"[hs-bench] generation: {t_gen:.2f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    df = analyze_population(mass, pos, vel, mask, _PIPE_CFG, G=1.0,
                            softening=np.asarray(soft), min_softening=0.0,
                            dt=0.01, n_steps=n_steps, mode="full",
                            show_progress=False)
    t_an = time.perf_counter() - t0
    print(f"[hs-bench] analysis: {t_an:.2f}s -> {B / t_an:.1f} systems/s "
          f"(incl. compile)", file=sys.stderr, flush=True)

    # steady-state: run again (programs cached)
    t0 = time.perf_counter()
    df = analyze_population(mass, pos, vel, mask, _PIPE_CFG, G=1.0,
                            softening=np.asarray(soft), min_softening=0.0,
                            dt=0.01, n_steps=n_steps, mode="full",
                            show_progress=False)
    t_an2 = time.perf_counter() - t0
    print(f"[hs-bench] analysis (warm): {t_an2:.2f}s -> "
          f"{B / t_an2:.1f} systems/s", file=sys.stderr, flush=True)
    print(f"[hs-bench] stable fraction: {df['is_stable'].mean():.3f} "
          f"cols={len(df.columns)}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
