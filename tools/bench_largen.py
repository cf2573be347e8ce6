#!/usr/bin/env python
"""Large-N force benchmark: P3M vs direct (VERDICT round-1 item 10).

The reference's results PDF claims 8-15x from a Barnes-Hut tree at
theta = 0.5 for N in [1e4, 1e5] (resultsNbody.pdf 5.2) but ships no
tree.  This measures our TPU-native P3M (smooth-split FFT mesh +
cell-list PP pass, force errors ~1e-3 — tighter than theta = 0.5 BH)
against the dense direct force and the tiled Pallas direct kernel.

Writes data/bench_largen.json.
"""

import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # scalar device_get: block_until_ready can return early through the
    # TPU tunnel, which would inflate the numbers
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    from nbodysimproject_tpu.ops.forces import gravitational_force
    from nbodysimproject_tpu.ops.pm_force import p3m_force
    from nbodysimproject_tpu.ops.pallas_kernels import pairwise_force_pallas

    print(f"[large-n] device={jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = {}

    for N in (10_000, 32_768, 100_000, 1_000_000):
        q = jnp.asarray(rng.normal(0, 1.0, (N, 2)), jnp.float32)
        m = jnp.asarray(np.abs(rng.normal(1, 0.3, N)), jnp.float32)
        row = {}

        # P3M (Ng chosen so the PP pass stays ~14/cell occupancy)
        Ng = {10_000: 256, 32_768: 384,
              100_000: 640}.get(N, 3072)
        eps = jnp.float32(float(q.max() - q.min()) / Ng)  # ~1 cell
        f_p3m = jax.jit(lambda q, m: p3m_force(
            q, m, eps, 1.0, Ng=Ng, r_cut_cells=6.0)[0])
        t_p3m, F_p3m = _time(f_p3m, q, m)
        row["p3m_s"] = t_p3m

        # tiled Pallas direct kernel
        try:
            f_tile = lambda q, m: pairwise_force_pallas(
                q, m, float(eps), 1.0)
            t_tile, F_tile = _time(f_tile, q, m,
                                   reps=1 if N >= 500_000 else 5)
            row["pallas_direct_s"] = t_tile
        except Exception as e:
            print(f"[large-n] tiled kernel unavailable at N={N}: {e}",
                  file=sys.stderr)
            F_tile = None

        # dense direct (memory-bound; skip when the (N, N) buffers
        # would not fit)
        if N <= 32_768:
            f_dense = jax.jit(lambda q, m: gravitational_force(
                q, m, eps=eps, G=1.0))
            t_dense, F_dense = _time(f_dense, q, m, reps=3)
            row["dense_direct_s"] = t_dense
        else:
            F_dense = None

        ref = F_dense if F_dense is not None else F_tile
        if ref is not None:
            rel = np.asarray(
                jnp.sqrt(jnp.sum((F_p3m - ref) ** 2, 1))
                / jnp.maximum(jnp.sqrt(jnp.sum(ref ** 2, 1)), 1e-30))
            row["p3m_rel_err_median"] = float(np.median(rel))
            row["p3m_rel_err_p99"] = float(np.percentile(rel, 99))
        direct = row.get("dense_direct_s", row.get("pallas_direct_s"))
        if direct:
            row["speedup_vs_direct"] = direct / t_p3m
        results[str(N)] = row
        print(f"[large-n] N={N}: {row}", file=sys.stderr)

    # ---- whole-simulation rollouts (integrators/largen.py) -----------
    # 50-step fused KDK leapfrog: measures the product capability (the
    # reference cannot integrate at these N at all), amortising the
    # fixed per-dispatch latency over the rollout
    import nbodysimproject_tpu as nb
    from nbodysimproject_tpu.integrators.largen import largen_rollout

    T = 50
    rollouts = {}
    for N in (10_000, 100_000, 1_000_000):
        q = jnp.asarray(rng.normal(0, 1.0, (N, 2)), jnp.float32)
        m = jnp.asarray(np.abs(rng.normal(1, 0.3, N)) / N, jnp.float32)
        v = jnp.asarray(rng.normal(0, 0.3, (N, 2)), jnp.float32)
        Ng = {10_000: 256, 100_000: 640}.get(N, 3072)
        eps = jnp.float32(6.0 / Ng)
        row = {}
        for mode in ("p3m", "direct_pallas"):
            if mode == "direct_pallas" and N >= 1_000_000:
                continue  # 9.6 s/eval: rollout would take ~8 min
            cfg = nb.SimConfig(integrator_mode="verlet", force_mode=mode,
                               pm_grid=Ng, pm_r_cut_cells=6.0)
            fn = lambda q, v: largen_rollout(q, v, m, eps,
                                             jnp.float32(1.0),
                                             jnp.float32(1e-4), T, cfg)
            try:
                t, out = _time(fn, q, v, reps=2)
                row[f"{mode}_50step_s"] = t
                row[f"{mode}_steps_per_s"] = T / t
                if mode == "p3m":
                    row["p3m_n_dropped_max"] = int(out[2].n_dropped_max)
            except Exception as e:
                print(f"[large-n] rollout {mode} N={N} failed: {e}",
                      file=sys.stderr)
        rollouts[str(N)] = row
        print(f"[large-n] rollout N={N}: {row}", file=sys.stderr)
    results["rollouts_50step"] = rollouts

    os.makedirs("data", exist_ok=True)
    with open("data/bench_largen.json", "w") as f:
        json.dump(results, f, indent=2)
    print("[large-n] wrote data/bench_largen.json", file=sys.stderr)


if __name__ == "__main__":
    main()
