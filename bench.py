#!/usr/bin/env python
"""Headline benchmark: batched 3-body integration throughput.

BASELINE.json metric: "batched systems x steps/sec/chip (3-body, 10k
batch); energy-drift parity vs ref"; north star >= 1e4 concurrent
systems at >= 1e6 system-steps/sec/chip.

Config #1 of BASELINE.json: NBodySimulation 3-body (masses
[1.0, 0.5, 0.1]), integrator_mode='verlet', 1000 steps @ dt = 0.01 —
vmapped over a 10k population with per-system perturbed initial
conditions, fused into a single compiled scan (no host round trips).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Extra diagnostics (energy drift sanity) go to stderr.
"""

import json
import os
import sys
import time

# float32 fast path on the TPU; x64 only matters for the parity tests
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import nbodysimproject_tpu as nb
    from nbodysimproject_tpu.parallel import build_batch, integrate_batch

    B = int(os.environ.get("BENCH_BATCH", 10240))
    N_STEPS = int(os.environ.get("BENCH_STEPS", 1000))
    DT = 0.01
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE", "f32") == "f32" else jnp.float64

    dev = jax.devices()[0]
    print(f"[bench] device={dev} B={B} steps={N_STEPS} dtype={dtype.__name__}",
          file=sys.stderr)

    cfg = nb.SimConfig(integrator_mode="verlet")

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    base_m = jnp.asarray([1.0, 0.5, 0.1], dtype)
    base_q = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]], dtype)
    base_v = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]], dtype)
    # per-system 1% IC perturbations so the batch is non-degenerate
    dq = 0.01 * jax.random.normal(k1, (B, 3, 2), dtype)
    dv = 0.01 * jax.random.normal(k2, (B, 3, 2), dtype)
    mass = jnp.broadcast_to(base_m, (B, 3))
    pos = base_q[None] + dq
    vel = base_v[None] + dv
    mask = jnp.ones((B, 3), bool)

    states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 1e-3, 0.0, DT)
    n_sub_max = int(jax.device_get(jnp.max(dyns.n_sub)))
    dt = jnp.asarray(DT, dtype)

    # energy sanity on a slice (stderr only)
    from nbodysimproject_tpu.diagnostics.energy import extended_hamiltonian

    def _H(states, i):
        s1 = jax.tree_util.tree_map(lambda x: x[i], states)
        d1 = jax.tree_util.tree_map(lambda x: x[i], dyns)
        return float(extended_hamiltonian(s1, d1, cfg))

    H0 = _H(states, 0)

    # warm-up / compile
    t0 = time.perf_counter()
    warm = integrate_batch(states, dyns, cfg, dt, 1, n_sub_max)
    jax.block_until_ready(warm)
    # compile the full-length program too
    out = integrate_batch(states, dyns, cfg, dt, N_STEPS, n_sub_max)
    jax.block_until_ready(out)
    compile_and_first = time.perf_counter() - t0
    print(f"[bench] compile+first run: {compile_and_first:.1f}s", file=sys.stderr)

    # timed runs
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = integrate_batch(states, dyns, cfg, dt, N_STEPS, n_sub_max)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    rate = B * N_STEPS / best  # system-steps per second per chip

    H1 = _H(out, 0)
    drift = abs((H1 - H0) / H0) if H0 != 0 else float("nan")
    print(f"[bench] wall={best:.3f}s rate={rate:.3e} sys*steps/s "
          f"energy drift(sys0)={drift:.2e}", file=sys.stderr)

    target = 1.0e6  # north star: >=1e6 system-steps/s/chip at B>=1e4
    print(json.dumps({
        "metric": "batched 3-body verlet system-steps/sec/chip (B=%d)" % B,
        "value": rate,
        "unit": "system-steps/s",
        "vs_baseline": rate / target,
    }))


if __name__ == "__main__":
    main()
