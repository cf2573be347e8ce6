#!/usr/bin/env python
"""WHFast throughput: batched few-body + single-system many-planet.

ROADMAP round-2/3 item: the prefix-scan Jacobi transforms are O(N)
and the Kepler drifts vmap over planets, so WHFast should scale to
planet counts the reference's sequential per-body loop cannot touch
(its own WHFast is also dynamically broken — README 'defects' #4).

Measures, on the current device:
* batched 3-body WHFast (B = 16384, 1000 steps) — comparable to the
  bench.py verlet headline config;
* single-system N-planet steps/s for N in (64, 256, 1024, 4096).

Writes data/bench_whfast.json.
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def planetary_system(n_planets, seed=0, dtype=jnp.float32):
    """Central unit mass + n small planets on near-circular orbits,
    ordered by radius (Jacobi coordinates assume it)."""
    rng = np.random.default_rng(seed)
    n = n_planets + 1
    m = np.full((n,), 1e-4)
    m[0] = 1.0
    a = np.linspace(1.0, 1.0 + 0.5 * n_planets, n - 1)  # spaced orbits
    th = rng.uniform(0, 2 * np.pi, n - 1)
    q = np.zeros((n, 2))
    v = np.zeros((n, 2))
    q[1:, 0] = a * np.cos(th)
    q[1:, 1] = a * np.sin(th)
    vc = 1.0 / np.sqrt(a)
    v[1:, 0] = -vc * np.sin(th)
    v[1:, 1] = vc * np.cos(th)
    return (jnp.asarray(m, dtype), jnp.asarray(q, dtype),
            jnp.asarray(v, dtype))


def main():
    import nbodysimproject_tpu as nb
    from nbodysimproject_tpu.parallel import build_batch, integrate_batch

    dev = jax.devices()[0]
    print(f"[whfast] device={dev}", file=sys.stderr, flush=True)
    dtype = jnp.float32
    results = {}

    cfg = nb.SimConfig(integrator_mode="whfast", fast_float32=True)

    # ---- batched 3-body --------------------------------------------------
    B, T = 16384, 1000
    m, q, v = planetary_system(2, seed=0, dtype=dtype)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pos = q[None] + 1e-3 * jax.random.normal(k1, (B, 3, 2), dtype)
    vel = v[None] + 1e-3 * jax.random.normal(k2, (B, 3, 2), dtype)
    mass = jnp.broadcast_to(m, (B, 3))
    mask = jnp.ones((B, 3), bool)
    states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 0.0, 0.0,
                               0.01)
    nsm = int(jax.device_get(jnp.max(dyns.n_sub)))
    t, out = _time(lambda s: integrate_batch(s, dyns, cfg,
                                             jnp.asarray(0.01, dtype), T,
                                             nsm), states)
    results["batched_3body"] = {"B": B, "steps": T, "seconds": t,
                                "sys_steps_per_s": B * T / t,
                                "n_sub": nsm}
    print(f"[whfast] batched 3-body: {t:.3f}s -> {B*T/t:.3e} sys-steps/s "
          f"(n_sub={nsm})", file=sys.stderr, flush=True)

    # ---- many-planet single system --------------------------------------
    from nbodysimproject_tpu.integrators.step import integrate

    # Large-N: route the interaction kick's direct-force term through
    # the tiled Pallas kernel (dense einsum is HBM-bound at N >= ~2k).
    cfg = nb.SimConfig(integrator_mode="whfast", fast_float32=True,
                       use_pallas_forces=True)
    for n_pl in (64, 256, 1024, 4096):
        m, q, v = planetary_system(n_pl, seed=1, dtype=dtype)
        mask1 = jnp.ones((n_pl + 1,), bool)
        st, dy = build_batch(m[None], q[None], v[None], mask1[None], cfg,
                             1.0, 0.0, 0.0, 0.01)
        s1 = jax.tree_util.tree_map(lambda x: x[0], st)
        d1 = jax.tree_util.tree_map(lambda x: x[0], dy)
        T1 = 100
        run = jax.jit(lambda s: integrate(s, d1, cfg,
                                          jnp.asarray(0.01, dtype), T1, 1))
        try:
            t, out = _time(run, s1)
            # sanity: orbits bounded (no energy blow-up)
            r = float(jnp.max(jnp.linalg.norm(out.pos, axis=-1)))
            results[f"planets_{n_pl}"] = {
                "steps": T1, "seconds": t, "steps_per_s": T1 / t,
                "planet_steps_per_s": n_pl * T1 / t, "max_radius": r}
            print(f"[whfast] N={n_pl} planets: {t:.3f}s -> {T1/t:.1f} "
                  f"steps/s ({n_pl*T1/t:.3e} planet-steps/s, "
                  f"r_max={r:.1f})", file=sys.stderr, flush=True)
        except Exception as e:
            print(f"[whfast] N={n_pl} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    os.makedirs("data", exist_ok=True)
    with open("data/bench_whfast.json", "w") as f:
        json.dump(results, f, indent=2)
    print("[whfast] wrote data/bench_whfast.json", file=sys.stderr,
          flush=True)


if __name__ == "__main__":
    main()
