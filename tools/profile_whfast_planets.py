#!/usr/bin/env python
"""Attribute the per-step cost of single-system many-planet WHFast.

ROADMAP round-4 item 5: N = 4096 runs at ~1.9k steps/s after the
fixed-depth Laguerre-Conway solver and the tiled Pallas kick; this
tool decomposes one whfast_substep (D(h/2) K(h) D(h/2)) into its
pieces, each timed as a jitted 100-iteration fori loop whose carry
feeds the next iteration (so XLA cannot hoist anything):

  step     — the full substep (baseline; matches bench_whfast N=4096)
  drift    — wh_kepler_drift only (Jacobi transforms + vmapped
             fixed-depth Kepler)
  jacobi   — to_jacobi(pos) + to_jacobi(vel) + from_jacobi round trip
             only (isolates the prefix-sum transforms from the solver)
  kick     — wh_interaction_accel + velocity update only
  force    — force_auto alone (the tiled Pallas direct force inside
             the kick)

Run on the TPU: python tools/profile_whfast_planets.py
Env: PW_N (4096), PW_ITERS (8)
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np

N_PL = int(os.environ.get("PW_N", 4096))
ITERS = int(os.environ.get("PW_ITERS", 8))
LOOP = 100


def log(msg):
    print(f"[prof-wh] {msg}", file=sys.stderr, flush=True)


def main():
    import nbodysimproject_tpu as nb
    from nbodysimproject_tpu.integrators.whfast import (
        from_jacobi, to_jacobi, wh_interaction_accel, wh_kepler_drift,
        whfast_substep)
    from nbodysimproject_tpu.ops.forces import force_auto
    from nbodysimproject_tpu.parallel import build_batch
    from tools.bench_whfast import planetary_system

    log(f"device={jax.devices()[0]} N={N_PL} iters={ITERS}")
    dtype = jnp.float32
    cfg = nb.SimConfig(integrator_mode="whfast", fast_float32=True,
                       use_pallas_forces=True)
    m, q, v = planetary_system(N_PL, seed=1, dtype=dtype)
    mask1 = jnp.ones((N_PL + 1,), bool)
    st, dy = build_batch(m[None], q[None], v[None], mask1[None], cfg,
                         1.0, 0.0, 0.0, 0.01)
    s1 = jax.tree_util.tree_map(lambda x: x[0], st)
    d1 = jax.tree_util.tree_map(lambda x: x[0], dy)
    h = jnp.asarray(0.01, dtype)

    results = {"N": N_PL, "iters": ITERS, "loop": LOOP}

    def timed(tag, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        per = best / LOOP * 1e6
        log(f"{tag:8s} {best:.3f}s for {LOOP} iters -> {per:.0f} us/iter")
        results[f"{tag}_us_per_iter"] = per
        return best

    def loop(body):
        def fn(state):
            return jax.lax.fori_loop(0, LOOP, lambda _, s: body(s), state)
        return fn

    timed("step", loop(lambda s: whfast_substep(s, d1, cfg, h)), s1)
    timed("drift", loop(lambda s: wh_kepler_drift(s, d1, h,
                                                  kepler_iters=ITERS)), s1)

    def jacobi_rt(s):
        jp, jv = to_jacobi(s.mass, s.pos, s.vel)
        p2, v2 = from_jacobi(s.mass, jp, jv)
        return s.replace(pos=p2, vel=v2)

    timed("jacobi", loop(jacobi_rt), s1)
    timed("kick", loop(lambda s: s.replace(
        vel=s.vel + h * wh_interaction_accel(s, d1, cfg))), s1)
    timed("force", loop(lambda s: s.replace(vel=s.vel + h * force_auto(
        s.pos, s.mass, jnp.sqrt(s.step_s2), d1.G, s.mask, cfg)
        / s.mass[:, None])), s1)

    # MEASURED (round 3, N=4096, v5e): step 503 us, force 452 us (90%),
    # kick 451, drift 273, jacobi 362 — the separately-jitted arms
    # overlap inside the fused substep (drift+kick > step), and the
    # direct O(N^2) force IS the step.  Roofline: ~16.7M ordered pairs
    # x ~28 VPU ops/pair ~= 4.7e8 ops ~= 490 us at the v5e VPU rate —
    # the tiled Pallas force kernel runs at the elementwise hardware
    # ceiling, so the next many-planet lever is algorithmic
    # (hierarchical/P3M forces trade symplectic exactness) not kernel
    # tuning.  This retires ROADMAP round-4 item 5's hypothesis that
    # the per-planet Jacobi Kepler chain was the remaining depth.
    import json

    out_path = os.environ.get("PW_OUT",
                              os.path.join("data", "profile_whfast.json"))
    try:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        log(f"wrote {out_path}")
    except OSError as e:
        log(f"could not write {out_path}: {e}")


if __name__ == "__main__":
    main()
