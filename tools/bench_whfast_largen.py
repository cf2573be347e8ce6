#!/usr/bin/env python
"""Many-planet WHFast through the large-N force engines (VERDICT
round-3 item 7).

The N = 4096 WHFast substep is force-bound at the VPU pair-sweep
roofline (data/profile_whfast.json: direct O(N^2) kick = 448 of
514 us), so further many-planet scaling must be algorithmic.  This
bench routes the interaction kick's direct part through the engines of
``integrators/largen.py`` (cfg.force_mode) and measures, per N and
engine:

* steps/s of the full whfast substep (jitted 20-iteration chained loop);
* the force-approximation budget: p99 / max relative error of the P3M
  kick against the exact tiled-direct kick at the ICs;
* energy drift over ``WL_STEPS`` substeps for each engine (the
  integrator-level consequence of the mesh approximation).

Writes data/bench_whfast_largen.json.
Env: WL_NS (default "4096,16384,65536"), WL_STEPS (200), WL_ITERS (8).
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

NS = [int(x) for x in os.environ.get("WL_NS", "4096,16384,65536").split(",")]
STEPS = int(os.environ.get("WL_STEPS", 200))
ITERS = int(os.environ.get("WL_ITERS", 8))


def log(msg):
    print(f"[wh-largen] {msg}", file=sys.stderr, flush=True)


def two_body_energy(m, q, v):
    """Exact total energy, f64 on host, row-chunked so N = 65536 never
    materialises an (N, N) block on device."""
    m = np.asarray(m, np.float64)
    q = np.asarray(q, np.float64)
    v = np.asarray(v, np.float64)
    ke = 0.5 * float(np.sum(m * np.sum(v * v, 1)))
    n = q.shape[0]
    pe = 0.0
    chunk = 1024
    for s in range(0, n, chunk):
        rows = slice(s, min(s + chunk, n))
        diff = q[rows, None, :] - q[None, :, :]
        r = np.sqrt(np.sum(diff * diff, -1))
        mm = m[rows, None] * m[None, :]
        # strict upper triangle of the global matrix within this band
        cols = np.arange(n)[None, :]
        sel = cols > np.arange(s, min(s + chunk, n))[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            contrib = np.where(sel, mm / r, 0.0)
        pe -= float(np.sum(contrib))
    return ke + pe


def main():
    import nbodysimproject_tpu as nb
    from nbodysimproject_tpu.integrators.whfast import (wh_interaction_accel,
                                                        whfast_substep)
    from nbodysimproject_tpu.parallel import build_batch
    from tools.bench_whfast import planetary_system

    log(f"device={jax.devices()[0]} Ns={NS} steps={STEPS}")
    dtype = jnp.float32
    import subprocess

    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             timeout=10).stdout.strip() or "unknown"
    except Exception:
        rev = "unknown"
    out = {"steps": STEPS, "kepler_iters": ITERS, "revision": rev,
           "by_n": {}}
    # merge-on-rerun: a single-N retry (remote-compile flakes at the
    # largest program) must not clobber completed legs — but only legs
    # measured at the SAME git revision may survive, or a retry would
    # republish stale-kernel numbers as current results
    if os.path.exists("data/bench_whfast_largen.json"):
        with open("data/bench_whfast_largen.json") as f:
            prev = json.load(f)
        if (prev.get("steps") == STEPS and prev.get("kepler_iters") == ITERS
                and prev.get("revision") == rev):
            carried = sorted(set(prev.get("by_n", {}))
                             - {str(N) for N in NS})
            if carried:
                log(f"carrying over legs from previous run @ {rev}: "
                    f"{carried}")
            out["by_n"].update(prev.get("by_n", {}))
        elif prev.get("by_n"):
            log(f"discarding previous legs (revision "
                f"{prev.get('revision')} != {rev} or params changed)")

    for N in NS:
        m, q, v = planetary_system(N, seed=1, dtype=dtype)
        mask1 = jnp.ones((N + 1,), bool)
        row = {}
        engines = [("direct_pallas", dict(force_mode="direct_pallas",
                                          use_pallas_forces=True)),
                   ("p3m", dict(force_mode="p3m"))]
        accs = {}
        states = {}
        for name, kw in engines:
            cfg = nb.SimConfig(integrator_mode="whfast", fast_float32=True,
                               whfast_kepler_iters=ITERS, **kw)
            if N + 1 <= 16384:
                st, dy = build_batch(m[None], q[None], v[None],
                                     mask1[None], cfg, 1.0, 0.0, 0.0, 0.01)
                s1 = jax.tree_util.tree_map(lambda x: x[0], st)
                d1 = jax.tree_util.tree_map(lambda x: x[0], dy)
            else:
                # build_batch's init calibration is O(N^2) dense (a
                # (N, N) f32 buffer is 17 GB at N = 65537, over HBM) —
                # construct the fixed-schedule state directly, the way
                # the facade's large-N path does (_init_largen,
                # facade/simulation.py:263-283)
                from nbodysimproject_tpu.core.state import (DynParams,
                                                            SimState)

                z = jnp.float32(0.0)
                zb = jnp.zeros((), jnp.float32)
                s1 = SimState(mass=m, pos=q, vel=v, mask=mask1,
                              eps=zb, pi=zb, s=zb, step_s2=zb,
                              softening_energy_delta=zb, hist_count=zb,
                              hist_sum=zb, hist_sumsq=zb)
                d1 = DynParams(G=jnp.float32(1.0), s0=z,
                               min_softening=z, max_softening=z,
                               softening_scale=z, k_soft=z, mu_soft=z,
                               chi_eps=z, k_wall=z, alpha_run=z,
                               omega_spr0=z,
                               h_sub_ref=jnp.float32(0.01),
                               n_sub=jnp.int32(1),
                               frozen_dt=jnp.float32(0.01))

            # kick acceleration at the ICs (for the error budget)
            acc = jax.jit(lambda: wh_interaction_accel(s1, d1, cfg))()
            accs[name] = np.asarray(acc, np.float64)

            @jax.jit
            def run(s):
                def body(_, ss):
                    return whfast_substep(ss, d1, cfg, jnp.asarray(
                        0.01, dtype))
                return jax.lax.fori_loop(0, 20, body, s)

            s_out = run(s1)
            jax.block_until_ready(s_out.pos)
            t0 = time.perf_counter()
            s_out = run(s1)
            jax.block_until_ready(s_out.pos)
            dt_loop = time.perf_counter() - t0
            row[f"{name}_steps_per_s"] = 20.0 / dt_loop

            # energy drift over STEPS substeps
            @jax.jit
            def run_long(s):
                def body(_, ss):
                    return whfast_substep(ss, d1, cfg,
                                          jnp.asarray(0.01, dtype))
                return jax.lax.fori_loop(0, STEPS, body, s)

            E0 = float(two_body_energy(s1.mass, s1.pos, s1.vel))
            s_end = run_long(s1)
            jax.block_until_ready(s_end.pos)
            E1 = float(two_body_energy(s_end.mass, s_end.pos, s_end.vel))
            row[f"{name}_energy_drift_{STEPS}steps"] = abs(
                (E1 - E0) / E0) if E0 else float("nan")
            states[name] = s_end
            log(f"N={N} {name}: {row[f'{name}_steps_per_s']:.1f} steps/s "
                f"drift={row[f'{name}_energy_drift_{STEPS}steps']:.3e}")

        # force error budget: p3m kick vs exact direct kick at the ICs
        ref = accs["direct_pallas"]
        app = accs["p3m"]
        scale = np.linalg.norm(ref, axis=1)
        scale = np.maximum(scale, np.percentile(scale, 1))
        rel = np.linalg.norm(app - ref, axis=1) / scale
        row["p3m_force_rel_err_p50"] = float(np.percentile(rel, 50))
        row["p3m_force_rel_err_p99"] = float(np.percentile(rel, 99))
        row["p3m_force_rel_err_max"] = float(rel.max())
        row["p3m_speedup"] = (row["p3m_steps_per_s"]
                              / row["direct_pallas_steps_per_s"])
        log(f"N={N}: p3m force err p99={row['p3m_force_rel_err_p99']:.2e} "
            f"max={row['p3m_force_rel_err_max']:.2e} "
            f"speedup={row['p3m_speedup']:.2f}x")
        out["by_n"][str(N)] = row

    os.makedirs("data", exist_ok=True)
    with open("data/bench_whfast_largen.json", "w") as f:
        json.dump(out, f, indent=2)
    log("wrote data/bench_whfast_largen.json")


if __name__ == "__main__":
    main()
