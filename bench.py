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

    B = int(os.environ.get("BENCH_BATCH", 16384))
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

    # ---------------- XLA scan path (reference-faithful) --------------
    t0 = time.perf_counter()
    out = integrate_batch(states, dyns, cfg, dt, N_STEPS, n_sub_max)
    jax.block_until_ready(out)
    print(f"[bench] xla-scan compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    best_xla = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = integrate_batch(states, dyns, cfg, dt, N_STEPS, n_sub_max)
        jax.block_until_ready(out)
        best_xla = min(best_xla, time.perf_counter() - t0)
    rate_xla = B * N_STEPS / best_xla
    H1 = _H(out, 0)
    drift = abs((H1 - H0) / H0) if H0 != 0 else float("nan")
    print(f"[bench] xla-scan: {best_xla:.3f}s rate={rate_xla:.3e} "
          f"drift(sys0)={drift:.2e}", file=sys.stderr)

    # ------------- fused Pallas multi-step kernel (headline) ----------
    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep_jit

    rate = rate_xla
    if dtype == jnp.float32 and dev.platform != "cpu" and B % (8 * 512) == 0:
        try:
            po, vo = verlet_multistep_jit(states.pos, states.vel,
                                          states.mass, states.step_s2,
                                          DT, 1.0, N_STEPS, 512)
            jax.block_until_ready((po, vo))
            best_pal = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                po, vo = verlet_multistep_jit(states.pos, states.vel,
                                              states.mass, states.step_s2,
                                              DT, 1.0, N_STEPS, 512)
                jax.block_until_ready((po, vo))
                best_pal = min(best_pal, time.perf_counter() - t0)
            rate_pal = B * N_STEPS / best_pal
            # positions of chaotic systems diverge under any roundoff
            # difference; energy drift is the meaningful health check
            out_pal = out.replace(pos=po, vel=vo)
            H1p = _H(out_pal, 0)
            drift_pal = abs((H1p - H0) / H0) if H0 != 0 else float("nan")
            print(f"[bench] pallas-fused: {best_pal:.4f}s rate={rate_pal:.3e} "
                  f"drift(sys0)={drift_pal:.2e}", file=sys.stderr)
            rate = max(rate, rate_pal)
        except Exception as e:  # fall back to the XLA-scan number
            print(f"[bench] pallas-fused path unavailable: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)

    # ------------- ham_soft macro-step scan (flagship integrator) -----
    # (VERDICT round-1 item 9: bench the flagship workload too; numbers
    # to stderr + data/bench_details.json, headline metric unchanged)
    details = {"verlet_xla_scan": rate_xla, "verlet_best": rate,
               "f32_drift_sys0": drift}
    try:
        hs_steps = max(1, N_STEPS // 10)  # ~10 substeps/step -> same work
        cfg_hs = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True)
        states_h, dyns_h = build_batch(mass, pos, vel, mask, cfg_hs, 1.0,
                                       5e-2, 0.0, DT)
        dyns_h = dyns_h.replace(n_sub=jnp.minimum(dyns_h.n_sub, 50))
        nsub_h = int(jax.device_get(jnp.max(dyns_h.n_sub)))
        out_h = integrate_batch(states_h, dyns_h, cfg_hs, dt, hs_steps,
                                nsub_h)
        jax.block_until_ready(out_h)
        best_hs = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out_h = integrate_batch(states_h, dyns_h, cfg_hs, dt, hs_steps,
                                    nsub_h)
            jax.block_until_ready(out_h)
            best_hs = min(best_hs, time.perf_counter() - t0)
        rate_hs = B * hs_steps / best_hs
        details["hamsoft_macro_steps_per_s"] = rate_hs
        details["hamsoft_n_sub"] = nsub_h
        print(f"[bench] ham_soft macro-step scan: {best_hs:.3f}s "
              f"rate={rate_hs:.3e} sys-steps/s (n_sub={nsub_h})",
              file=sys.stderr)

        # fused VMEM-resident multi-step kernel (ops/pallas_hamsoft.py)
        if dtype == jnp.float32 and dev.platform != "cpu" \
                and B % (8 * 256) == 0:
            from nbodysimproject_tpu.ops.pallas_hamsoft import (
                hamsoft_multistep_jit)

            n_sub_arr = np.asarray(jax.device_get(dyns_h.n_sub))
            h_arr = jnp.asarray(
                DT / np.maximum(n_sub_arr, 1).astype(np.float32))
            args_h = (states_h.pos, states_h.vel, states_h.mass,
                      states_h.eps, states_h.pi, dyns_h.k_soft,
                      dyns_h.mu_soft, dyns_h.alpha_run,
                      dyns_h.min_softening, dyns_h.max_softening, h_arr,
                      dyns_h.n_sub, hs_steps, nsub_h, 1.0,
                      float(cfg_hs.k_wall), float(cfg_hs.eta),
                      float(cfg_hs.j_max_cap),
                      int(cfg_hs.barrier_exponent), 256)
            ko = hamsoft_multistep_jit(*args_h)
            jax.block_until_ready(ko)
            best_k = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ko = hamsoft_multistep_jit(*args_h)
                jax.block_until_ready(ko)
                best_k = min(best_k, time.perf_counter() - t0)
            rate_k = B * hs_steps / best_k
            details["hamsoft_fused_steps_per_s"] = rate_k
            details["hamsoft_fused_vs_scan"] = rate_k / rate_hs
            print(f"[bench] ham_soft fused kernel: {best_k:.3f}s "
                  f"rate={rate_k:.3e} sys-steps/s "
                  f"({rate_k / rate_hs:.2f}x the XLA scan)",
                  file=sys.stderr)
    except Exception as e:
        print(f"[bench] ham_soft bench unavailable: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    try:
        os.makedirs("data", exist_ok=True)
        with open("data/bench_details.json", "w") as f:
            json.dump(details, f, indent=2)
    except OSError as e:
        print(f"[bench] could not write details: {e}", file=sys.stderr)

    target = 1.0e6  # north star: >=1e6 system-steps/s/chip at B>=1e4
    print(json.dumps({
        "metric": "batched 3-body verlet system-steps/sec/chip (B=%d)" % B,
        "value": rate,
        "unit": "system-steps/s",
        "vs_baseline": rate / target,
    }))


if __name__ == "__main__":
    main()
