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
    np.asarray(out.pos[0, 0, 0])
    print(f"[bench] xla-scan compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    best_xla = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = integrate_batch(states, dyns, cfg, dt, N_STEPS, n_sub_max)
        np.asarray(out.pos[0, 0, 0])  # scalar device_get: robust sync
        best_xla = min(best_xla, time.perf_counter() - t0)
    rate_xla = B * N_STEPS / best_xla
    H1 = _H(out, 0)
    drift = abs((H1 - H0) / H0) if H0 != 0 else float("nan")
    print(f"[bench] xla-scan: {best_xla:.3f}s rate={rate_xla:.3e} "
          f"drift(sys0)={drift:.2e}", file=sys.stderr)

    # ------------- fused Pallas multi-step kernel (headline) ----------
    # Run at a large batch: per-dispatch host<->device latency (~25 ms
    # through the TPU tunnel) dominates any sub-50ms measurement, so the
    # headline batch amortises it.  Sync via a scalar device_get —
    # block_until_ready has been observed to return early on this
    # platform, which would inflate the number.
    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep_jit

    # 2^24 systems: large enough that the fixed per-dispatch tunnel
    # latency (~30 ms) is <10% of the measurement (2^20 measured
    # 2.1e10, 2^23 4.2e10, 2^24 4.4e10 — the kernel-marginal rate);
    # ~1.6 GB of HBM traffic, well within one v5e chip.
    B_FUSED = int(os.environ.get("BENCH_BATCH_FUSED", 1 << 24))
    rate = rate_xla
    B_best = B
    if dtype == jnp.float32 and dev.platform != "cpu" \
            and B_FUSED % (8 * 512) == 0:
        try:
            kf1, kf2 = jax.random.split(jax.random.PRNGKey(7))
            pos_f = base_q[None] + 0.01 * jax.random.normal(
                kf1, (B_FUSED, 3, 2), dtype)
            vel_f = base_v[None] + 0.01 * jax.random.normal(
                kf2, (B_FUSED, 3, 2), dtype)
            mass_f = jnp.broadcast_to(base_m, (B_FUSED, 3))
            eps2_f = jnp.full((B_FUSED,), 1e-6, dtype)
            jax.block_until_ready((pos_f, vel_f, mass_f, eps2_f))

            def run_fused():
                return verlet_multistep_jit(pos_f, vel_f, mass_f, eps2_f,
                                            DT, 1.0, N_STEPS, 512, 8)

            po, vo = run_fused()
            np.asarray(po[0, 0])
            best_pal = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                po, vo = run_fused()
                np.asarray(po[0, 0])  # force completion
                best_pal = min(best_pal, time.perf_counter() - t0)
            rate_pal = B_FUSED * N_STEPS / best_pal
            # positions of chaotic systems diverge under any roundoff
            # difference; energy drift is the meaningful health check
            s0 = jax.tree_util.tree_map(lambda x: x[0], states)
            d0 = jax.tree_util.tree_map(lambda x: x[0], dyns)
            s0 = s0.replace(pos=pos_f[0].astype(s0.pos.dtype),
                            vel=vel_f[0].astype(s0.vel.dtype),
                            eps=jnp.sqrt(eps2_f[0]).astype(s0.eps.dtype),
                            step_s2=eps2_f[0].astype(s0.step_s2.dtype))
            H0p = float(extended_hamiltonian(s0, d0, cfg))
            s1 = s0.replace(pos=po[0].astype(s0.pos.dtype),
                            vel=vo[0].astype(s0.vel.dtype))
            H1p = float(extended_hamiltonian(s1, d0, cfg))
            drift_pal = abs((H1p - H0p) / H0p) if H0p != 0 else float("nan")
            print(f"[bench] pallas-fused (B={B_FUSED}): {best_pal:.4f}s "
                  f"rate={rate_pal:.3e} drift(sys0)={drift_pal:.2e}",
                  file=sys.stderr)
            if rate_pal > rate:
                rate = rate_pal
                B_best = B_FUSED
        except Exception as e:  # fall back to the XLA-scan number
            print(f"[bench] pallas-fused path unavailable: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)

    # ------------- yoshida4 scan (BASELINE config #2) -----------------
    try:
        cfg_y = nb.SimConfig(integrator_mode="yoshida4")
        states_y, dyns_y = build_batch(mass, pos, vel, mask, cfg_y, 1.0,
                                       1e-3, 0.0, DT)
        nsub_y = int(jax.device_get(jnp.max(dyns_y.n_sub)))
        out_y = integrate_batch(states_y, dyns_y, cfg_y, dt, N_STEPS,
                                nsub_y)
        np.asarray(out_y.pos[0, 0, 0])
        best_y = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out_y = integrate_batch(states_y, dyns_y, cfg_y, dt, N_STEPS,
                                    nsub_y)
            np.asarray(out_y.pos[0, 0, 0])
            best_y = min(best_y, time.perf_counter() - t0)
        rate_y = B * N_STEPS / best_y
        print(f"[bench] yoshida4 scan: {best_y:.3f}s rate={rate_y:.3e} "
              f"sys-steps/s (n_sub={nsub_y})", file=sys.stderr)
    except Exception as e:
        rate_y = None
        print(f"[bench] yoshida4 bench unavailable: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # ------------- fused yoshida4 multi-step kernel --------------------
    rate_y4f = None
    if dtype == jnp.float32 and dev.platform != "cpu":
        try:
            from nbodysimproject_tpu.ops.pallas_batch import (
                yoshida4_multistep_jit)

            B_Y4 = int(os.environ.get("BENCH_BATCH_Y4", 1 << 22))
            ky1, ky2 = jax.random.split(jax.random.PRNGKey(17))
            pos_y4 = base_q[None] + 0.01 * jax.random.normal(
                ky1, (B_Y4, 3, 2), dtype)
            vel_y4 = base_v[None] + 0.01 * jax.random.normal(
                ky2, (B_Y4, 3, 2), dtype)
            mass_y4 = jnp.broadcast_to(base_m, (B_Y4, 3))
            eps2_y4 = jnp.full((B_Y4,), 1e-6, dtype)
            jax.block_until_ready((pos_y4, vel_y4))

            def run_y4():
                return yoshida4_multistep_jit(pos_y4, vel_y4, mass_y4,
                                              eps2_y4, DT, 1.0, N_STEPS,
                                              512, 8)

            py4, vy4 = run_y4()
            np.asarray(py4[0, 0])
            best_y4 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                py4, vy4 = run_y4()
                np.asarray(py4[0, 0])
                best_y4 = min(best_y4, time.perf_counter() - t0)
            rate_y4f = B_Y4 * N_STEPS / best_y4
            print(f"[bench] yoshida4 fused (B={B_Y4}): {best_y4:.4f}s "
                  f"rate={rate_y4f:.3e} sys-steps/s"
                  + (f" ({rate_y4f / rate_y:.1f}x the XLA scan)"
                     if rate_y else ""), file=sys.stderr)
        except Exception as e:
            print(f"[bench] yoshida4 fused unavailable: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)

    # Early partial emit: the analysis leg below compiles the full
    # per-bucket program ladder (~40 min on this 1-vCPU host), so if
    # the harness bounds the bench run, the headline metric still
    # lands in stdout; the complete line (with analysis + whfast
    # fields) is printed at the end and supersedes this one.
    print(json.dumps({
        "metric": "batched 3-body verlet system-steps/sec/chip (B=%d)"
                  % B_best,
        "value": rate, "unit": "system-steps/s",
        "vs_baseline": rate / 1.0e6, "partial": True,
    }))
    sys.stdout.flush()

    # ------------- ham_soft macro-step scan (flagship integrator) -----
    # (VERDICT round-1 item 9: bench the flagship workload too; numbers
    # to stderr + data/bench_details.json, headline metric unchanged)
    details = {"verlet_xla_scan": rate_xla, "verlet_best": rate,
               "f32_drift_sys0": drift}
    if rate_y is not None:
        details["yoshida4_xla_scan"] = rate_y
    if rate_y4f is not None:
        details["yoshida4_fused_steps_per_s"] = rate_y4f
        if rate_y is not None:
            details["yoshida4_fused_vs_scan"] = rate_y4f / rate_y
    try:
        hs_steps = max(1, N_STEPS // 10)  # ~10 substeps/step -> same work
        # 2^20 amortises the dispatch latency like the verlet headline
        # (2^17 measured 2.9e8 fused; 2^20 measures 5.9e8 — kernel rate)
        B_HS = int(os.environ.get("BENCH_BATCH_HS", 1 << 20))
        kh1, kh2 = jax.random.split(jax.random.PRNGKey(11))
        pos_h = base_q[None] + 0.01 * jax.random.normal(
            kh1, (B_HS, 3, 2), dtype)
        vel_h = base_v[None] + 0.01 * jax.random.normal(
            kh2, (B_HS, 3, 2), dtype)
        mass_h = jnp.broadcast_to(base_m, (B_HS, 3))
        mask_h = jnp.ones((B_HS, 3), bool)
        cfg_hs = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True)
        states_h, dyns_h = build_batch(mass_h, pos_h, vel_h, mask_h, cfg_hs,
                                       1.0, 5e-2, 0.0, DT)
        dyns_h = dyns_h.replace(n_sub=jnp.minimum(dyns_h.n_sub, 50))
        nsub_h = int(jax.device_get(jnp.max(dyns_h.n_sub)))
        out_h = integrate_batch(states_h, dyns_h, cfg_hs, dt, hs_steps,
                                nsub_h)
        np.asarray(out_h.pos[0, 0, 0])
        best_hs = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out_h = integrate_batch(states_h, dyns_h, cfg_hs, dt, hs_steps,
                                    nsub_h)
            np.asarray(out_h.pos[0, 0, 0])
            best_hs = min(best_hs, time.perf_counter() - t0)
        rate_hs = B_HS * hs_steps / best_hs
        details["hamsoft_macro_steps_per_s"] = rate_hs
        details["hamsoft_n_sub"] = nsub_h
        print(f"[bench] ham_soft macro-step scan: {best_hs:.3f}s "
              f"rate={rate_hs:.3e} sys-steps/s (n_sub={nsub_h})",
              file=sys.stderr)

        # fused VMEM-resident multi-step kernel (ops/pallas_hamsoft.py)
        if dtype == jnp.float32 and dev.platform != "cpu" \
                and B_HS % (8 * 256) == 0:
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
            np.asarray(jax.tree_util.tree_leaves(ko)[0].ravel()[0])
            best_k = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                ko = hamsoft_multistep_jit(*args_h)
                np.asarray(jax.tree_util.tree_leaves(ko)[0].ravel()[0])
                best_k = min(best_k, time.perf_counter() - t0)
            rate_k = B_HS * hs_steps / best_k
            details["hamsoft_fused_steps_per_s"] = rate_k
            details["hamsoft_fused_vs_scan"] = rate_k / rate_hs
            print(f"[bench] ham_soft fused kernel: {best_k:.3f}s "
                  f"rate={rate_k:.3e} sys-steps/s "
                  f"({rate_k / rate_hs:.2f}x the XLA scan)",
                  file=sys.stderr)

            # reflection barrier policy (VERDICT round-2 item 3):
            # fused kernel vs its own XLA scan path
            cfg_rf = cfg_hs.replace(use_soft_barrier=False)
            out_r = integrate_batch(states_h, dyns_h, cfg_rf, dt, hs_steps,
                                    nsub_h)
            np.asarray(out_r.pos[0, 0, 0])
            best_rs = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out_r = integrate_batch(states_h, dyns_h, cfg_rf, dt,
                                        hs_steps, nsub_h)
                np.asarray(out_r.pos[0, 0, 0])
                best_rs = min(best_rs, time.perf_counter() - t0)
            rate_rs = B_HS * hs_steps / best_rs
            details["hamsoft_refl_scan_steps_per_s"] = rate_rs

            kor = hamsoft_multistep_jit(*args_h, policy="reflection")
            np.asarray(jax.tree_util.tree_leaves(kor)[0].ravel()[0])
            best_kr = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                kor = hamsoft_multistep_jit(*args_h, policy="reflection")
                np.asarray(jax.tree_util.tree_leaves(kor)[0].ravel()[0])
                best_kr = min(best_kr, time.perf_counter() - t0)
            rate_kr = B_HS * hs_steps / best_kr
            details["hamsoft_refl_fused_steps_per_s"] = rate_kr
            details["hamsoft_refl_fused_vs_scan"] = rate_kr / rate_rs
            print(f"[bench] ham_soft reflection-policy: scan "
                  f"{rate_rs:.3e}, fused {rate_kr:.3e} sys-steps/s "
                  f"({rate_kr / rate_rs:.2f}x)", file=sys.stderr)
    except Exception as e:
        print(f"[bench] ham_soft bench unavailable: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # ------------- batched WHFast (VERDICT round-2 item 6) ------------
    rate_wh = None
    try:
        cfg_w = nb.SimConfig(integrator_mode="whfast",
                             fast_float32=(dtype == jnp.float32))
        # planetary hierarchy (Jacobi coordinates assume radius order):
        # central unit mass + two small planets
        m_w = jnp.broadcast_to(jnp.asarray([1.0, 1e-3, 1e-3], dtype), (B, 3))
        q_w = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]], dtype)
        v_w = jnp.asarray([[0.0, 0.0], [0.0, 1.0],
                           [-1.0 / jnp.sqrt(2.0), 0.0]], dtype)
        kw1, kw2 = jax.random.split(jax.random.PRNGKey(13))
        pos_w = q_w[None] + 0.01 * jax.random.normal(kw1, (B, 3, 2), dtype)
        vel_w = v_w[None] + 0.01 * jax.random.normal(kw2, (B, 3, 2), dtype)
        states_w, dyns_w = build_batch(m_w, pos_w, vel_w, mask, cfg_w, 1.0,
                                       1e-3, 0.0, DT)
        nsub_w = int(jax.device_get(jnp.max(dyns_w.n_sub)))
        out_w = integrate_batch(states_w, dyns_w, cfg_w, dt, N_STEPS, nsub_w)
        np.asarray(out_w.pos[0, 0, 0])
        best_w = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out_w = integrate_batch(states_w, dyns_w, cfg_w, dt, N_STEPS,
                                    nsub_w)
            np.asarray(out_w.pos[0, 0, 0])
            best_w = min(best_w, time.perf_counter() - t0)
        rate_wh = B * N_STEPS / best_w
        details["whfast_sys_steps_per_s"] = rate_wh
        print(f"[bench] whfast scan: {best_w:.3f}s rate={rate_wh:.3e} "
              f"sys-steps/s (n_sub={nsub_w})", file=sys.stderr)

        # fused multi-step WHFast kernel (ops/pallas_whfast.py): the
        # in-VMEM Laguerre-Conway Kepler drift + interaction kick
        if dtype == jnp.float32 and dev.platform != "cpu":
            from nbodysimproject_tpu.ops.pallas_whfast import (
                whfast_multistep_jit)

            B_WF = int(os.environ.get("BENCH_BATCH_WF", 1 << 22))
            kf1, kf2 = jax.random.split(jax.random.PRNGKey(19))
            pos_wf = q_w[None] + 0.01 * jax.random.normal(
                kf1, (B_WF, 3, 2), dtype)
            vel_wf = v_w[None] + 0.01 * jax.random.normal(
                kf2, (B_WF, 3, 2), dtype)
            mass_wf = jnp.broadcast_to(
                jnp.asarray([1.0, 1e-3, 1e-3], dtype), (B_WF, 3))
            eps2_wf = jnp.full((B_WF,), 1e-6, dtype)
            jax.block_until_ready((pos_wf, vel_wf))
            wf_steps = max(1, N_STEPS // 10)

            def run_wf():
                return whfast_multistep_jit(pos_wf, vel_wf, mass_wf,
                                            eps2_wf, DT, 1.0, wf_steps,
                                            8, 512)

            pwf, vwf = run_wf()
            np.asarray(pwf[0, 0])
            best_wf = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pwf, vwf = run_wf()
                np.asarray(pwf[0, 0])
                best_wf = min(best_wf, time.perf_counter() - t0)
            rate_wf = B_WF * wf_steps / best_wf
            details["whfast_fused_steps_per_s"] = rate_wf
            details["whfast_fused_vs_scan"] = rate_wf / rate_wh
            print(f"[bench] whfast fused (B={B_WF}): {best_wf:.4f}s "
                  f"rate={rate_wf:.3e} sys-steps/s "
                  f"({rate_wf / rate_wh:.2f}x the XLA scan)",
                  file=sys.stderr)
    except Exception as e:
        print(f"[bench] whfast bench unavailable: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    # ----- full-mode batched analysis throughput (the product) --------
    # The flagship workload: diverse-mixture stability analysis
    # (dataset generation).  VERDICT round-2 item 6: capture it in the
    # driver artifact, not just in self-reported data/*.json.
    rate_an = None
    try:
        from nbodysimproject_tpu.generators.pipeline import (
            diverse_population, _PIPE_CFG)
        from nbodysimproject_tpu.analysis.batch import analyze_population

        # 16384 is the README headline scale: enough chunks (16) to
        # amortise the capped-n_sub tail bucket the way production
        # mixtures do; override with BENCH_ANALYSIS_B for quick runs
        B_AN = int(os.environ.get("BENCH_ANALYSIS_B", 16384))
        AN_STEPS = int(os.environ.get("BENCH_ANALYSIS_STEPS", 1000))
        # dispatch-quantum override for width experiments (the MEGNO
        # kernel's per-step slope history is (8 n_steps, B/8) scoped
        # VMEM -> 2048 lanes is the widest safe quantum at 1000 steps)
        q_an = int(os.environ.get("BENCH_ANALYSIS_QUANTUM", 0))
        cfg_an = _PIPE_CFG.replace(analysis_group_quantum=q_an) if q_an \
            else _PIPE_CFG
        mass_a, pos_a, vel_a, mask_a, soft_a, _types = diverse_population(
            jax.random.PRNGKey(0), B_AN, n_slots=8)
        jax.block_until_ready(mass_a)
        t0 = time.perf_counter()
        analyze_population(mass_a, pos_a, vel_a, mask_a, cfg_an, G=1.0,
                           softening=np.asarray(soft_a), min_softening=0.0,
                           dt=DT, n_steps=AN_STEPS, mode="full",
                           show_progress=False)
        t_cold = time.perf_counter() - t0
        # Warm leg: MEDIAN of >= 5 repetitions with min/max and a
        # per-phase breakdown (dispatch vs drain vs host work).  A
        # single warm iteration on this launch-latency-bound path is
        # maximally exposed to session-to-session tunnel variance —
        # round 4's lone-iteration artifact (5,991/s) disagreed with
        # the committed claim (10,694/s) with nothing to tell variance
        # from regression (VERDICT round-4 item 1a).
        AN_REPS = int(os.environ.get("BENCH_ANALYSIS_REPS", 5))
        t_warms, phases = [], []
        for _ in range(AN_REPS):
            tm = {}
            t0 = time.perf_counter()
            df_a = analyze_population(mass_a, pos_a, vel_a, mask_a, cfg_an,
                                      G=1.0, softening=np.asarray(soft_a),
                                      min_softening=0.0, dt=DT,
                                      n_steps=AN_STEPS, mode="full",
                                      show_progress=False, timing_out=tm)
            t_warms.append(time.perf_counter() - t0)
            phases.append(tm)
        t_med = float(np.median(t_warms))
        rate_an = B_AN / t_med
        details["analysis_systems_per_s"] = rate_an
        details["analysis_B"] = B_AN
        details["analysis_warm_reps"] = AN_REPS
        details["analysis_warm_s"] = {
            "median": t_med, "min": float(np.min(t_warms)),
            "max": float(np.max(t_warms)),
            "all": [round(t, 3) for t in t_warms]}
        details["analysis_rate_spread"] = {
            "best": B_AN / float(np.min(t_warms)),
            "worst": B_AN / float(np.max(t_warms))}
        details["analysis_cold_s"] = t_cold
        for ph in ("setup_s", "dispatch_s", "drain_s", "frame_s"):
            details[f"analysis_{ph}"] = {
                "median": float(np.median([p[ph] for p in phases])),
                "min": float(np.min([p[ph] for p in phases])),
                "max": float(np.max([p[ph] for p in phases]))}
        details["analysis_n_dispatches"] = phases[0]["n_dispatches"]
        print(f"[bench] full-mode analysis (B={B_AN}): cold {t_cold:.1f}s, "
              f"warm median {t_med:.2f}s over {AN_REPS} reps "
              f"[{np.min(t_warms):.2f}, {np.max(t_warms):.2f}] -> "
              f"{rate_an:.1f} systems/s "
              f"(stable frac {df_a['is_stable'].mean():.3f}, "
              f"tail fast-path "
              f"{df_a.get('tail_fast_path', np.zeros(1)).mean():.4f})",
              file=sys.stderr)
        med = lambda ph: float(np.median([p[ph] for p in phases]))
        print(f"[bench] analysis phases (median s): "
              f"setup {med('setup_s'):.2f}, dispatch {med('dispatch_s'):.2f}, "
              f"drain {med('drain_s'):.2f}, frame {med('frame_s'):.2f} "
              f"({phases[0]['n_dispatches']} dispatches, "
              f"{phases[0]['n_groups']} groups)", file=sys.stderr)
    except Exception as e:
        print(f"[bench] analysis bench unavailable: "
              f"{type(e).__name__}: {e}", file=sys.stderr)

    try:
        os.makedirs("data", exist_ok=True)
        with open("data/bench_details.json", "w") as f:
            json.dump(details, f, indent=2)
    except OSError as e:
        print(f"[bench] could not write details: {e}", file=sys.stderr)

    target = 1.0e6  # north star: >=1e6 system-steps/s/chip at B>=1e4
    out_line = {
        "metric": "batched 3-body verlet system-steps/sec/chip (B=%d)"
                  % B_best,
        "value": rate,
        "unit": "system-steps/s",
        "vs_baseline": rate / target,
    }
    if rate_an is not None:
        out_line["analysis_systems_per_s"] = rate_an
        out_line["analysis_rate_best"] = details["analysis_rate_spread"]["best"]
        out_line["analysis_rate_worst"] = details["analysis_rate_spread"]["worst"]
    if rate_wh is not None:
        out_line["whfast_sys_steps_per_s"] = rate_wh
    print(json.dumps(out_line))


if __name__ == "__main__":
    main()
