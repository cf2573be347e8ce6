#!/usr/bin/env python
"""Decompose the warm per-chunk cost of the fused analysis engine.

The 1M headline run (NB_ANALYSIS_TIMING=1) shows every 1024-wide
bucket chunk costs ~1.7-1.9 s warm REGARDLESS of n_sub in [1, 48] —
i.e. the engine is fixed-cost-bound, not integration-bound, below
n_sub ~ 64.  This tool times analyze_batch_fused variants on one
synthetic uniform bucket to attribute that fixed cost:

  full      — mode=full, n_steps=1000, megno_steps=1000 (the pipeline)
  no_megno  — megno_steps=0 (isolates the MEGNO tail kernel)
  steps100  — n_steps=100 (10 metric samples instead of 100)
  nsub8     — n_sub=8 (8x the integration trips; tests trip scaling)
  wide      — width 4096 at n_sub=1 (tests width amortisation)

plus two synthetic arms that split a sample iteration into its halves
(the fused engine's scan body = kernel launch + vmapped step_metrics):

  kernel_x99  — jitted fori loop of 99 hamsoft_multistep launches of
                sample_interval steps each, NO metric sampling
  metrics_x99 — jitted fori loop of 99 step_metrics+running-update
                evaluations on a fixed state, NO kernel

Run on the TPU: python tools/profile_analysis_chunk.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nbodysimproject_tpu.analysis.fused import analyze_batch_fused
    from nbodysimproject_tpu.generators.pipeline import (_PIPE_CFG,
                                                         diverse_population)
    from nbodysimproject_tpu.parallel.batch_engine import build_batch

    print(f"[prof] device={jax.devices()[0]}", file=sys.stderr, flush=True)
    B = 1024
    mass, pos, vel, mask, soft, _t = diverse_population(
        jax.random.PRNGKey(0), 4096, n_slots=8)
    dt = jnp.float32(0.01)

    def bucket(width, n_sub):
        sl = slice(0, width)
        states, dyns = build_batch(mass[sl], pos[sl], vel[sl], mask[sl],
                                   _PIPE_CFG, 1.0,
                                   np.asarray(soft)[sl], 0.0, 0.01)
        dyns = dyns.replace(n_sub=jnp.full((width,), n_sub, jnp.int32))
        keys = jax.random.split(jax.random.PRNGKey(1), width)
        return states, dyns, keys

    def timed(tag, width, n_sub, n_steps, megno_steps, mode="full"):
        states, dyns, keys = bucket(width, n_sub)
        args = (states, dyns, _PIPE_CFG, keys, n_steps, dt, mode,
                int(n_sub), megno_steps, 128, 1.0)
        t0 = time.perf_counter()
        r, _ = analyze_batch_fused(*args)
        jax.block_until_ready(r["energy_drift"])
        t_c = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r, _ = analyze_batch_fused(*args)
            jax.block_until_ready(r["energy_drift"])
            best = min(best, time.perf_counter() - t0)
        print(f"[prof] {tag:9s} width={width} n_sub={n_sub} "
              f"steps={n_steps} megno={megno_steps}: compile {t_c:.1f}s "
              f"warm {best:.3f}s -> {width / best:.0f} systems/s",
              file=sys.stderr, flush=True)
        return best

    t_full = timed("full", B, 1, 1000, 1000)
    t_nom = timed("no_megno", B, 1, 1000, 0)
    t_s100 = timed("steps100", B, 1, 100, 1000)
    t_n8 = timed("nsub8", B, 8, 1000, 1000)
    print(f"[prof] attribution: megno={t_full - t_nom:.3f}s "
          f"samples~={t_full - t_s100:.3f}s "
          f"trips(x8)={t_n8 - t_full:.3f}s",
          file=sys.stderr, flush=True)
    try:
        # width 4096 exceeds the MEGNO slope-history scratch's scoped
        # VMEM budget on v5e (known cap ~2048); keep the arm for
        # hardware where it fits but don't let it kill the split arms
        t_wide = timed("wide", 4096, 1, 1000, 1000)
        print(f"[prof] width4x={t_wide / t_full:.2f}x time "
              f"({4096 / t_wide:.0f} vs {B / t_full:.0f} systems/s)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[prof] wide arm skipped: {type(e).__name__} "
              f"(VMEM cap at width 4096 on v5e)", file=sys.stderr,
              flush=True)

    # --- split one sample iteration into kernel launch vs metrics ----
    import importlib

    from nbodysimproject_tpu.analysis import fused as FU
    from nbodysimproject_tpu.analysis.stability import _running_update
    from nbodysimproject_tpu.diagnostics.metrics import step_metrics
    from nbodysimproject_tpu.ops.pallas_hamsoft import hamsoft_multistep

    E = importlib.import_module("nbodysimproject_tpu.diagnostics.energy")

    states, dyns, keys = bucket(B, 1)
    dtf = jnp.asarray(0.01, states.pos.dtype)
    n_sub = jnp.maximum(dyns.n_sub, 1)
    h = dtf / n_sub.astype(states.pos.dtype)
    policy = FU._kernel_policy(_PIPE_CFG)
    gm = str(_PIPE_CFG.eps_grad_mode)

    def run_kernel(quad, steps):
        pos, vel, eps, pi = quad
        return hamsoft_multistep(
            pos, vel, states.mass, eps, pi, k_soft=dyns.k_soft,
            mu=dyns.mu_soft, alpha=dyns.alpha_run,
            eps_min=dyns.min_softening, eps_max=dyns.max_softening, h=h,
            n_sub=n_sub, n_steps=steps, n_sub_max=1, G=1.0,
            k_wall=float(_PIPE_CFG.k_wall), eta=float(_PIPE_CFG.eta),
            jcap=float(_PIPE_CFG.j_max_cap),
            bexp=int(_PIPE_CFG.barrier_exponent), lanes=128,
            policy=policy, grad_mode=gm,
            lam_align=float(_PIPE_CFG.lambda_softening))

    @jax.jit
    def kernel_x99(quad):
        def body(_, q):
            return run_kernel(q, 10)
        return jax.lax.fori_loop(0, 99, body, quad)

    L0 = jax.vmap(E.angular_momentum_z)(states)
    z = jnp.zeros((B,), states.pos.dtype)
    acc0 = (z, z, z, jnp.full((B,), -jnp.inf), jnp.full((B,), jnp.inf))
    accs0 = {k: acc0 for k in ("com_drift", "J_eps", "theta_eps",
                               "cos_theta", "var_L", "tr_hessian")}

    @jax.jit
    def metrics_x99(quad, accs):
        def body(_, accs):
            # tie the state to the carry (count accumulator) so XLA
            # cannot hoist the metric computation out of the loop
            cnt = accs["com_drift"][0]
            pos, vel, eps, pi = quad
            st = FU._states_with(
                states, (pos + (jnp.float32(1e-30) * cnt)[:, None, None],
                         vel, eps, pi))
            met = jax.vmap(
                lambda s1, d1, l0: step_metrics(s1, d1, _PIPE_CFG, L0=l0))(
                    st, dyns, L0)
            upd = lambda acc, x: jax.vmap(_running_update)(acc, x)
            return {k: upd(accs[k], met[k]) for k in accs}

        return jax.lax.fori_loop(0, 99, body, accs)

    quad0 = FU._quad_of(states)

    def timed2(tag, fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        print(f"[prof] {tag:12s} warm {best:.3f}s", file=sys.stderr,
              flush=True)
        return best

    t_k = timed2("kernel_x99", kernel_x99, quad0)
    t_m = timed2("metrics_x99", metrics_x99, quad0, accs0)
    print(f"[prof] split: kernel launches {t_k:.3f}s + metrics {t_m:.3f}s "
          f"= {t_k + t_m:.3f}s of full {t_full:.3f}s", file=sys.stderr,
          flush=True)


if __name__ == "__main__":
    main()
