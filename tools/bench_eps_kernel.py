#!/usr/bin/env python
"""On-device validation + timing for the fused (eps*, grad) kernel
(ops/pallas_eps.py) feeding the ham_soft XLA scan path.

1. Parity: step a ham_soft batch with cfg.fused_eps_grad on/off and
   compare trajectories (the kernel reorders float32 arithmetic, so
   tolerance, not bitwise).
2. Timing: the bench.py ham_soft macro-scan row both ways (VERDICT
   round-2 item 8: hamsoft_macro_steps_per_s >= 5e7 from 1.57e7).

Run on the TPU (reserve the tunnel): python tools/bench_eps_kernel.py
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
    import nbodysimproject_tpu as nb
    from nbodysimproject_tpu.parallel.batch_engine import (build_batch,
                                                           integrate_batch)

    dev = jax.devices()[0]
    B = int(os.environ.get("EPSK_B", 1 << 17))
    steps = int(os.environ.get("EPSK_STEPS", 100))
    dt = 0.01
    print(f"[eps-bench] device={dev} B={B} steps={steps}", file=sys.stderr,
          flush=True)

    base_q = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], jnp.float32)
    base_v = jnp.asarray([[0.0, 0.0], [0.0, 0.7], [-0.5, 0.0]], jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    pos = base_q[None] + 0.01 * jax.random.normal(k1, (B, 3, 2), jnp.float32)
    vel = base_v[None] + 0.01 * jax.random.normal(k2, (B, 3, 2), jnp.float32)
    mass = jnp.ones((B, 3), jnp.float32)
    mask = jnp.ones((B, 3), bool)

    outs, rates = {}, {}
    for flag in (False, True):
        cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True,
                           fused_eps_grad=flag)
        states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2,
                                   0.0, dt)
        dyns = dyns.replace(n_sub=jnp.minimum(dyns.n_sub, 50))
        nsub = int(jax.device_get(jnp.max(dyns.n_sub)))
        t0 = time.perf_counter()
        out = integrate_batch(states, dyns, cfg, dt, steps, nsub)
        jax.block_until_ready(out.pos)
        t_compile = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = integrate_batch(states, dyns, cfg, dt, steps, nsub)
            jax.block_until_ready(out.pos)
            best = min(best, time.perf_counter() - t0)
        outs[flag] = np.asarray(jax.device_get(out.pos))
        rates[flag] = B * steps / best
        print(f"[eps-bench] fused_eps_grad={flag}: compile+first "
              f"{t_compile:.1f}s, best {best:.3f}s -> {rates[flag]:.3e} "
              f"sys-steps/s (n_sub={nsub})", file=sys.stderr, flush=True)

    err = np.max(np.abs(outs[True] - outs[False]))
    scale = np.max(np.abs(outs[False]))
    print(f"[eps-bench] trajectory max |diff| = {err:.3e} "
          f"(scale {scale:.3e}) after {steps} macro steps",
          file=sys.stderr, flush=True)
    print(f"[eps-bench] speedup: {rates[True] / rates[False]:.2f}x",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
