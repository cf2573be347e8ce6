#!/usr/bin/env python
"""Measure the cost-aware bucket-packing throughput gain on device.

Packing (analysis/batch.py::_pack_groups) merges a small n_sub bucket
into the next larger one when that strictly reduces total sequential
kernel trips.  It is scheduling-only — frames are bitwise identical
either way (tested in test_analysis_ml) — so the question is purely
wall clock.  Since the engines receive a scheduling-stripped cfg
(_engine_cfg), both arms share every compiled program: the ladder
compiles once, and the on/off comparison is warm-vs-warm.

Run on the TPU: python tools/bench_packing.py
Env: PK_B (16384), PK_STEPS (1000), PK_OUT.
Writes data/bench_packing.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np

B = int(os.environ.get("PK_B", 16384))
N_STEPS = int(os.environ.get("PK_STEPS", 1000))
OUT = os.environ.get("PK_OUT", "data/bench_packing.json")


def log(msg):
    print(f"[packing] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from nbodysimproject_tpu.analysis.batch import analyze_population
    from nbodysimproject_tpu.generators.pipeline import (_PIPE_CFG,
                                                         diverse_population)

    log(f"device={jax.devices()[0]} B={B} steps={N_STEPS}")
    mass, pos, vel, mask, soft, _t = diverse_population(
        jax.random.PRNGKey(0), B, n_slots=8)
    jax.block_until_ready(mass)
    soft_np = np.asarray(soft)

    def run(cfg):
        t0 = time.perf_counter()
        df = analyze_population(mass, pos, vel, mask, cfg, G=1.0,
                                softening=soft_np, min_softening=0.0,
                                dt=0.01, n_steps=N_STEPS, mode="full",
                                show_progress=False)
        return time.perf_counter() - t0, df

    res = {"B": B, "n_steps": N_STEPS,
           "quantum": int(_PIPE_CFG.analysis_group_quantum)}
    cfg_on = _PIPE_CFG
    cfg_off = _PIPE_CFG.replace(analysis_bucket_packing=False)

    t_cold, df0 = run(cfg_on)
    log(f"cold (ladder compile): {t_cold:.1f}s")
    res["cold_s"] = t_cold

    for name, cfg in (("packed", cfg_on), ("unpacked", cfg_off)):
        best = float("inf")
        for _ in range(2):
            t, df = run(cfg)
            best = min(best, t)
        res[f"{name}_warm_s"] = best
        res[f"{name}_systems_per_s"] = B / best
        log(f"{name}: warm {best:.2f}s -> {B / best:.1f} systems/s")
        # scheduling-only contract: identical frames
        if not df.equals(df0):
            log("WARNING: frames differ between arms!")
            res["frames_equal"] = False
        else:
            res.setdefault("frames_equal", True)

    res["packed_vs_unpacked"] = (res["unpacked_warm_s"]
                                 / res["packed_warm_s"])
    log(f"packing speedup: {res['packed_vs_unpacked']:.3f}x")

    os.makedirs("data", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
