#!/usr/bin/env python
"""Measure the early-exit probe on the capped analysis tail bucket.

The n_sub=256 bucket is the one slice the Kepler-split tail policy
does NOT reroute (genuinely non-hierarchical tight systems) and it
costs more per system than every other bucket combined (ROADMAP
round-4 item 3b).  From the committed 131k frame, ~48% of the
high-n_sub slice is pathological (|energy drift| > 10) and only ~2%
is stable — exactly the population the early-exit probe
(analysis/batch.py, cfg.early_exit_probe) was built for: probe the
bucket for 10% of the horizon in core mode, then run only the
survivors to the full horizon.

The knob was measured OFF-worthy in round 2 at min_n_sub=8 (probing
every cheap bucket added dispatch overhead).  This tool re-measures
it gated to the capped bucket only (min_n_sub high), warm-vs-warm on
shared programs (the knobs are scheduling-only since round 3), and
checks the label contract: is_stable must be identical across arms
(aborted rows are pathological -> forced unstable either way).

Run on the TPU: python tools/bench_early_exit.py
Env: EE_B (16384), EE_STEPS (1000), EE_MIN_NSUB (129), EE_PROBE (0.1),
     EE_OUT (data/bench_early_exit.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np

B = int(os.environ.get("EE_B", 16384))
N_STEPS = int(os.environ.get("EE_STEPS", 1000))
MIN_NSUB = int(os.environ.get("EE_MIN_NSUB", 129))
PROBE = float(os.environ.get("EE_PROBE", 0.1))
OUT = os.environ.get("EE_OUT", "data/bench_early_exit.json")


def log(msg):
    print(f"[early-exit] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    from nbodysimproject_tpu.analysis.batch import analyze_population
    from nbodysimproject_tpu.generators.pipeline import (_PIPE_CFG,
                                                         diverse_population)

    log(f"device={jax.devices()[0]} B={B} steps={N_STEPS} "
        f"min_n_sub={MIN_NSUB} probe={PROBE}")
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

    res = {"B": B, "n_steps": N_STEPS, "min_n_sub": MIN_NSUB,
           "probe": PROBE}
    cfg_off = _PIPE_CFG
    cfg_on = _PIPE_CFG.replace(early_exit_probe=PROBE,
                               early_exit_min_n_sub=MIN_NSUB)

    t_cold, df_off = run(cfg_off)
    log(f"cold (ladder compile): {t_cold:.1f}s")
    res["cold_s"] = t_cold
    # one cold pass for the ON arm too: the probe's core-mode program
    # for the capped bucket is its only extra compile
    t_cold_on, df_on = run(cfg_on)
    log(f"cold ON arm: {t_cold_on:.1f}s")

    for name, cfg in (("off", cfg_off), ("on", cfg_on)):
        best = float("inf")
        for _ in range(2):
            t, df = run(cfg)
            best = min(best, t)
        res[f"{name}_warm_s"] = best
        res[f"{name}_systems_per_s"] = B / best
        log(f"{name}: warm {best:.2f}s -> {B / best:.1f} systems/s")
        if name == "off":
            df_off = df
        else:
            df_on = df

    # label contract: aborted rows carry probe-window drift, which is
    # already > threshold, so pathological_energy -> is_stable=0 either
    # way; every non-aborted row recomputes from scratch (bit-identical)
    n_ab = int(df_on["early_exit"].sum()) if "early_exit" in df_on else 0
    res["aborted_rows"] = n_ab
    res["labels_equal"] = bool(
        (df_on["is_stable"].values == df_off["is_stable"].values).all())
    surv_cols = [c for c in ("energy_drift", "MEGNO") if c in df_on]
    keep = ~df_on.get("early_exit",
                      np.zeros(len(df_on), bool)).values.astype(bool)
    res["survivor_columns_equal"] = bool(all(
        np.array_equal(df_on[c].values[keep], df_off[c].values[keep],
                       equal_nan=True) for c in surv_cols))
    log(f"aborted={n_ab} labels_equal={res['labels_equal']} "
        f"survivor_cols_equal={res['survivor_columns_equal']}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    log(f"wrote {OUT}")


if __name__ == "__main__":
    main()
