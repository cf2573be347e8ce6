#!/usr/bin/env python
"""10M-row dataset demonstration (VERDICT round-3 item 6).

Two orders of magnitude beyond the reference's 155k training set
(minbody/README.md:23-29): generate and fully analyse a 10,485,760-
system diverse population in 80 checkpointed chunks of 131,072.

Checkpoint / resume: every chunk is persisted as a parquet file plus a
manifest row before the next chunk starts; rerunning the tool skips
completed chunks (kill it anywhere and restart — nothing recomputes).
Chunk k draws from fold_in(PRNGKey(seed), k), so any subset of chunks
is reproducible independently; simulation_id is globalised.

Artifacts:
* TENM_DIR/chunk_*.parquet           (gitignored — ~4 GB total)
* data/tenm_dataset_metrics.json     (committed: per-chunk timings,
                                      sustained systems/s, label stats)

Env: TENM_CHUNKS (80), TENM_CHUNK_B (131072), TENM_SEED (777),
TENM_STEPS (1000), TENM_DIR (data10m).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np

CHUNKS = int(os.environ.get("TENM_CHUNKS", 80))
CHUNK_B = int(os.environ.get("TENM_CHUNK_B", 131072))
SEED = int(os.environ.get("TENM_SEED", 777))
N_STEPS = int(os.environ.get("TENM_STEPS", 1000))
OUT_DIR = os.environ.get("TENM_DIR", "data10m")
METRICS = os.environ.get("TENM_METRICS", "data/tenm_dataset_metrics.json")


def log(msg):
    print(f"[10m] {msg}", file=sys.stderr, flush=True)


def chunk_path(k):
    return os.path.join(OUT_DIR, f"chunk_{k:04d}.parquet")


def main():
    import jax

    from nbodysimproject_tpu.analysis.batch import analyze_population
    from nbodysimproject_tpu.generators.pipeline import (diverse_population,
                                                         _PIPE_CFG)

    os.makedirs(OUT_DIR, exist_ok=True)
    manifest_path = os.path.join(OUT_DIR, "manifest.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    log(f"device={jax.devices()[0]} chunks={CHUNKS} x {CHUNK_B} = "
        f"{CHUNKS * CHUNK_B:,} systems, steps={N_STEPS}")
    t_session0 = time.perf_counter()
    done_before = sum(1 for k in range(CHUNKS)
                      if os.path.exists(chunk_path(k)))
    if done_before:
        log(f"resume: {done_before}/{CHUNKS} chunks already on disk")

    for k in range(CHUNKS):
        path = chunk_path(k)
        if os.path.exists(path):
            continue
        t0 = time.perf_counter()
        key = jax.random.fold_in(jax.random.PRNGKey(SEED), k)
        mass, pos, vel, mask, soft, types = diverse_population(
            key, CHUNK_B, n_slots=8)
        t_gen = time.perf_counter() - t0

        t0 = time.perf_counter()
        df = analyze_population(mass, pos, vel, mask, _PIPE_CFG, G=1.0,
                                softening=np.asarray(soft),
                                min_softening=0.0, dt=0.01,
                                n_steps=N_STEPS, mode="full", seed=SEED,
                                show_progress=False,
                                id_offset=k * CHUNK_B)
        t_an = time.perf_counter() - t0
        df["system_type"] = types
        df["simulation_id"] = np.arange(k * CHUNK_B, (k + 1) * CHUNK_B)

        t0 = time.perf_counter()
        tmp = path + ".tmp"
        df.to_parquet(tmp, index=False)
        os.replace(tmp, path)
        t_io = time.perf_counter() - t0

        manifest[str(k)] = {
            "rows": int(len(df)),
            "gen_s": round(t_gen, 2), "analysis_s": round(t_an, 2),
            "io_s": round(t_io, 2),
            "systems_per_s": round(CHUNK_B / t_an, 1),
            "stable_fraction": float(df["is_stable"].mean()),
            "pathological": float(df["pathological_energy"].mean()),
            "capped": float(df["n_sub_capped"].mean()),
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)
        log(f"chunk {k + 1}/{CHUNKS}: gen {t_gen:.1f}s analysis "
            f"{t_an:.1f}s ({CHUNK_B / t_an:.0f} sys/s) io {t_io:.1f}s "
            f"stable={manifest[str(k)]['stable_fraction']:.4f}")

    # ---- summary metrics over the manifest --------------------------
    rows = [manifest[str(k)] for k in range(CHUNKS) if str(k) in manifest]
    total_rows = sum(r["rows"] for r in rows)
    an_s = [r["analysis_s"] for r in rows]
    rates = [r["systems_per_s"] for r in rows]
    # sustained rate excludes the cold chunk 0 (compile + AOT build)
    warm = rates[1:] if len(rates) > 1 else rates
    summary = {
        "rows": total_rows,
        "chunks": len(rows),
        "chunk_rows": CHUNK_B,
        "n_steps": N_STEPS,
        "seed": SEED,
        "mode": "full",
        "stable_fraction": float(np.average(
            [r["stable_fraction"] for r in rows],
            weights=[r["rows"] for r in rows])),
        "pathological_fraction": float(np.average(
            [r["pathological"] for r in rows],
            weights=[r["rows"] for r in rows])),
        "analysis_seconds_total": round(sum(an_s), 1),
        "cold_chunk_systems_per_s": rates[0] if rates else None,
        "sustained_systems_per_s": round(float(np.mean(warm)), 1),
        "sustained_systems_per_s_min": round(float(np.min(warm)), 1),
        "session_wall_s": round(time.perf_counter() - t_session0, 1),
        "resume_demonstrated": done_before > 0,
        "storage": OUT_DIR,
        "reference_training_set_rows": 155042,
    }
    with open(METRICS, "w") as f:
        json.dump({"summary": summary, "chunks": manifest}, f, indent=1)
    log(f"total {total_rows:,} rows; sustained "
        f"{summary['sustained_systems_per_s']} systems/s; wrote {METRICS}")


if __name__ == "__main__":
    main()
