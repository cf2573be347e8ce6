#!/usr/bin/env python
"""Worker process for the multi-host dataset-generation test: joins a
2-process jax.distributed CPU runtime and writes its shard.

Usage: dist_worker.py <coordinator_port> <process_id> <num_processes>
       <out_dir> <n_systems> <n_steps>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# sitecustomize force-sets the axon platform; pin CPU before first use
jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, nproc, out_dir, n_systems, n_steps = sys.argv[1:7]
    from nbodysimproject_tpu.parallel.distributed import (
        initialize_distributed, generate_dataset_sharded)

    ok = initialize_distributed(f"localhost:{port}", int(nproc), int(pid))
    assert ok and jax.process_count() == int(nproc), (
        f"distributed init failed: process_count={jax.process_count()}")

    # DIST_CAP bounds the analysis substep cap (test harness: two
    # workers compile concurrently on one CPU host; the production
    # cap-256 program set does not fit the test timeout there)
    cfg = None
    cap = int(os.environ.get("DIST_CAP", "0"))
    if cap:
        from nbodysimproject_tpu.generators.pipeline import _PIPE_CFG

        cfg = _PIPE_CFG.replace(analysis_n_sub_cap=cap,
                                tail_min_n_sub=max(8, cap // 2),
                                analysis_group_quantum=8)
    generate_dataset_sharded(seed=0, n_systems=int(n_systems),
                             out_dir=out_dir, n_steps=int(n_steps),
                             mode="full", show_progress=False, cfg=cfg)
    print(f"[worker {pid}] done", flush=True)
    # The shard and its statistics are already on disk; the shutdown
    # barrier is cleanup only.  On a loaded single-core host the peers
    # can drift minutes apart, so a barrier DEADLINE_EXCEEDED here must
    # not fail the run (the test validates output equality instead).
    try:
        jax.distributed.shutdown()
    except Exception as e:  # pragma: no cover - timing dependent
        print(f"[worker {pid}] shutdown barrier skipped: "
              f"{type(e).__name__}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
