"""Multi-host scale-out: jax.distributed init + process-sharded dataset
generation (VERDICT round-1 item 7; SURVEY.md section 7 step 7).

The reference is strictly single-process (SURVEY.md section 2
parallelism table).  Here a dataset run scales over hosts by

1. ``initialize_distributed()`` — ``jax.distributed.initialize`` from
   explicit args or the standard ``JAX_COORDINATOR_ADDRESS`` /
   ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars (no-op when
   unset or single-process);
2. ``generate_dataset_sharded`` — every process draws the SAME global
   population from one key (generation is a trivially cheap jitted
   program; regenerating beats communicating), analyses only its
   contiguous shard, and writes ``shard_{i:05d}.csv[.gz]``;
3. feature statistics are reduced with a ``psum`` over the global
   device mesh when a distributed runtime is up, else computed
   locally — either way the result equals the single-process run
   because the population and the shard partition are deterministic
   functions of (key, n_systems, process_count).

``merge_shards`` concatenates the per-shard CSVs back into one frame
(sorted by simulation_id) for training.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize the multi-process JAX runtime.  Returns True when a
    multi-process runtime is (already or newly) live."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))

    # IMPORTANT: jax.distributed.initialize() must run before ANY call
    # that initialises the XLA backend — including jax.process_count()
    # — so probe the runtime state without touching the backend.
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except (ImportError, AttributeError):
        already = False
    if already:
        return jax.process_count() > 1
    if num_processes <= 1 or coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    # establish the collective transport NOW, while all processes are
    # still in lockstep from the coordinator rendezvous: the first
    # all-reduce creates the Gloo/ICI communicator, and deferring it to
    # the end of an asymmetric compile-heavy workload can exceed the
    # transport's connect timeout (observed: two CPU workers drifting
    # minutes apart -> "Gloo context initialization failed")
    try:
        _warmup_collective()
    except Exception as e:  # pragma: no cover - transport specific
        print(f"[distributed] warmup collective failed: "
              f"{type(e).__name__}: {e}")
    return True


def _warmup_collective():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("hosts",))
    ldc = jax.local_device_count()
    rows = np.ones((ldc, 1), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("hosts")), rows, (len(devs), 1))
    f = jax.jit(shard_map(lambda t: jax.lax.psum(t, "hosts"), mesh=mesh,
                          in_specs=P("hosts"), out_specs=P()))
    np.asarray(jax.device_get(f(arr)))


def shard_bounds(n: int, process_index: int, process_count: int
                 ) -> Tuple[int, int]:
    """Contiguous [lo, hi) partition of n items over process_count
    processes (first ``n % p`` shards get the extra item)."""
    base, extra = divmod(n, process_count)
    lo = process_index * base + min(process_index, extra)
    hi = lo + base + (1 if process_index < extra else 0)
    return lo, hi


def feature_statistics(df, feature_cols=None) -> dict:
    """Per-feature (count, sum, sumsq) over finite entries — the
    merge-able moments whose reduction is exact across shards."""
    from ..ml.dataset import StabilityDataset

    if feature_cols is None:
        feature_cols = StabilityDataset.feature_columns(df)
    X = df[feature_cols].to_numpy(np.float64)
    finite = np.isfinite(X)
    Xz = np.where(finite, X, 0.0)
    return {
        "feature_cols": list(feature_cols),
        "count": finite.sum(0).astype(np.float64),
        "sum": Xz.sum(0),
        "sumsq": (Xz * Xz).sum(0),
    }


def reduce_statistics_global(stats: dict) -> dict:
    """All-reduce the moment vectors over every process.

    Uses a psum over the global device mesh when the runtime is
    multi-process (the reduction rides ICI/DCN); returns the input
    untouched otherwise."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    if jax.process_count() <= 1:
        return stats

    from jax.sharding import NamedSharding

    devs = np.array(jax.devices())  # global device list
    mesh = Mesh(devs, ("hosts",))
    n_dev = len(devs)
    ldc = jax.local_device_count()
    sharding = NamedSharding(mesh, P("hosts"))

    def allsum(x):
        # one row per device; each process contributes x once in total
        # (its ldc rows carry x/ldc each), so the psum over the device
        # axis is exactly the sum over processes.  The moments are f64
        # on the host; ride the collective in f64 too (enable_x64 is
        # scoped — the CPU workers run with x64 globally off), else the
        # f32 round-trip costs ~1e-7 relative and the variance summary
        # amplifies it by mean^2/var under cancellation.
        with jax.enable_x64():
            x = jnp.asarray(np.asarray(x, np.float64))
            local_rows = np.broadcast_to(
                np.asarray(x) / ldc, (ldc,) + x.shape)
            global_arr = jax.make_array_from_process_local_data(
                sharding, local_rows, (n_dev,) + x.shape)

            f = jax.jit(shard_map(lambda t: jax.lax.psum(t, "hosts"),
                                  mesh=mesh, in_specs=P("hosts"),
                                  out_specs=P()))
            # the per-device block keeps a leading length-1 shard axis
            return np.asarray(jax.device_get(f(global_arr)))[0]

    out = dict(stats)
    for k in ("count", "sum", "sumsq"):
        # keep the host f64 — a jnp cast here (x64 off) would truncate
        # to f32 before the collective ever sees the values
        out[k] = allsum(np.asarray(stats[k], np.float64))
    return out


def statistics_summary(stats: dict) -> dict:
    cnt = np.maximum(stats["count"], 1.0)
    mean = stats["sum"] / cnt
    var = np.maximum(stats["sumsq"] / cnt - mean * mean, 0.0)
    return {
        "feature_cols": stats["feature_cols"],
        "count": stats["count"].tolist(),
        "mean": mean.tolist(),
        "std": np.sqrt(var).tolist(),
    }


def generate_dataset_sharded(seed: int, n_systems: int, *, out_dir: str,
                             n_steps: int = 1000, dt: float = 0.01,
                             mode: str = "full",
                             process_index: int | None = None,
                             process_count: int | None = None,
                             reduce_stats: bool = True,
                             show_progress: bool = True,
                             cfg=None):
    """Generate + analyse this process's shard of the global population
    and write ``<out_dir>/shard_{i:05d}.csv.gz`` plus a stats JSON.

    Deterministic across topologies: the global population depends only
    on (seed, n_systems); shard i of p covers a contiguous index range,
    so the union over any p equals the single-process dataset row for
    row (simulation_id is the GLOBAL index).  With
    ``cfg.analysis_group_quantum > 0`` (the pipeline default) this
    equality is BITWISE, trajectory metrics included: every analysis
    dispatch has the same canonical program shape, so XLA's rounding
    cannot depend on how the population was split across hosts.
    """
    import jax

    from ..analysis.batch import analyze_population
    from ..generators.pipeline import diverse_population, _PIPE_CFG
    from ..ml.dataset import StabilityDataset

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if cfg is None:
        cfg = _PIPE_CFG

    mass, pos, vel, mask, soft, types = diverse_population(
        jax.random.PRNGKey(seed), n_systems, n_slots=8)
    lo, hi = shard_bounds(n_systems, process_index, process_count)
    tk = lambda x: np.asarray(x)[lo:hi]

    df = analyze_population(tk(mass), tk(pos), tk(vel), tk(mask), cfg,
                            G=1.0, softening=tk(soft), min_softening=0.0,
                            dt=dt, n_steps=n_steps, mode=mode, seed=seed,
                            id_offset=lo, show_progress=show_progress)
    df["system_type"] = types[lo:hi]
    df["simulation_id"] = np.arange(lo, hi)

    os.makedirs(out_dir, exist_ok=True)
    shard_path = os.path.join(out_dir, f"shard_{process_index:05d}.csv.gz")
    StabilityDataset.save(shard_path, df)

    stats = feature_statistics(df)
    if reduce_stats:
        stats = reduce_statistics_global(stats)
    stats_path = os.path.join(out_dir,
                              f"stats_{process_index:05d}.json")
    with open(stats_path, "w") as f:
        json.dump(statistics_summary(stats), f)
    return df, stats


def merge_shards(out_dir: str):
    """Concatenate every shard CSV in out_dir into one frame ordered by
    the global simulation_id."""
    import glob

    import pandas as pd

    paths = sorted(glob.glob(os.path.join(out_dir, "shard_*.csv.gz")))
    # float_precision="round_trip": pandas' default fast parser loses
    # the last ulp, which would break the bitwise sharded==single
    # contract THROUGH the shard files (values are written with
    # shortest-round-trip repr, so the exact parser recovers them)
    frames = [pd.read_csv(p, comment="#", float_precision="round_trip")
              for p in paths]
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values("simulation_id").reset_index(drop=True)


def merge_statistics(stats_list) -> dict:
    """Host-side exact reduction of per-shard moment stats (the
    fallback when no distributed runtime is up)."""
    out = dict(stats_list[0])
    for s in stats_list[1:]:
        assert s["feature_cols"] == out["feature_cols"]
        for k in ("count", "sum", "sumsq"):
            out[k] = np.asarray(out[k]) + np.asarray(s[k])
    return out
