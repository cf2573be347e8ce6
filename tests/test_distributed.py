"""Multi-host scale-out (VERDICT round-1 item 7): process-sharded
dataset generation is deterministic across topologies, per-shard CSVs
merge to the single-process frame, and a real 2-process CPU runtime
produces identical statistics."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from nbodysimproject_tpu.parallel.distributed import (
    shard_bounds, generate_dataset_sharded, merge_shards,
    feature_statistics, merge_statistics, statistics_summary)


N_SYSTEMS = 12
N_STEPS = 60


class TestShardPartition:
    def test_bounds_cover_and_disjoint(self):
        for n, p in ((10, 3), (7, 7), (5, 8), (100, 4)):
            spans = [shard_bounds(n, i, p) for i in range(p)]
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c and a <= b and c <= d


class TestShardedGeneration:
    def test_union_of_shards_equals_single_process(self, tmp_path):
        one = str(tmp_path / "one")
        two = str(tmp_path / "two")
        # small canonical dispatch quantum: program shapes (hence f32
        # rounding) are identical across topologies, so even chaotic
        # trajectory metrics reproduce bitwise (CPU-sized stand-in for
        # the pipeline's 1024)
        from nbodysimproject_tpu.generators.pipeline import _PIPE_CFG

        cfg = _PIPE_CFG.replace(analysis_group_quantum=8)
        df_single, stats_single = generate_dataset_sharded(
            seed=0, n_systems=N_SYSTEMS, out_dir=one, n_steps=N_STEPS,
            process_index=0, process_count=1, reduce_stats=False,
            show_progress=False, cfg=cfg)

        stats_shards = []
        for i in range(2):
            _df, st = generate_dataset_sharded(
                seed=0, n_systems=N_SYSTEMS, out_dir=two, n_steps=N_STEPS,
                process_index=i, process_count=2, reduce_stats=False,
                show_progress=False, cfg=cfg)
            stats_shards.append(st)

        merged = merge_shards(two)
        ref = merge_shards(one)
        assert list(merged.columns) == list(ref.columns)
        from nbodysimproject_tpu.ml.dataset import is_pre_integration

        num = [c for c in ref.columns
               if pd.api.types.is_numeric_dtype(ref[c])]
        # With analysis_group_quantum > 0 every dispatch has the same
        # program shape regardless of topology, so even chaos-amplified
        # trajectory metrics reproduce BITWISE (not just approximately:
        # XLA's fusion/FMA choices depend on shapes, and a 1-ulp IC
        # difference explodes through a chaotic trajectory)
        x = merged[num].to_numpy(np.float64)
        y = ref[num].to_numpy(np.float64)
        eq = (x == y) | (np.isnan(x) & np.isnan(y))
        assert eq.all(), (
            f"columns differ: "
            f"{[num[c] for c in np.unique(np.nonzero(~eq)[1])]}")
        assert any(is_pre_integration(c) for c in num)  # schema sanity
        np.testing.assert_array_equal(merged["is_stable"].values,
                                      ref["is_stable"].values)

        # host-side moment reduction == single-process statistics up to
        # f64 summation order (rows are bitwise identical)
        m = merge_statistics(stats_shards)
        np.testing.assert_allclose(m["count"], stats_single["count"])
        np.testing.assert_allclose(m["sum"], stats_single["sum"],
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(m["sumsq"], stats_single["sumsq"],
                                   rtol=1e-12, atol=1e-12)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessRuntime:
    def test_two_simulated_hosts_match_single_process(self, tmp_path):
        """Launch two real OS processes joined by jax.distributed on a
        localhost coordinator; their psum-reduced statistics and merged
        shards must equal the single-process run."""
        out_dir = str(tmp_path / "dist")
        port = _free_port()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        worker = os.path.join(repo, "tools", "dist_worker.py")
        # Gloo (the CPU collectives transport) must bind the loopback
        # interface in sandboxed environments
        env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="cpu",
                   GLOO_SOCKET_IFNAME="lo", DIST_CAP="32")
        procs = [subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2", out_dir,
             str(N_SYSTEMS), str(N_STEPS)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("distributed workers timed out")
            outs.append(out.decode())
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out}"

        # both shards written; stats JSONs identical (psum-reduced)
        merged = merge_shards(out_dir)
        assert len(merged) == N_SYSTEMS
        with open(os.path.join(out_dir, "stats_00000.json")) as f:
            s0 = json.load(f)
        with open(os.path.join(out_dir, "stats_00001.json")) as f:
            s1 = json.load(f)
        np.testing.assert_allclose(s0["mean"], s1["mean"], rtol=1e-12)
        np.testing.assert_allclose(s0["count"], s1["count"])

        # equal to the single-process statistics
        from nbodysimproject_tpu.generators.pipeline import _PIPE_CFG

        cfg32 = _PIPE_CFG.replace(analysis_n_sub_cap=32, tail_min_n_sub=16,
                                  analysis_group_quantum=8)
        df_single, st = generate_dataset_sharded(
            seed=0, n_systems=N_SYSTEMS, out_dir=str(tmp_path / "one"),
            n_steps=N_STEPS, process_index=0, process_count=1,
            reduce_stats=False, show_progress=False, cfg=cfg32)
        ref = statistics_summary(st)
        np.testing.assert_allclose(s0["count"], ref["count"])
        # per-row values are bitwise-reproducible (canonical dispatch
        # quantum) and the psum rides the collective in f64, so the
        # only slack left is the 2-process reduction order (~1 ulp)
        np.testing.assert_allclose(s0["mean"], ref["mean"], rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(s0["std"], ref["std"], rtol=1e-9,
                                   atol=1e-12)


class TestNSubCapPolicy:
    def test_cap_labels_exact_within_cap_flagged_beyond(self):
        """Label agreement between capped and uncapped substep handling
        on a near-singular cohort (VERDICT round-1 weak item 3): rows
        with n_sub <= cap are label-identical to the uncapped
        (reference-semantics) run; rows beyond carry the
        n_sub_capped flag so consumers can stratify them out."""
        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.analysis.batch import analyze_population
        from nbodysimproject_tpu.core.config import SimConfig
        from nbodysimproject_tpu.generators.ic_generator import (
            generate_population)

        m, q, v, mask = generate_population(
            jax.random.PRNGKey(5), jnp.full((8,), 3, jnp.int32), n_slots=3,
            position_scale=0.05, virial_fraction=1.5, perturbation=0.3,
            softening=1e-4)
        args = [np.asarray(m, np.float64), np.asarray(q, np.float64),
                np.asarray(v, np.float64), np.asarray(mask)]
        kw = dict(G=1.0, softening=1e-4, min_softening=0.0, dt=0.01,
                  n_steps=25, mode="core", show_progress=False,
                  include_ics=False)
        df_cap = analyze_population(*args, SimConfig(analysis_n_sub_cap=256),
                                    **kw)
        df_unc = analyze_population(*args,
                                    SimConfig(analysis_n_sub_cap=10 ** 6),
                                    **kw)
        assert not df_unc["n_sub_capped"].any()
        within = ~df_cap["n_sub_capped"].values
        assert within.any()
        np.testing.assert_array_equal(
            df_cap.loc[within, "is_stable"].values,
            df_unc.loc[within, "is_stable"].values)
        np.testing.assert_array_equal(df_cap["n_sub_capped"].values,
                                      df_cap["n_sub"].values > 256)


class TestEarlyExitPolicy:
    def test_early_exit_labels_match_and_survivors_identical(self):
        """Early-exit probe (cfg.early_exit_probe): aborted rows are
        exactly the super-threshold blow-ups (label forced 0 both
        ways), and surviving rows' columns are bit-identical to the
        non-early-exit run (survivors recompute from scratch)."""
        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.analysis.batch import analyze_population
        from nbodysimproject_tpu.core.config import SimConfig
        from nbodysimproject_tpu.generators.ic_generator import (
            generate_population)

        m, q, v, mask = generate_population(
            jax.random.PRNGKey(5), jnp.full((8,), 3, jnp.int32), n_slots=3,
            position_scale=0.05, virial_fraction=1.5, perturbation=0.3,
            softening=1e-4)
        args = [np.asarray(m, np.float64), np.asarray(q, np.float64),
                np.asarray(v, np.float64), np.asarray(mask)]
        kw = dict(G=1.0, softening=1e-4, min_softening=0.0, dt=0.01,
                  n_steps=40, mode="core", show_progress=False,
                  include_ics=False)
        base_kw = dict(analysis_n_sub_cap=256)
        df_off = analyze_population(*args, SimConfig(**base_kw), **kw)
        df_on = analyze_population(
            *args, SimConfig(early_exit_probe=0.25, early_exit_min_n_sub=1,
                             **base_kw), **kw)

        np.testing.assert_array_equal(df_on["is_stable"].values,
                                      df_off["is_stable"].values)
        # aborted rows are pathological in BOTH runs
        ee = df_on["early_exit"].values
        assert df_on.loc[ee, "pathological_energy"].all() or not ee.any()
        assert df_off.loc[ee, "pathological_energy"].all() or not ee.any()
        # survivors: bit-identical numeric columns
        surv = ~ee
        for col in ("energy_drift", "angular_momentum_drift",
                    "com_drift_mean", "is_stable"):
            np.testing.assert_array_equal(
                df_on.loc[surv, col].values, df_off.loc[surv, col].values,
                err_msg=col)
