"""Analysis pipeline + ML end-to-end tests."""

import math
import os

import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.analysis import (StabilityAnalyzer,
                                          BatchStabilityAnalyzer)
from nbodysimproject_tpu.core.config import SimConfig
from nbodysimproject_tpu.utils import set_global_seed


def _triple(sep=10.0, mode="verlet", softening=0.05):
    m, p, v = nb.SpecializedGenerators.generate_hierarchical_triple(
        separation_ratio=sep)
    # recentre the COM *position*: the stability verdict's com_drift
    # criterion is |sum m q| < 1 (diagnostics.py:244-245,
    # stability_analyzer.py:226-231), which otherwise auto-fails any
    # off-origin system — reference behaviour we reproduce faithfully
    p = p - (m[:, None] * p).sum(0) / m.sum()
    return nb.NBodySimulation(masses=m, positions=p, velocities=v,
                              integrator_mode=mode, softening=softening)


class TestStability:
    def test_minimal_mode(self):
        sim = _triple()
        res = StabilityAnalyzer(sim, n_steps=50, dt=0.01,
                                mode="minimal").run_stability_analysis()
        assert set(res.keys()) == {"is_stable", "energy_drift", "mode"}
        assert res["is_stable"] in (0.0, 1.0)

    def test_core_mode_stable_triple(self):
        sim = _triple(sep=20.0)
        res = StabilityAnalyzer(sim, n_steps=200, dt=0.01,
                                mode="core").run_stability_analysis()
        assert res["is_stable"] == 1.0
        assert res["energy_drift"] < 1e-3
        assert res["angular_momentum_drift"] < 1e-6

    def test_full_mode_has_initial_features(self):
        sim = _triple(sep=20.0)
        res = StabilityAnalyzer(sim, n_steps=100, dt=0.01,
                                mode="full").run_stability_analysis()
        assert "initial_total_mass" in res
        assert "MEGNO" in res and np.isfinite(res["MEGNO"])

    def test_analysis_does_not_mutate_sim(self):
        sim = _triple()
        pos0 = sim.pos.copy()
        StabilityAnalyzer(sim, n_steps=20, dt=0.01,
                          mode="core").run_stability_analysis()
        np.testing.assert_array_equal(sim.pos, pos0)

    def test_serialize_to_dict(self):
        sim = _triple()
        an = StabilityAnalyzer(sim, n_steps=10, dt=0.01, mode="minimal")
        res = an.run_stability_analysis()
        row = an.serialize_to_dict(res)
        for key in ("n_bodies", "G", "softening", "mass_0", "x_0", "vy_2",
                    "is_stable"):
            assert key in row
        row2 = an.serialize_to_dict(res, max_bodies=2)
        assert "mass_mean" in row2 and "mass_0" not in row2


class TestBatch:
    def test_batch_matches_single(self):
        sims = [_triple(sep=s) for s in (8.0, 20.0, 40.0)]
        ba = BatchStabilityAnalyzer(n_steps=100, dt=0.01, mode="core")
        df = ba.analyze_batch([s.copy() for s in sims], show_progress=False)
        for i, sim in enumerate(sims):
            single = StabilityAnalyzer(sim, n_steps=100, dt=0.01,
                                       mode="core").run_stability_analysis()
            assert df.loc[i, "is_stable"] == single["is_stable"]
            assert df.loc[i, "energy_drift"] == pytest.approx(
                single["energy_drift"], rel=1e-6, abs=1e-12)

    def test_ragged_body_counts(self):
        m4, p4, v4 = nb.SpecializedGenerators.generate_equal_mass_polygon(4)
        m6, p6, v6 = nb.SpecializedGenerators.generate_equal_mass_polygon(6)
        sims = [
            nb.NBodySimulation(masses=m4, positions=p4, velocities=v4,
                               integrator_mode="verlet", softening=0.05),
            nb.NBodySimulation(masses=m6, positions=p6, velocities=v6,
                               integrator_mode="verlet", softening=0.05),
            _triple(),
        ]
        ba = BatchStabilityAnalyzer(n_steps=50, dt=0.01, mode="core")
        df = ba.analyze_batch(sims, show_progress=False)
        assert len(df) == 3
        assert df["softening_policy"].tolist() == ["static"] * 3
        assert np.isfinite(df["energy_drift"]).all()

    def test_padding_preserves_physics(self):
        """A padded copy of a system must produce the identical
        trajectory (SURVEY.md section 7, hard part #5)."""
        import jax.numpy as jnp
        from nbodysimproject_tpu.parallel import build_batch, integrate_batch

        cfg = nb.SimConfig(integrator_mode="verlet")
        m = jnp.asarray([[1.0, 0.5, 0.1]])
        q = jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]]])
        v = jnp.asarray([[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]]])
        mask3 = jnp.ones((1, 3), bool)
        s3, d3 = build_batch(m, q, v, mask3, cfg, 1.0, 1e-3, 0.0, 0.01)

        mp = jnp.pad(m, ((0, 0), (0, 3)))
        qp = jnp.pad(q, ((0, 0), (0, 3), (0, 0)), constant_values=7.7)
        vp = jnp.pad(v, ((0, 0), (0, 3), (0, 0)), constant_values=-3.3)
        mask6 = jnp.asarray([[True, True, True, False, False, False]])
        s6, d6 = build_batch(mp, qp, vp, mask6, cfg, 1.0, 1e-3, 0.0, 0.01)

        o3 = integrate_batch(s3, d3, cfg, jnp.float64(0.01), 100, 1)
        o6 = integrate_batch(s6, d6, cfg, jnp.float64(0.01), 100, 1)
        np.testing.assert_allclose(np.asarray(o6.pos)[0, :3],
                                   np.asarray(o3.pos)[0], rtol=1e-12,
                                   atol=1e-14)


class TestMLPipeline:
    def test_quick_pipeline_and_training(self, tmp_path):
        set_global_seed(0)
        # build a small labelled dataset from stable + unstable cohorts
        sims = []
        for s in np.linspace(15, 60, 8):
            sims.append(_triple(sep=float(s)))
        gen = nb.InitialConditionGenerator(nb.GeneratorConfig(
            position_scale=0.1, velocity_virial_fraction=1.8,
            velocity_perturbation=0.5, softening=0.01, seed=1))
        for _ in range(8):
            sims.append(gen.create_simulation(3))

        ba = BatchStabilityAnalyzer(n_steps=120, dt=0.01, mode="full")
        df = ba.analyze_batch(sims, show_progress=False)
        assert len(df) == 16
        assert df["is_stable"].nunique() > 1  # both classes present

        csv = tmp_path / "stab.csv"
        feature_cols = [c for c in df.columns
                        if c not in ("simulation_id", "is_stable", "mode",
                                     "softening_policy",
                                     "pathological_energy")]
        nb.StabilityDataset.save(str(csv), df)
        X, y, names = nb.StabilityDataset.load(str(csv))
        assert len(X) == 16 and len(y) == 16

        out = nb.DataUtils.split_and_scale(X, y, test_size=0.25,
                                           val_size=0.25, seed=0)
        X_train = out[0]
        assert X_train is not None
        assert abs(X_train.mean(0)).max() < 1e-8  # scaled

    def test_mlp_trainer_learns_separable(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 400
        X = rng.normal(size=(n, 6))
        y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
        import pandas as pd

        df = pd.DataFrame(X, columns=[f"f{i}" for i in range(6)])
        df["is_stable"] = y
        csv = tmp_path / "sep.csv"
        df.to_csv(csv, index=False)

        trainer = nb.MLPTrainer(str(csv))
        data = trainer.load_and_prepare_data()
        X_train, y_train, X_val, y_val, X_test, y_test = data
        trainer.train(X_train, y_train, X_val, y_val, epochs=60, patience=10)
        trainer.compute_optimal_threshold(X_val, y_val)
        metrics = trainer.evaluate(X_test, y_test)
        assert metrics["auroc"] > 0.95
        assert metrics["accuracy"] > 0.85

    def test_gbdt_trainer(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 300
        X = rng.normal(size=(n, 5))
        y = (X[:, 0] * X[:, 1] > 0).astype(float)
        import pandas as pd

        df = pd.DataFrame(X, columns=[f"f{i}" for i in range(5)])
        df["is_stable"] = y
        csv = tmp_path / "xor.csv"
        df.to_csv(csv, index=False)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            metrics = nb.ml.train_lightgbm.train_gbdt(str(csv), cv=3)
        finally:
            os.chdir(cwd)
        assert metrics["auroc"] > 0.9

    def test_mlp_save_load_round_trip(self, tmp_path):
        """load_model rebuilds an inference-identical trainer from the
        save_model artifacts (threshold, scaler, params, features)."""
        rng = np.random.default_rng(1)
        n = 300
        X = rng.normal(size=(n, 4))
        y = (X[:, 0] - X[:, 2] > 0).astype(float)
        import pandas as pd

        df = pd.DataFrame(X, columns=[f"f{i}" for i in range(4)])
        df["is_stable"] = y
        csv = tmp_path / "rt.csv"
        df.to_csv(csv, index=False)

        trainer = nb.MLPTrainer(str(csv))
        data = trainer.load_and_prepare_data()
        X_train, y_train, X_val, y_val, X_test, y_test = data
        trainer.train(X_train, y_train, X_val, y_val, epochs=30, patience=10)
        trainer.compute_optimal_threshold(X_val, y_val)
        prefix = str(tmp_path / "m_")
        trainer.save_model(prefix=prefix)

        loaded = nb.MLPTrainer.load_model(prefix=prefix)
        assert loaded.optimal_threshold == trainer.optimal_threshold
        np.testing.assert_allclose(loaded.predict_proba(X_test),
                                   trainer.predict_proba(X_test),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(loaded.scaler.mean_, trainer.scaler.mean_)


class TestFacadeSchemaParity:
    def test_facade_batch_emits_pre_cap_n_sub_and_ic_columns(self):
        """The facade batch path's schema columns agree with
        analyze_population semantics: n_sub records the PRE-cap
        schedule demand (n_sub_capped flags cap hits), IC columns and
        metadata are present, and bool columns stay bool."""
        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.analysis.batch import analyze_population

        sims = [_triple(sep=s) for s in (8.0, 20.0)]
        ba = BatchStabilityAnalyzer(n_steps=40, dt=0.01, mode="core")
        df = ba.analyze_batch([s.copy() for s in sims],
                              show_progress=False)
        for col in ("n_sub", "n_sub_capped", "mass_0", "x_0", "vx_0",
                    "n_bodies", "G", "integrator_mode"):
            assert col in df.columns, col
        assert df["n_sub_capped"].dtype == bool
        assert (df["n_sub"] >= 1).all()

        # same systems through the fully-batched path: n_sub demand
        # must agree (both record the pre-cap frozen schedule)
        s0 = sims[0]
        m = np.asarray([b.mass for b in s0.bodies])[None]
        q = np.asarray([[b.x, b.y] for b in s0.bodies])[None]
        v = np.asarray([[b.vx, b.vy] for b in s0.bodies])[None]
        dfp = analyze_population(
            m, q, v, np.ones((1, len(s0.bodies)), bool), s0.cfg,
            G=float(s0.G), softening=float(s0.softening),
            min_softening=0.0, dt=0.01, n_steps=40, mode="core",
            show_progress=False)
        assert int(dfp.loc[0, "n_sub"]) == int(df.loc[0, "n_sub"])


class TestBucketPacking:
    def test_packing_is_row_invariant(self):
        from nbodysimproject_tpu.analysis.batch import analyze_population

        """Cost-aware bucket packing is scheduling-only: frames with
        packing on/off must be bitwise identical (per-lane results are
        bucket-value independent — masked trips are exact identities),
        which is also what keeps the sharded-dataset bitwise contract
        valid when shard-local group sizes change merge decisions."""
        rng = np.random.default_rng(11)
        B, n = 24, 4
        pos = rng.normal(size=(B, n, 2)) * 2.0
        vel = 0.2 * rng.normal(size=(B, n, 2))
        mass = np.abs(rng.normal(size=(B, n))) + 0.4
        mask = np.ones((B, n), bool)
        kw = dict(G=1.0, softening=0.05, min_softening=0.0, dt=0.01,
                  n_steps=50, mode="full", show_progress=False)
        frames = {}
        for packing in (True, False):
            cfg = SimConfig(integrator_mode="ham_soft", slot_bucket=8,
                            analysis_group_quantum=8,
                            analysis_bucket_packing=packing)
            frames[packing] = analyze_population(mass, pos, vel, mask,
                                                 cfg, **kw)
        a, b = frames[True], frames[False]
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f":
                np.testing.assert_array_equal(av, bv, err_msg=c)
            else:
                assert (av == bv).all(), c

    def test_pack_groups_cost_model(self):
        from nbodysimproject_tpu.analysis.batch import _pack_groups

        # two small same-tail buckets -> merged into the larger one
        g = [(1, False, np.arange(5)), (2, False, np.arange(5, 9))]
        packed = _pack_groups(g, quantum=16)
        assert len(packed) == 1
        b, flag, idx = packed[0]
        assert b == 2 and not flag and len(idx) == 9
        # a big lower bucket spanning many chunks stays separate
        g2 = [(1, False, np.arange(64)), (256, False, np.arange(64, 66))]
        packed2 = _pack_groups(g2, quantum=16)
        assert len(packed2) == 2
        # tail flags never merge across
        g3 = [(1, False, np.arange(4)), (2, True, np.arange(4, 8))]
        assert len(_pack_groups(g3, quantum=16)) == 2
