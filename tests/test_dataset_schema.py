"""Dataset schema parity (VERDICT round-1 item 2): per-body IC columns
+ sim metadata in the batched frame, feature_names header, scaler
columns, loader round trip, pre/post feature-group split."""

import jax
import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.analysis.batch import (analyze_population,
                                                serialize_ic_columns)
from nbodysimproject_tpu.core.config import SimConfig
from nbodysimproject_tpu.generators.pipeline import diverse_population
from nbodysimproject_tpu.ml.dataset import StabilityDataset


def _small_frame(n=12, n_steps=60, mode="full"):
    mass, pos, vel, mask, soft, types = diverse_population(
        jax.random.PRNGKey(3), n, n_slots=8)
    cfg = SimConfig(slot_bucket=8)
    df = analyze_population(np.asarray(mass, np.float64),
                            np.asarray(pos, np.float64),
                            np.asarray(vel, np.float64),
                            np.asarray(mask), cfg, G=1.0,
                            softening=np.asarray(soft, np.float64),
                            min_softening=0.0, dt=0.01, n_steps=n_steps,
                            mode=mode, show_progress=False)
    df["system_type"] = types
    return df, (mass, pos, vel, mask, soft)


class TestSerializedSchema:
    def test_frame_has_reference_schema_columns(self):
        df, _ = _small_frame()
        # metadata (stability_analyzer.py:521-533)
        for c in ("n_bodies", "G", "softening", "min_softening",
                  "adaptive", "integrator_mode"):
            assert c in df.columns, c
        # per-body ICs for every slot (x/y 2-D layout)
        for i in range(8):
            for p in ("mass", "x", "y", "vx", "vy"):
                assert f"{p}_{i}" in df.columns, f"{p}_{i}"
        # ~90-column frame in full mode (reference: 91)
        assert len(df.columns) >= 88

    def test_ic_columns_match_inputs_and_mask(self):
        df, (mass, pos, vel, mask, _) = _small_frame(n=8, n_steps=30)
        mass, pos, mask = (np.asarray(mass), np.asarray(pos),
                           np.asarray(mask))
        for i in range(8):
            col = df[f"mass_{i}"].values
            valid = mask[:, i]
            np.testing.assert_allclose(col[valid], mass[valid, i],
                                       rtol=1e-6)
            assert np.isnan(col[~valid]).all()
            np.testing.assert_allclose(df[f"x_{i}"].values[valid],
                                       pos[valid, i, 0], rtol=1e-6)

    def test_n_bodies_column(self):
        df, (_, _, _, mask, _) = _small_frame(n=8, n_steps=30)
        np.testing.assert_array_equal(df["n_bodies"].values,
                                      np.asarray(mask).sum(1))

    def test_serialize_ic_columns_3d(self):
        rng = np.random.default_rng(0)
        m = rng.random((4, 5))
        q = rng.normal(size=(4, 5, 3))
        v = rng.normal(size=(4, 5, 3))
        msk = np.ones((4, 5), bool)
        cols = serialize_ic_columns(m, q, v, msk, G=1.0, softening=0.05,
                                    min_softening=0.0,
                                    cfg=SimConfig(slot_bucket=8))
        assert "z_2" in cols and "vz_4" in cols


class TestSaveLoadRoundTrip:
    def test_round_trip_with_scaler_and_gzip(self, tmp_path):
        df, _ = _small_frame(n=8, n_steps=30)
        path = str(tmp_path / "ds.csv.gz")
        StabilityDataset.save(path, df, include_scaler=True)

        X, y, names = StabilityDataset.load(path)
        assert len(X) == len(df)
        assert not any(c.startswith("scaler_") for c in names)
        meta = StabilityDataset.get_metadata(path)
        assert meta["feature_names"] == names
        assert meta["scaler_mean"] is not None
        assert len(meta["scaler_mean"]) == len(names)

        # the persisted values survive the round trip
        import pandas as pd

        back = pd.read_csv(path, comment="#")
        np.testing.assert_allclose(back["n_bodies"].values,
                                   df["n_bodies"].values)

    def test_feature_group_split(self, tmp_path):
        df, _ = _small_frame(n=8, n_steps=30)
        path = str(tmp_path / "ds.csv")
        StabilityDataset.save(path, df)
        X_all, _, names_all = StabilityDataset.load(path)
        X_pre, _, names_pre = StabilityDataset.load(path, features="pre")
        X_post, _, names_post = StabilityDataset.load(path, features="post")

        assert set(names_pre) | set(names_post) == set(names_all)
        assert not set(names_pre) & set(names_post)
        # no label-defining quantity in the pre-integration group
        leaky = ("energy_drift", "angular_momentum_drift", "com_drift_mean",
                 "MEGNO", "lyapunov_time", "megno_slope_med",
                 "tidal_trace_mean", "pathological_energy")
        for c in leaky:
            assert c not in names_pre, c
        # ICs and initial_* ARE in the pre group
        assert "mass_0" in names_pre and "n_bodies" in names_pre
        assert any(c.startswith("initial_") for c in names_pre)
        assert X_pre.shape[1] + X_post.shape[1] == X_all.shape[1]
