"""d = 3 end-to-end (VERDICT round-2 item 4).

The reference hard-codes d = 2 (minbody/simulation_state.py:29-31);
this build parameterises dimension throughout.  These tests drive the
full 3-D data path: cohort generators -> batched analysis -> dataset
schema round trip, per the BASELINE north star's (batch, N, 3).
"""

import numpy as np
import jax
import jax.numpy as jnp

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.generators.pipeline import diverse_population
from nbodysimproject_tpu.generators.specialized import (
    hierarchical_triple_batch, polygon_batch)
from nbodysimproject_tpu.analysis.batch import analyze_population


def test_diverse_population_3d_shapes_and_content():
    m, q, v, mask, soft, types = diverse_population(
        jax.random.PRNGKey(0), 40, n_slots=8, dtype=jnp.float64, dim=3)
    assert q.shape == (40, 8, 3) and v.shape == (40, 8, 3)
    assert np.isfinite(np.asarray(q)).all()
    assert np.isfinite(np.asarray(v)).all()
    # the random cohort is genuinely 3-D
    idx_rand = [i for i, t in enumerate(types) if t == "random"]
    qz = np.asarray(q)[idx_rand, :, 2]
    assert np.abs(qz).max() > 1e-3
    # inclined hierarchical triples put momentum out of plane
    idx_h = [i for i, t in enumerate(types) if t == "hierarchical"]
    vz = np.asarray(v)[idx_h, :, 2]
    assert np.abs(vz).max() > 1e-3
    # COM momentum still projected out exactly where the builder does
    # so (hierarchical adds post-projection velocity noise by design,
    # matching the reference mixture)
    idx_p = [i for i, t in enumerate(types) if t != "hierarchical"]
    p = np.asarray(m)[..., None] * np.asarray(v)
    assert np.abs(p.sum(1)[idx_p]).max() < 1e-10


def test_dim2_stream_bit_identical():
    """dim=2 draws must not change when the 3-D path was added (the
    committed round-2 datasets are reproducible from these keys)."""
    a = diverse_population(jax.random.PRNGKey(7), 20, n_slots=8,
                           dtype=jnp.float32, dim=2)
    b = diverse_population(jax.random.PRNGKey(7), 20, n_slots=8,
                           dtype=jnp.float32)
    for x, y in zip(a[:5], b[:5]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_hierarchical_inclination_geometry():
    """inclination=0 reduces to the planar triple embedded in z=0; the
    outer orbital plane tilts with i."""
    r1 = jnp.asarray([0.5, 0.5])
    r2 = jnp.asarray([0.3, 0.3])
    sep = jnp.asarray([10.0, 10.0])
    inc = jnp.asarray([0.0, np.pi / 2])
    m, q, v, mask = hierarchical_triple_batch(r1, r2, sep,
                                              inclination=inc)
    q = np.asarray(q)
    v = np.asarray(v)
    assert q.shape[-1] == 3
    # i=0: all z components vanish
    assert np.abs(q[0, :, 2]).max() < 1e-14
    assert np.abs(v[0, :, 2]).max() < 1e-14
    # i=pi/2: outer body's velocity is fully out of plane (up to the
    # COM projection share)
    assert abs(v[1, 2, 2]) > 0.1
    assert abs(v[1, 2, 1]) < abs(v[1, 2, 2]) * 1e-10 + 0.2


def test_polygon_tilt_preserves_ring():
    m, q, v, mask = polygon_batch(jnp.asarray([5, 5]), jnp.asarray([1.0, 1.0]),
                                  jnp.asarray([0.5, 0.5]),
                                  tilt=jnp.asarray([0.0, 0.7]))
    q = np.asarray(q)
    assert q.shape[-1] == 3
    r = np.linalg.norm(q, axis=-1)
    msk = np.asarray(mask)
    assert np.allclose(r[msk], 1.0, atol=1e-12)
    assert np.abs(q[1, msk[1], 2]).max() > 0.1


def test_analyze_population_3d_schema_roundtrip(tmp_path):
    """Full-mode 3-D analysis produces a finite frame with z/vz IC
    columns that round-trips through the dataset format."""
    from nbodysimproject_tpu.ml.dataset import StabilityDataset

    B = 24
    m, q, v, mask, soft, types = diverse_population(
        jax.random.PRNGKey(3), B, n_slots=8, dtype=jnp.float64, dim=3)
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=32,
                       tail_min_n_sub=16, slot_bucket=8)
    df = analyze_population(np.asarray(m), np.asarray(q), np.asarray(v),
                            np.asarray(mask), cfg, G=1.0,
                            softening=np.asarray(soft), dt=0.01,
                            n_steps=40, mode="full", show_progress=False)
    df["system_type"] = types
    for i in range(8):
        assert f"z_{i}" in df.columns and f"vz_{i}" in df.columns
    # non-finite drift is a legitimate blow-up outcome; it must carry
    # the pathological flag and the forced-unstable label
    drift = df["energy_drift"].to_numpy(float)
    patho = df["pathological_energy"].to_numpy(bool)
    assert np.isfinite(drift[~patho]).all()
    assert (df["is_stable"].to_numpy(float)[patho] == 0.0).all()
    assert df["is_stable"].isin([0.0, 1.0]).all()
    # 3-D angular momentum drift is the vector-magnitude diagnostic
    assert np.isfinite(
        df["angular_momentum_drift"].to_numpy(float)[~patho]).all()

    path = str(tmp_path / "d3.csv.gz")
    StabilityDataset.save(path, df)
    X, y, feats = StabilityDataset.load(path)
    assert any(f.startswith("z_") for f in feats)
    assert X.shape[0] == B
