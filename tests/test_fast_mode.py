"""float32 fast mode (cfg.fast_float32, simulation.py:80-83,:159-162)
and dimension parameterisation (the TPU build's d != 2 extension)."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb


SYS = dict(
    masses=[1.0, 0.5, 0.1],
    positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
)


def test_fast_float32_runs_and_tracks_f64():
    cfg = nb.SimConfig(fast_float32=True, integrator_mode="verlet")
    s32 = nb.NBodySimulation(config=cfg, softening=1e-3, **SYS)
    assert s32._state.pos.dtype == np.float32
    s64 = nb.NBodySimulation(integrator_mode="verlet", softening=1e-3, **SYS)
    s32.run(0.01, 100)
    s64.run(0.01, 100)
    np.testing.assert_allclose(s32.pos, s64.pos, rtol=1e-3, atol=1e-4)


def test_three_dimensional_systems():
    """BASELINE.json's north star asks for (batch, N, 3); the reference
    hard-codes d = 2 (SURVEY.md geometry note)."""
    cfg = nb.SimConfig(dim=3, integrator_mode="verlet")
    sim = nb.NBodySimulation(
        config=cfg,
        masses=[1.0, 0.5, 0.1],
        positions=[[0, 0, 0], [1, 0, 0], [0, 2, 0.5]],
        velocities=[[0, 0, 0], [0, 1, 0.1], [-0.5, 0, 0]],
        softening=1e-3)
    p0 = (sim.mass[:, None] * sim.vel).sum(0)
    sim.run(0.01, 200)
    p1 = (sim.mass[:, None] * sim.vel).sum(0)
    assert sim.pos.shape == (3, 3)
    assert np.abs(p1 - p0).max() < 1e-13
    assert np.all(np.isfinite(sim.pos))


def test_three_dimensional_hamsoft():
    cfg = nb.SimConfig(dim=3, integrator_mode="ham_soft")
    sim = nb.NBodySimulation(
        config=cfg,
        masses=[1.0, 1.0, 0.5],
        positions=[[-0.5, 0, 0], [0.5, 0, 0], [10, 0, 1.0]],
        velocities=[[0, -0.7, 0], [0, 0.7, 0], [0, 0.5, 0]],
        softening=0.05)
    from nbodysimproject_tpu.diagnostics import Diagnostics

    d = Diagnostics(sim)
    H0 = d.compute_extended_hamiltonian()
    p0 = (sim.mass[:, None] * sim.vel).sum(0)
    sim.run(0.001, 200)
    H1 = d.compute_extended_hamiltonian()
    p1 = (sim.mass[:, None] * sim.vel).sum(0)
    assert np.abs(p1 - p0).max() < 1e-12
    assert abs((H1 - H0) / H0) < 1e-3


def test_3d_angular_momentum_vector_and_metrics():
    """d=3 diagnostics (VERDICT round-1 weak item 7): vector L
    conservation and 3-D step metrics through a full analysis."""
    import jax

    import importlib

    from nbodysimproject_tpu.analysis.stability import StabilityAnalyzer

    E = importlib.import_module("nbodysimproject_tpu.diagnostics.energy")

    cfg = nb.SimConfig(dim=3, integrator_mode="verlet")
    sim = nb.NBodySimulation(
        config=cfg, softening=0.05,
        masses=[1.0, 0.5, 0.1],
        positions=[[0, 0, 0.1], [1, 0, -0.1], [0, 2, 0.3]],
        velocities=[[0, 0, 0.02], [0, 1, 0.0], [-0.5, 0, -0.05]])
    L0 = np.asarray(E.angular_momentum_vector(sim._state))
    assert L0.shape == (3,)
    sim.run(0.01, 200)
    L1 = np.asarray(E.angular_momentum_vector(sim._state))
    np.testing.assert_allclose(L1, L0, rtol=1e-10, atol=1e-12)

    res = StabilityAnalyzer(sim, n_steps=40, dt=0.01,
                            mode="core").run_stability_analysis()
    assert np.isfinite(res["angular_momentum_drift"])
    assert res["angular_momentum_drift"] < 1e-6
    assert np.isfinite(res["cos_theta_mean"])
    assert res["cos_theta_mean"] == pytest.approx(1.0, abs=1e-6)


def test_2d_vector_form_consistent_with_scalar():
    import importlib

    E = importlib.import_module("nbodysimproject_tpu.diagnostics.energy")

    sim = nb.NBodySimulation(
        integrator_mode="verlet", softening=0.05,
        masses=[1.0, 0.5], positions=[[0, 0], [1, 0]],
        velocities=[[0, 0], [0, 1]])
    v = np.asarray(E.angular_momentum_vector(sim._state))
    assert v.shape == (1,)
    assert v[0] == pytest.approx(float(E.angular_momentum_z(sim._state)))
