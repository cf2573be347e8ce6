"""Facade behaviour coverage: mode switching, bounds, body views,
snapshot structure, step/run equivalence."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb


SYS = dict(
    masses=[1.0, 0.5, 0.1],
    positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
)


def test_step_equals_run():
    a = nb.NBodySimulation(integrator_mode="verlet", softening=1e-3, **SYS)
    b = nb.NBodySimulation(integrator_mode="verlet", softening=1e-3, **SYS)
    for _ in range(30):
        a.step(0.01)
    b.run(0.01, 30)
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.vel, b.vel)


def test_set_integrator_mode_switch():
    sim = nb.NBodySimulation(integrator_mode="verlet", softening=0.05, **SYS)
    sim.step(0.01)
    sim.set_integrator_mode("ham_soft")
    assert sim.integrator_mode == "ham_soft"
    assert sim.cfg.integrator_mode == "ham_soft"
    sim.step(0.01)
    assert np.all(np.isfinite(sim.pos))
    sim.set_integrator_mode("nonsense")  # ignored (simulation.py:284-285)
    assert sim.integrator_mode == "ham_soft"


def test_set_softening_bounds_clamp_and_pi_flip():
    sim = nb.NBodySimulation(integrator_mode="ham_soft", softening=0.05, **SYS)
    sim._pi = 0.25
    eps0 = sim._epsilon
    sim.set_softening_bounds(eps0 + 0.1, eps0 + 0.5)
    assert sim._epsilon == pytest.approx(eps0 + 0.1)
    assert sim._pi == pytest.approx(-0.25)  # reset_pi_on_clamp flips sign
    assert sim._min_softening == pytest.approx(eps0 + 0.1)
    assert sim.max_softening == pytest.approx(eps0 + 0.5)


def test_body_views_mutation():
    sim = nb.NBodySimulation(integrator_mode="verlet", softening=1e-3, **SYS)
    bodies = sim.bodies
    assert len(bodies) == 3
    assert bodies[1].x == pytest.approx(1.0)
    bodies[1].x = 1.5
    assert sim.pos[1, 0] == pytest.approx(1.5)
    bodies[0].vx = 0.3
    assert sim.vel[0, 0] == pytest.approx(0.3)


def test_bodies_constructor():
    bodies = [nb.Body(1.0, 0.0, 0.0), nb.Body(0.5, 1.0, 0.0, 0.0, 1.0)]
    sim = nb.NBodySimulation(bodies=bodies, integrator_mode="verlet",
                             softening=1e-3)
    assert sim.n_bodies == 2
    np.testing.assert_allclose(sim.mass, [1.0, 0.5])


def test_bodies_constructor_3d():
    """d=3 extension: Body.z/vz feed a dim=3 simulation; BodyView
    exposes them (the reference is strictly 2-D)."""
    bodies = [nb.Body(1.0, 0.0, 0.0, z=0.5, vz=-0.1),
              nb.Body(0.5, 1.0, 0.0, 0.0, 1.0)]
    sim = nb.NBodySimulation(config=nb.SimConfig(dim=3),
                             bodies=bodies, integrator_mode="verlet",
                             softening=1e-3, skip_cm_recenter=True,
                             skip_init_corrector=True)
    assert sim.n_bodies == 2
    np.testing.assert_allclose(sim.pos[0], [0.0, 0.0, 0.5])
    view = sim.bodies[0]
    assert view.z == pytest.approx(0.5)
    assert view.vz == pytest.approx(-0.1)
    view.z = 0.7
    assert sim.pos[0, 2] == pytest.approx(0.7)
    # 2-D sims read z as 0.0
    sim2 = nb.NBodySimulation(bodies=[nb.Body(1.0, 0.0, 0.0),
                                      nb.Body(1.0, 1.0, 0.0)],
                              integrator_mode="verlet")
    assert sim2.bodies[0].z == 0.0


def test_snapshot_key_structure():
    """Snapshot carries the reference's key aliases
    (simulation.py:373-394)."""
    sim = nb.NBodySimulation(integrator_mode="ham_soft", softening=0.05, **SYS)
    snap = sim.snapshot()
    for key in ("masses", "positions", "velocities", "softening",
                "integrator_state", "softening_mgr_state", "sim_state",
                "cfg", "sim", "integrator", "softening_mgr"):
        assert key in snap, key
    assert "_epsilon" in snap["sim_state"]
    assert "k_soft" in snap["integrator_state"]


def test_copy_independent():
    sim = nb.NBodySimulation(integrator_mode="verlet", softening=1e-3, **SYS)
    clone = sim.copy()
    clone.step(0.01)
    assert np.abs(clone.pos - sim.pos).max() > 0


def test_energy_guard_smoke(capsys):
    cfg = nb.SimConfig(enable_runtime_guard=True, invariant_check_interval=2,
                       integrator_mode="verlet")
    sim = nb.NBodySimulation(config=cfg, softening=1e-3, **SYS)
    d = nb.Diagnostics(sim)
    for _ in range(6):
        sim.step(0.01)
        d.energy_guard(0.01)  # establishes H0 then checks; prints on breach


def test_g_zero_hamsoft_stays_hamsoft():
    sim = nb.NBodySimulation(integrator_mode="ham_soft", G=0.0,
                             softening=0.05, **SYS)
    assert sim.integrator_mode == "ham_soft"  # simulation.py:101-102
    sim.step(0.01)
    assert np.all(np.isfinite(sim.pos))


def test_accelerations_match_force_kernel():
    sim = nb.NBodySimulation(integrator_mode="verlet", softening=0.05, **SYS,
                             skip_init_corrector=True)
    acc = sim.accelerations()
    F = np.asarray(nb.gravitational_force(sim.pos, sim.mass, eps=0.05, G=1.0))
    np.testing.assert_allclose(acc, F / sim.mass[:, None], rtol=1e-12)
