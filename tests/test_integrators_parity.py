"""Trajectory parity for the classical integrators vs the reference."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb


THREE_BODY = dict(
    masses=[1.0, 0.5, 0.1],
    positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
)


def _ref_sim(minbody, mode, **kw):
    args = dict(THREE_BODY)
    args.update(kw)
    return minbody.NBodySimulation(integrator_mode=mode, **args)


def _new_sim(mode, **kw):
    args = dict(THREE_BODY)
    args.update(kw)
    return nb.NBodySimulation(integrator_mode=mode, **args)


@pytest.mark.parametrize("mode", ["verlet", "yoshida4"])
def test_trajectory_parity(minbody, mode):
    ref = _ref_sim(minbody, mode, softening=1e-3)
    new = _new_sim(mode, softening=1e-3)
    for _ in range(100):
        ref.step(0.01)
        new.step(0.01)
    np.testing.assert_allclose(new.pos, ref.pos, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(new.vel, ref.vel, rtol=1e-9, atol=1e-11)


def test_verlet_1000_steps_baseline_config(minbody):
    """BASELINE.json config #1: 3-body verlet, 1000 steps @ dt=0.01."""
    ref = _ref_sim(minbody, "verlet", softening=1e-3)
    new = _new_sim("verlet", softening=1e-3)
    for _ in range(1000):
        ref.step(0.01)
    new.run(0.01, 1000)
    np.testing.assert_allclose(new.pos, ref.pos, rtol=1e-6, atol=1e-8)


def _two_body_energy(m, q, v, G=1.0):
    T = 0.5 * np.sum(m * np.sum(v * v, axis=1))
    U = 0.0
    for i in range(len(m)):
        for j in range(i + 1, len(m)):
            U -= G * m[i] * m[j] / np.linalg.norm(q[i] - q[j])
    return T + U


def test_whfast_physics(minbody):
    """Hierarchical system with dominant central mass, zero softening
    (the only regime whfast survives demotion, simulation.py:104-120).

    Bit-level parity with the reference is undefined here: its WHFast
    kick recomputes *full* direct gravity (simulation.py:539 ignores
    the interaction acceleration cached at whfast_scheme.py:85-87), so
    its planets spiral (energy drift ~1e-2 over 10 time units).  We
    assert what the scheme is supposed to do: near-circular orbits stay
    circular and energy is conserved orders of magnitude better than
    the reference's actual behaviour.
    """
    args = dict(
        masses=[1.0, 1e-3, 3e-4],
        positions=[[0.0, 0.0], [1.0, 0.0], [2.5, 0.0]],
        velocities=[[0.0, 0.0], [0.0, 1.0], [0.0, 0.64]],
        softening=0.0,
        min_softening=0.0,
    )
    ref = minbody.NBodySimulation(integrator_mode="whfast", **args)
    new = nb.NBodySimulation(integrator_mode="whfast", **args)
    assert ref.integrator_mode == "whfast"
    assert new.integrator_mode == "whfast"

    E0 = _two_body_energy(new.mass, new.pos, new.vel)
    new.run(0.01, 1000)
    E1 = _two_body_energy(new.mass, new.pos, new.vel)
    # symplectic: bounded oscillatory error at the perturbation scale
    assert abs((E1 - E0) / E0) < 1e-2
    # inner planet still on its circular orbit — the secular-health check
    # (the ICs are ~1e-3 eccentric after COM removal, so allow that much)
    r1 = np.linalg.norm(new.pos[1] - new.pos[0])
    assert abs(r1 - 1.0) < 5e-3

    # reference for contrast: its inner planet spirals outward
    for _ in range(1000):
        ref.step(0.01)
    r1_ref = np.linalg.norm(ref.pos[1] - ref.pos[0])
    assert abs(r1_ref - 1.0) > 3e-2  # documents the reference defect


def test_whfast_demotions(minbody):
    # softening > 0 demotes to verlet (simulation.py:119-120)
    new = _new_sim("whfast", softening=1e-3)
    assert new.integrator_mode == "verlet"
    # low mass dominance (< 0.2) demotes too (simulation.py:108-111)
    new2 = nb.NBodySimulation(
        masses=[1.0] * 6,
        positions=[[np.cos(t), np.sin(t)] for t in np.linspace(0, 5, 6)],
        velocities=[[0.0, 0.0]] * 6,
        integrator_mode="whfast", softening=0.0, min_softening=0.0)
    assert new2.integrator_mode == "verlet"


def test_g_zero_forces_verlet(minbody):
    new = _new_sim("yoshida4", G=0.0)
    assert new.integrator_mode == "verlet"


def test_jacobi_round_trip(minbody, rng):
    m = rng.uniform(0.1, 2.0, 5)
    q = rng.normal(size=(5, 2))
    v = rng.normal(size=(5, 2))
    ref = minbody.NBodySimulation(masses=m, positions=q, velocities=v,
                                  integrator_mode="verlet")
    new = nb.NBodySimulation(masses=m, positions=q, velocities=v,
                             integrator_mode="verlet")
    jp_r, jv_r = ref.to_jacobi()
    jp_n, jv_n = new.to_jacobi()
    np.testing.assert_allclose(jp_n, jp_r, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(jv_n, jv_r, rtol=1e-12, atol=1e-14)
    p_n, v_n = new.from_jacobi(jp_n, jv_n)
    np.testing.assert_allclose(p_n, new.pos, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(v_n, new.vel, rtol=1e-12, atol=1e-13)


def test_momentum_conservation_machine_precision():
    new = _new_sim("verlet", softening=1e-3)
    p0 = (new.mass[:, None] * new.vel).sum(0)
    L0 = (new.mass * (new.pos[:, 0] * new.vel[:, 1]
                      - new.pos[:, 1] * new.vel[:, 0])).sum()
    new.run(0.01, 1000)
    p1 = (new.mass[:, None] * new.vel).sum(0)
    L1 = (new.mass * (new.pos[:, 0] * new.vel[:, 1]
                      - new.pos[:, 1] * new.vel[:, 0])).sum()
    assert np.abs(p1 - p0).max() < 1e-13
    assert abs(L1 - L0) < 1e-12 * max(abs(L0), 1.0)


def test_adaptive_softening_parity(minbody):
    ref = _ref_sim(minbody, "verlet", softening=0.05, adaptive_softening=True)
    new = _new_sim("verlet", softening=0.05, adaptive_softening=True)
    for _ in range(50):
        ref.step(0.01)
        new.step(0.01)
    np.testing.assert_allclose(new.pos, ref.pos, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(new.softening, ref.manager.s, rtol=1e-9)
    np.testing.assert_allclose(new.softening_energy_delta,
                               ref.softening_energy_delta, rtol=1e-6,
                               atol=1e-12)


def test_snapshot_restore_round_trip():
    new = _new_sim("verlet", softening=1e-3)
    new.step(0.01)
    snap = new.snapshot()
    clone = nb.NBodySimulation.restore(snap)
    np.testing.assert_allclose(clone.pos, new.pos, rtol=0, atol=0)
    np.testing.assert_allclose(clone.vel, new.vel, rtol=0, atol=0)
    clone.step(0.01)
    new.step(0.01)
    np.testing.assert_allclose(clone.pos, new.pos, rtol=1e-12)


class TestWHFastAnalyticKick:
    def test_analytic_kick_matches_autodiff(self):
        """wh_interaction_accel (closed-form suffix-sum Kepler gradient)
        equals reverse-mode AD of interaction_potential to rounding."""
        import jax
        import jax.numpy as jnp

        import nbodysimproject_tpu as nb
        from nbodysimproject_tpu.parallel.batch_engine import build_batch
        from nbodysimproject_tpu.integrators import whfast as W

        rng = np.random.default_rng(3)
        for n in (3, 8, 50):
            m = np.sort(rng.uniform(0.01, 1.0, n))[::-1].copy()
            m[0] = 5.0
            q = rng.normal(size=(n, 2)) * 3
            v = rng.normal(size=(n, 2))
            cfg = nb.SimConfig(integrator_mode="whfast")
            st, dy = build_batch(
                jnp.asarray(m)[None], jnp.asarray(q)[None],
                jnp.asarray(v)[None], jnp.ones((1, n), bool), cfg,
                1.0, 0.0, 0.0, 0.01)
            s1 = jax.tree_util.tree_map(lambda x: x[0], st)
            d1 = jax.tree_util.tree_map(lambda x: x[0], dy)
            a_ad = np.asarray(W.wh_interaction_accel_ad(s1, d1))
            a_cl = np.asarray(W.wh_interaction_accel(s1, d1))
            np.testing.assert_allclose(a_cl, a_ad, rtol=1e-11,
                                       atol=1e-13 * np.abs(a_ad).max())
