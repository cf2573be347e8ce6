"""Auxiliary subsystems: probes, checkpointing, accumulator,
name-parity component views, sharding (SURVEY.md section 5)."""

import math

import numpy as np
import pytest

import nbodysimproject_tpu as nb


def _sim(mode="ham_soft"):
    vin = math.sqrt(2.0)
    return nb.NBodySimulation(
        integrator_mode=mode,
        masses=[1.0, 1.0, 0.5],
        positions=[[-0.5, 0], [0.5, 0], [10.0, 0]],
        velocities=[[0, -vin / 2], [0, vin / 2], [0, 0.5]],
        softening=0.05)


class TestSofteningLedger:
    """validate_energy replay self-check (softening_manager.py:376-389;
    VERDICT round-3 item 8: the round-3 shim only checked finiteness)."""

    def _adaptive_sim(self):
        sim = nb.NBodySimulation(
            integrator_mode="verlet", adaptive_softening=True,
            masses=[1.0, 0.5, 0.1],
            positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
            velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
            softening=0.05)
        for _ in range(25):
            sim.step(0.01)
        return sim

    def test_replay_matches_ledger(self, capsys):
        sim = self._adaptive_sim()
        assert len(sim._eps_ledger["entries"]) >= 2
        assert len(sim.manager.history) >= 3
        led = sim._eps_ledger
        total = led["base"] + sum(e[2] for e in led["entries"])
        assert abs(total - sim.softening_energy_delta) <= \
            1e-10 * max(1.0, abs(sim.softening_energy_delta))
        sim.manager.validate_energy()
        assert "energy mismatch" not in capsys.readouterr().out

    def test_corrupted_ledger_is_caught(self, capsys):
        sim = self._adaptive_sim()
        sim.softening_energy_delta += 1e-3  # corrupt the accumulator
        sim.manager.validate_energy()
        assert "energy mismatch" in capsys.readouterr().out

    def test_reset_clears_ring(self):
        sim = self._adaptive_sim()
        sim.manager.update_base_softening(adaptive=False)
        assert sim._eps_ledger["entries"] == []
        assert sim.manager.history == []


class TestProbes:
    def test_probe_accessors(self):
        sim = _sim()
        sim.step(0.01)
        integ = sim._integrator
        pol = integ.report_epsilon_policies()
        assert set(pol) == {"eom_eps_eff", "vkick_eps_eff"}
        es = integ.last_eps_star_probe()
        assert es["eps_star"] > 0 and es["grad_norm_max"] >= 0
        vk = integ._last_vkick_probe()
        assert vk["epsilon_used"] == pytest.approx(sim._epsilon)
        sp = integ.last_spring_probe()
        assert np.isfinite(sp["I_tau"]) and np.isfinite(sp["theta"])
        sched = integ.last_strang_schedule_info()
        assert sched["n_sub"] >= 1
        assert sched["barrier_policy"] in ("soft", "reflection")


class TestCheckpoint:
    def test_npz_round_trip(self, tmp_path):
        import jax.numpy as jnp
        from nbodysimproject_tpu.parallel import build_batch, integrate_batch

        cfg = nb.SimConfig(integrator_mode="verlet")
        m = jnp.asarray([[1.0, 0.5, 0.1]] * 4)
        q = jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]]] * 4)
        v = jnp.asarray([[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]]] * 4)
        mask = jnp.ones((4, 3), bool)
        states, dyns = build_batch(m, q, v, mask, cfg, 1.0, 1e-3, 0.0, 0.01)
        states = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 10, 1)

        path = str(tmp_path / "ckpt")
        nb.save_checkpoint(path, states, dyns, meta={"step": 10})
        s2, d2, meta = nb.load_checkpoint(path)
        assert meta["step"] == 10
        np.testing.assert_array_equal(np.asarray(s2.pos),
                                      np.asarray(states.pos))
        # resume continues identically
        a = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 5, 1)
        b = integrate_batch(s2, d2, cfg, jnp.float64(0.01), 5, 1)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


class TestAccumulator:
    def test_kahan_accumulator(self):
        acc = nb.EnergyAccumulator()
        for _ in range(10000):
            acc.add(0.1)
        assert acc.total() == pytest.approx(1000.0, abs=1e-10)


class TestCompatViews:
    def test_components_exist_and_work(self):
        sim = _sim()
        integ = sim._integrator
        tm = nb.TimestepManager(integ)
        assert tm.determine_substeps(0.01) >= 1
        assert tm.predict_min_separation(0.01) > 0
        hp = nb.HamSoftParams(integ)
        assert hp.k_soft > 0 and hp.mu_soft > 0
        hb = nb.HamSoftBarrier(integ)
        e, p = hb.reflect_if_active(sim._epsilon, sim._pi)
        assert np.isfinite(e)
        hs = nb.HamSoftStepper(integ)
        eps0 = sim._epsilon
        hs.strang_step(0.001)
        assert sim._epsilon != eps0 or sim._pi != 0.0
        assert nb.IntegratorConstants.k_soft == 1e3
        assert nb.IntegratorConstants.nonexistent_attr == 0.0

    def test_simulation_state_builder(self):
        st = nb.SimulationState.build_state(
            masses=[1.0, 2.0], positions=[[0, 0], [1, 0]],
            velocities=[[0, 0], [0, 1]], eps=0.1)
        assert st.pos.shape == (2, 2)


class TestSharding:
    def test_batch_sharded_over_virtual_mesh(self):
        """Integration over an 8-device data mesh produces the same
        result as single-device (the collective-free dp path)."""
        import jax
        import jax.numpy as jnp
        from nbodysimproject_tpu.parallel import (make_mesh, shard_batch,
                                                  build_batch,
                                                  integrate_batch)

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = nb.SimConfig(integrator_mode="verlet")
        B = 16
        key = jax.random.PRNGKey(0)
        q = (jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]])[None]
             + 0.01 * jax.random.normal(key, (B, 3, 2), jnp.float64))
        m = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.1]), (B, 3))
        v = jnp.broadcast_to(
            jnp.asarray([[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]]), (B, 3, 2))
        mask = jnp.ones((B, 3), bool)
        states, dyns = build_batch(m, q, v, mask, cfg, 1.0, 1e-3, 0.0, 0.01)
        ref = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 50, 1)

        mesh = make_mesh(8)
        s_sh = shard_batch(states, mesh)
        d_sh = shard_batch(dyns, mesh)
        out = integrate_batch(s_sh, d_sh, cfg, jnp.float64(0.01), 50, 1)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   rtol=1e-12, atol=1e-14)

    def test_dryrun_multichip(self):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs virtual devices")
        import __graft_entry__ as g

        g.dryrun_multichip(4)
