"""ham_soft acceptance tests (SURVEY.md section 4: proofs-PDF invariants).

The reference ships no test suite; these implement its in-package
validation mechanisms as real tests, with assertion levels set by what
the dynamics actually guarantees (several of the reference's own
print-and-continue checks are vacuous — e.g. its pi-equilibrium check
fails for its own integrator by 10 orders of magnitude).

Configs:
* THREE_BODY — the chaotic BASELINE config; both the reference and this
  implementation eventually blow it up under the default soft-barrier
  policy (reference NaNs at step ~350, dt = 0.01), so it is used only
  for short-horizon checks.
* TRIPLE — a quiet hierarchical triple for conservation checks.
"""

import math

import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.diagnostics import Diagnostics, validate_ham_soft


THREE_BODY = dict(
    masses=[1.0, 0.5, 0.1],
    positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
)

_VIN = math.sqrt(2.0)
TRIPLE = dict(
    masses=[1.0, 1.0, 0.5],
    positions=[[-0.5, 0.0], [0.5, 0.0], [10.0, 0.0]],
    velocities=[[0.0, -_VIN / 2], [0.0, _VIN / 2],
                [0.0, math.sqrt(2.5 / 10.0)]],
)


def _new(base=THREE_BODY, **kw):
    args = dict(base)
    args.update(kw)
    return nb.NBodySimulation(integrator_mode="ham_soft", **args)


def _ref(minbody, base=THREE_BODY, **kw):
    args = dict(base)
    args.update(kw)
    return minbody.NBodySimulation(integrator_mode="ham_soft", **args)


class TestCalibration:
    def test_eps_model_calibration_parity(self, minbody):
        ref = _ref(minbody, softening=0.05)
        new = _new(softening=0.05)
        # alpha_run = 0.3 * median(h_i), eps floor = 0.25 * median(h_i)
        # (hamsoft_eps_model.py:645-729)
        assert ref._integrator._eps_model._alpha_run == pytest.approx(
            float(new._dyn.alpha_run), rel=1e-5)
        assert ref._min_softening == pytest.approx(new._min_softening, rel=1e-5)
        assert ref._epsilon == pytest.approx(new._epsilon, rel=1e-5)

    def test_mu_and_schedule_parity(self, minbody):
        ref = _ref(minbody, softening=0.05)
        new = _new(softening=0.05)
        assert ref._integrator.k_soft == pytest.approx(float(new._dyn.k_soft))
        assert ref._integrator.mu_soft == pytest.approx(
            float(new._dyn.mu_soft), rel=1e-6)
        assert ref._integrator._frozen_n_sub == int(new._dyn.n_sub)
        # NOTE: the reference's ``h_sub_ref`` property reports the
        # *classical* TimestepManager schedule (overwritten at HSI:140),
        # not the frozen production h_piece; n_sub parity pins the
        # frozen schedule.

    def test_extended_hamiltonian_parity_at_init(self, minbody):
        ref = _ref(minbody, base=TRIPLE, softening=0.05)
        new = _new(base=TRIPLE, softening=0.05)
        H_ref = minbody.Diagnostics(ref).compute_extended_hamiltonian()
        H_new = Diagnostics(new).compute_extended_hamiltonian()
        assert H_ref == pytest.approx(H_new, rel=1e-10)

    def test_eps_star_parity(self, minbody):
        ref = _ref(minbody, softening=0.05)
        new = _new(softening=0.05)
        es_ref = ref._integrator._eps_target(q=ref.pos)
        es_new = new._integrator._eps_target(q=new.pos)
        assert es_ref == pytest.approx(es_new, rel=1e-5)

    def test_eps_star_grad_vs_fd(self):
        """In the non-degenerate regime (kernels overlapping, h_i off
        the clamps), the autodiff gradient equals central differences of
        eps* — the quantity the reference approximates by FD
        (hamsoft_eps_model.py:137-181)."""
        from nbodysimproject_tpu.ops import eps_model as em

        q = np.array([[0.0, 0.0], [0.25, 0.05], [0.1, 0.3]])
        m = np.array([1.0, 0.5, 0.3])
        kw = dict(h0=0.2, alpha=0.1, eps_min=1e-6, eps_max=100.0)
        es0, grad = em.eps_star_and_grad(q, m, **kw)
        h = 1e-6
        fd = np.zeros_like(q)
        for i in range(q.shape[0]):
            for a in range(2):
                qp = q.copy(); qp[i, a] += h
                qm = q.copy(); qm[i, a] -= h
                ep = em.eps_target_production(qp, m, **kw)
                emn = em.eps_target_production(qm, m, **kw)
                fd[i, a] = (float(ep) - float(emn)) / (2 * h)
        np.testing.assert_allclose(np.asarray(grad), fd, rtol=2e-4, atol=1e-8)

    def test_degenerate_fallback_matches_reference(self, minbody):
        """When the clamp saturates (sparse system), the reference's FD
        degenerates and it substitutes the Omega-corrected SPH gradient
        (hamsoft_eps_model.py:203-228); in eps_grad_mode="reference" we
        must produce the same object."""
        ref = _ref(minbody, softening=0.05)
        new = _new(config=nb.SimConfig(eps_grad_mode="reference"),
                   softening=0.05)
        es_r, g_r = ref._integrator.eps_star_and_grad(ref.pos)
        es_n, g_n = new._integrator.eps_star_and_grad(new.pos)
        assert es_r == pytest.approx(es_n, rel=1e-6)
        np.testing.assert_allclose(np.asarray(g_n), g_r, rtol=1e-5,
                                   atol=1e-12)

    def test_grad_rows_sum_to_zero(self):
        new = _new(softening=0.05)
        _es, grad = new._integrator.eps_star_and_grad(new.pos)
        assert np.abs(grad.sum(axis=0)).max() < 1e-12 * max(
            np.abs(grad).max(), 1e-30)


class TestConservation:
    def test_momentum_conservation(self):
        """Exact linear-momentum conservation (proofs Prop. 2): forces
        and the J * grad-eps* impulse are pairwise antisymmetric."""
        new = _new(base=TRIPLE, softening=0.05)
        p0 = (new.mass[:, None] * new.vel).sum(0)
        new.run(0.01, 500)
        p1 = (new.mass[:, None] * new.vel).sum(0)
        assert np.abs(p1 - p0).max() < 1e-12

    def test_angular_momentum_conservation(self):
        new = _new(base=TRIPLE, softening=0.05)
        d = Diagnostics(new)
        L0 = d.angular_momentum()
        new.run(0.01, 500)
        L1 = d.angular_momentum()
        assert abs(L1 - L0) < 1e-10 * max(abs(L0), 1.0)

    def test_h_squared_drift_scaling(self):
        """|dH_ext| ~ h^2 (resultsNbody.pdf 4.1: slope 1.98 +/- 0.04).

        Measured with the quartic wall disabled: the wall's effective
        stiffness varies with penetration depth, which makes the
        raw-scaling exponent config-dependent (the reference's own
        drift at the default settings is dominated by wall kicks)."""
        cfg = nb.SimConfig(disable_barrier=True)
        drifts = []
        hs = [0.001, 0.002, 0.004]
        for h in hs:
            new = _new(base=TRIPLE, config=cfg, softening=0.05)
            d = Diagnostics(new)
            H0 = d.compute_extended_hamiltonian()
            new.run(h, int(round(0.256 / h)))
            H1 = d.compute_extended_hamiltonian()
            drifts.append(abs(H1 - H0))
        drifts = np.array(drifts)
        assert np.all(drifts > 0)
        slope = np.polyfit(np.log(hs), np.log(drifts), 1)[0]
        assert 1.9 < slope < 2.1, f"slope={slope}, drifts={drifts}"

    def test_energy_drift_small(self):
        new = _new(base=TRIPLE, softening=0.05)
        d = Diagnostics(new)
        H0 = d.compute_extended_hamiltonian()
        new.run(0.001, 1000)
        H1 = d.compute_extended_hamiltonian()
        assert abs((H1 - H0) / H0) < 1e-4

    def test_beats_reference_drift(self, minbody):
        """At matched config/horizon our drift is well below the
        reference's (its J-cap + FD-gradient inconsistencies leak
        energy: 24% vs our <6% on this config over 5 time units)."""
        ref = _ref(minbody, base=TRIPLE, softening=0.05)
        new = _new(base=TRIPLE, softening=0.05)
        H0r = minbody.Diagnostics(ref).compute_extended_hamiltonian()
        dn = Diagnostics(new)
        H0n = dn.compute_extended_hamiltonian()
        for _ in range(300):
            ref.step(0.01)
        new.run(0.01, 300)
        H1r = minbody.Diagnostics(ref).compute_extended_hamiltonian()
        H1n = dn.compute_extended_hamiltonian()
        drift_ref = abs((H1r - H0r) / H0r)
        drift_new = abs((H1n - H0n) / H0n)
        assert drift_new < max(drift_ref, 1e-3)


class TestValidation:
    def test_validate_ham_soft_canonical_eom(self):
        """Finite-difference dpi/dt and deps/dt against the analytic
        canonical EOM (hamsoft_validation.py:49-99).  The one-step
        difference quotient carries O(dt) truncation, so consistency is
        checked at that level (the reference's 1e-10 bound is another
        print-only check its own integrator does not meet)."""
        new = _new(base=TRIPLE, softening=0.05)
        rep = validate_ham_soft(new, n_steps=64, dt=1e-3)
        assert rep["deps_rel_err"] < 5e-2
        assert rep["dpi_rel_err"] < 5e-2

    def test_equilibrium_oscillation_bounded(self):
        """With G = 0 and eps = eps*, (eps, pi) is a pure harmonic
        oscillator: |pi| stays within its initial amplitude and H_ext
        is conserved (the meaningful version of
        hamsoft_validation.py:102-116, whose literal 1e-12 pi-freeze
        bound the reference itself misses by ten orders)."""
        new = _new(base=TRIPLE, softening=0.05)
        new.G = 0.0
        new._dyn = new._dyn.replace(G=new._as_dtype(0.0))
        es = new._integrator._eps_target()
        new._epsilon = float(es)
        new._pi = 0.123456789
        d = Diagnostics(new)
        H0 = d.compute_extended_hamiltonian()
        pi_max = 0.0
        for _ in range(64):
            new.step(1e-3)
            pi_max = max(pi_max, abs(new._pi))
        H1 = d.compute_extended_hamiltonian()
        assert pi_max <= 0.123456789 * (1 + 1e-6)
        assert abs(H1 - H0) <= 1e-8 * max(abs(H0), 1.0)


class TestTrajectoryVsReference:
    def test_short_trajectory_close(self, minbody):
        """The reference uses an FD gradient of the same eps*
        (hamsoft_eps_model.py:137-181); ours is analytic, so
        trajectories agree to FD-truncation accuracy, not bitwise.
        Requires eps_grad_mode="reference" (bug-compatible fallback
        gradient)."""
        ref = _ref(minbody, softening=0.05)
        new = _new(config=nb.SimConfig(eps_grad_mode="reference"),
                   softening=0.05)
        for _ in range(20):
            ref.step(0.01)
            new.step(0.01)
        np.testing.assert_allclose(new.pos, ref.pos, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(new._epsilon, ref._epsilon, rtol=1e-4)
        np.testing.assert_allclose(new._pi, ref._pi, rtol=1e-3, atol=1e-8)


class TestPolicies:
    def test_reflection_policy(self):
        cfg = nb.SimConfig(use_soft_barrier=False)
        new = _new(base=TRIPLE, config=cfg, softening=0.05)
        assert new._integrator.barrier_policy == "reflection"
        new.run(0.01, 200)
        assert new._min_softening - 1e-12 <= new._epsilon
        assert new._epsilon <= new._max_softening + 1e-12

    def test_soft_policy_default(self):
        new = _new(softening=0.05)
        assert new._integrator.barrier_policy == "soft"

    def test_fixed_eps_star(self):
        cfg = nb.SimConfig(fixed_eps_star=True, eps_star_value=0.07)
        new = _new(config=cfg, softening=0.05)
        assert new._epsilon == pytest.approx(0.07)
        es = new._integrator._eps_target()
        assert es == pytest.approx(0.07)

    def test_legacy_eps_star_mode(self):
        cfg = nb.SimConfig(use_legacy_eps_star=True)
        new = _new(config=cfg, softening=0.05)
        es = new._integrator._eps_target()
        q = new.pos
        expect = float(nb.eps_target(q, lam=0.3))
        assert es == pytest.approx(expect, rel=1e-10)

    def test_freeze_s_subsystem(self):
        cfg = nb.SimConfig(freeze_s_subsystem=True)
        new = _new(base=TRIPLE, config=cfg, softening=0.05)
        eps0, pi0 = new._epsilon, new._pi
        new.run(0.01, 50)
        assert new._epsilon == pytest.approx(eps0)
        assert new._pi == pytest.approx(pi0)


class TestSolveHiGradImpl:
    """IFT custom_vjp vs unrolled reverse-mode for the h_i fixed point
    (VERDICT round-1 item 3a).  Measured here and load-bearing for the
    design decision: few-body systems do NOT converge in the 8
    reference iterations (contraction ~0.98-1.0, h drifting to the
    cap), so the truncated map is the model and 'unrolled' stays the
    default; 'ift' agrees only where the solve converges."""

    def test_ift_matches_unrolled_when_converged(self):
        """Dense 16-body cluster: the solve converges by ~iteration 15
        with contraction ~0.56; at 8 iterations the two gradients agree
        to ~1%."""
        from functools import partial

        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.ops import eps_model as em

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(0, 0.3, (16, 2)))
        m = jnp.ones(16)

        def eps_fn(q, impl):
            h = em.solve_hi(q, m, h0=0.3, eps_floor=1e-6, eps_cap=100.0,
                            grad_impl=impl)
            return em.softmin(h, 0.1)

        g_ift = jax.grad(partial(eps_fn, impl="ift"))(q)
        g_unr = jax.grad(partial(eps_fn, impl="unrolled"))(q)
        denom = float(jnp.max(jnp.abs(g_unr)))
        assert float(jnp.max(jnp.abs(g_ift - g_unr))) / denom < 5e-2
        cos = float(jnp.sum(g_ift * g_unr)
                    / (jnp.linalg.norm(g_ift) * jnp.linalg.norm(g_unr)))
        assert cos > 0.999

    def test_unrolled_is_default_and_matches_fd(self):
        """The default gradient is the truncated map's exact gradient
        (= the reference's central-difference object)."""
        from nbodysimproject_tpu.ops import eps_model as em

        q = np.array([[0.0, 0.0], [0.25, 0.05], [0.1, 0.3]])
        m = np.array([1.0, 0.5, 0.3])
        kw = dict(h0=0.2, alpha=0.1, eps_min=1e-6, eps_max=100.0)
        _es, grad = em.eps_star_and_grad(q, m, **kw)
        h = 1e-6
        fd = np.zeros_like(q)
        for i in range(q.shape[0]):
            for a in range(2):
                qp = q.copy(); qp[i, a] += h
                qm = q.copy(); qm[i, a] -= h
                fd[i, a] = (float(em.eps_target_production(qp, m, **kw))
                            - float(em.eps_target_production(qm, m, **kw))
                            ) / (2 * h)
        np.testing.assert_allclose(np.asarray(grad), fd, rtol=2e-4,
                                   atol=1e-8)

    def test_ift_zero_gradient_on_saturated_clamp(self):
        from functools import partial

        import jax
        import jax.numpy as jnp

        from nbodysimproject_tpu.ops import eps_model as em

        q = jnp.asarray(np.random.default_rng(0).normal(0, 1, (5, 2)))
        m = jnp.ones(5)

        def eps_fn(q):
            h = em.solve_hi(q, m, h0=0.05, eps_floor=1e-3, eps_cap=0.04,
                            grad_impl="ift")
            return em.softmin(h, 0.1)

        g = jax.grad(eps_fn)(q)
        assert float(jnp.abs(g).max()) == 0.0
