"""Diagnostics parity: energies, step metrics, features, tangent map,
MEGNO."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.diagnostics import Diagnostics, TangentMap


SYS = dict(
    masses=[1.0, 0.5, 0.1],
    positions=[[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
    velocities=[[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]],
)


def _pair(minbody, mode="verlet", **kw):
    args = dict(SYS)
    args.update(kw)
    ref = minbody.NBodySimulation(integrator_mode=mode, **args)
    new = nb.NBodySimulation(integrator_mode=mode, **args)
    return ref, new


class TestEnergies:
    def test_kinetic_potential(self, minbody):
        ref, new = _pair(minbody, softening=0.05)
        dr = minbody.Diagnostics(ref)
        dn = Diagnostics(new)
        assert dr.kinetic_energy() == pytest.approx(dn.kinetic_energy(),
                                                    rel=1e-12)
        assert dr.potential_energy() == pytest.approx(dn.potential_energy(),
                                                      rel=1e-12)

    def test_energy_and_breakdown_hamsoft(self, minbody):
        ref, new = _pair(minbody, mode="ham_soft", softening=0.05)
        dr = minbody.Diagnostics(ref)
        dn = Diagnostics(new)
        assert dr.energy() == pytest.approx(dn.energy(), rel=1e-8)
        br = dr.energy_breakdown()
        bn = dn.energy_breakdown()
        for k in ("T", "V", "K_eps", "PE_spring", "H"):
            assert br[k] == pytest.approx(bn[k], rel=1e-8, abs=1e-12), k

    def test_momenta_and_com(self, minbody):
        ref, new = _pair(minbody, softening=0.05)
        dr = minbody.Diagnostics(ref)
        dn = Diagnostics(new)
        assert dr.angular_momentum() == pytest.approx(dn.angular_momentum(),
                                                      rel=1e-12)
        np.testing.assert_allclose(dr.linear_momentum(), dn.linear_momentum(),
                                   atol=1e-14)
        (xr, vr) = dr.center_of_mass()
        (xn, vn) = dn.center_of_mass()
        np.testing.assert_allclose(xr, xn, atol=1e-14)
        np.testing.assert_allclose(vr, vn, atol=1e-14)

    def test_step_metrics_parity(self, minbody):
        ref, new = _pair(minbody, mode="ham_soft", softening=0.05)
        mr = minbody.Diagnostics(ref).step_metrics()
        mn = Diagnostics(new).step_metrics()
        for k in ("com_drift", "J_eps", "L_tot", "var_L", "theta_eps",
                  "T", "V", "K_eps", "PE_spring", "H"):
            assert mr[k] == pytest.approx(mn[k], rel=1e-8, abs=1e-12), k


class TestTangent:
    def test_variational_accel_parity(self, minbody, rng):
        ref, new = _pair(minbody, softening=0.05)
        delta_r = rng.normal(size=(3, 2))
        ar = minbody.TangentMap(ref).variational_accel(delta_r)
        an = TangentMap(new).variational_accel(delta_r)
        np.testing.assert_allclose(an, ar, rtol=1e-10, atol=1e-13)

    def test_variational_is_force_jacobian(self, rng):
        """delta_a must equal the directional derivative of the
        acceleration field — checked against finite differences."""
        new = nb.NBodySimulation(integrator_mode="verlet", softening=0.1,
                                 **{k: v for k, v in SYS.items()})
        delta_r = rng.normal(size=(3, 2)) * 1e-6
        a0 = new.accelerations()
        pos0 = new.pos.copy()
        new.pos = pos0 + delta_r
        a1 = new.accelerations()
        new.pos = pos0
        fd = a1 - a0
        an = TangentMap(new).variational_accel(delta_r)
        np.testing.assert_allclose(an, fd, rtol=1e-4, atol=1e-12)


class TestFeatures:
    def test_dynamical_features_parity(self, minbody):
        ref, new = _pair(minbody, mode="ham_soft", softening=0.05)
        fr = minbody.DynamicalFeatures(ref).extract_all()
        fn = nb.DynamicalFeatures(new).extract_all()
        assert set(fr.keys()) == set(fn.keys())
        for k, v in fr.items():
            assert v == pytest.approx(fn[k], rel=1e-6, abs=1e-10), k


class TestMegno:
    def test_megno_regular_orbit_near_2(self):
        """A wide hierarchical (regular) system has MEGNO ~ 2; chaotic
        systems diverge (evolution_features.py:34-66 semantics)."""
        import math

        vin = math.sqrt(2.0)
        new = nb.NBodySimulation(
            integrator_mode="verlet",
            masses=[1.0, 1.0, 0.5],
            positions=[[-0.5, 0], [0.5, 0], [10.0, 0]],
            velocities=[[0, -vin / 2], [0, vin / 2], [0, math.sqrt(0.25)]],
            softening=0.01)
        ev = nb.EvolutionFeatures(new, n_samples=200, dt=0.01)
        megno, lyap = ev.compute_megno(200, 0.01)
        assert np.isfinite(megno)
        assert 0.0 < megno < 4.0
        assert lyap > 0

    def test_extract_evolution_features_keys(self):
        new = nb.NBodySimulation(integrator_mode="verlet", softening=0.05,
                                 **{k: v for k, v in SYS.items()})
        ev = nb.EvolutionFeatures(new, n_samples=10, dt=0.01)
        out = ev.extract_evolution_features()
        assert set(out.keys()) == {"MEGNO", "lyapunov_time",
                                   "current_total_energy"}


class TestTidalTraceAndSlope:
    def test_tidal_trace_matches_autodiff_hessian(self):
        """tr_hessian = trace of the Hessian of the softened potential
        (real implementation; the reference's metric is a vestigial
        constant 0.0, minbody/integrator.py:48)."""
        import jax

        from nbodysimproject_tpu.diagnostics.metrics import tidal_trace
        from nbodysimproject_tpu.ops.potential import softened_potential

        new = nb.NBodySimulation(integrator_mode="ham_soft", softening=0.05,
                                 **{k: v for k, v in SYS.items()})
        st, dyn, cfg = new._state, new._dyn, new.cfg
        V = lambda q: softened_potential(q, st.mass, dyn.G, st.eps,
                                         mask=st.mask)
        H = jax.hessian(V)(st.pos)
        n, d = st.pos.shape
        tr = sum(float(H[i, a, i, a]) for i in range(n) for a in range(d))
        assert float(tidal_trace(st, dyn, cfg)) == pytest.approx(tr, rel=1e-10)

    def test_step_metrics_tr_hessian_finite(self):
        new = nb.NBodySimulation(integrator_mode="verlet", softening=0.05,
                                 **{k: v for k, v in SYS.items()})
        met = Diagnostics(new).step_metrics()
        assert np.isfinite(met["tr_hessian"])

    def test_analysis_fills_tidal_and_slope_columns(self):
        """Full-mode analysis produces real (non-NaN) tidal_trace_* and
        megno_slope_med columns (VERDICT round-1 item 4)."""
        from nbodysimproject_tpu.analysis.stability import StabilityAnalyzer

        new = nb.NBodySimulation(integrator_mode="ham_soft", softening=0.05,
                                 **{k: v for k, v in SYS.items()})
        res = StabilityAnalyzer(new, n_steps=40, dt=0.01,
                                mode="full").run_stability_analysis()
        for k in ("tidal_trace_mean", "tidal_trace_max", "megno_slope_med"):
            assert np.isfinite(res[k]), k
