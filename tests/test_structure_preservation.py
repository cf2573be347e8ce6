"""Symplecticity-defect and time-reversibility invariants.

The last two published BASELINE rows without a test (VERDICT round-3
missing items 1):

* symplecticity defect (resultsNbody.pdf section 4.3, BASELINE.md:17):
  for the one-substep map Phi_h with Jacobian J (computed by AD in
  float64), ||J^T w J - w||_F < 1e-11 * sqrt(N) * max(1, ||J||_F)
  with w the canonical symplectic form — asserted per integrator mode
  on its natural phase space ((q, p) classical; (q, p, eps, pi)
  extended for ham_soft);
* time-reversibility (SURVEY.md section 4): R o Phi_h o R o Phi_h = id
  to f64 roundoff, with R the momentum flip (velocities; + pi for
  ham_soft).

The J-cap case documents the known NON-symplectic projection: with a
tiny cfg.j_max_cap the spring impulse is rescaled by a state-dependent
factor (hamsoft_flows.py:692-738 parity), which is not a canonical
map — the test asserts the defect is DETECTED above the conservative
bound rather than hiding it (reference defect class: the reference
applies the same cap and still claims the 4.3 bound unconditionally).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.facade.simulation import NBodySimulation
from nbodysimproject_tpu.integrators.step import substep_fn, begin_step

MASSES3 = np.asarray([1.0, 0.5, 0.1])
POS3 = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
VEL3 = np.asarray([[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]])

# Tight triple for the ham_soft cases: at the standard separations the
# SPH solve saturates at the eps cap and grad eps* == 0, which would
# test only the decoupled (trivially symplectic) regime.  At 0.15x the
# eps*(q) coupling is live (|grad| ~ 0.6) — the spring impulse's
# back-reaction on p is actually exercised.
POS3_TIGHT = POS3 * 0.15

# planetary hierarchy for whfast (Jacobi order, zero softening)
MASSES_W = np.asarray([1.0, 1e-3, 1e-3])
POS_W = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]])
VEL_W = np.asarray([[0.0, 0.0], [0.0, 1.0], [-1.0 / np.sqrt(2.0), 0.0]])

H = 1e-3


def _sim(mode, **cfg_kw):
    if mode == "whfast":
        m, q, v, soft = MASSES_W, POS_W, VEL_W, 0.0
        cfg_kw.setdefault("whfast_kepler_iters", 8)  # no while_loop in AD
    else:
        m, q, v, soft = MASSES3, POS3, VEL3, 0.05
    if mode == "ham_soft":
        m, q, v, soft = MASSES3, POS3_TIGHT, VEL3, 0.05
        # the fused (eps*, grad) custom_vmap wrapper blocks reverse-mode
        # linearization; the XLA evaluation is bitwise-identical
        # (core/config.py::fused_eps_grad), so the Jacobian is of the
        # same map
        cfg_kw.setdefault("fused_eps_grad", False)
        # The J-cap is inactive in typical few-body states but ACTIVE at
        # this deliberately tight one (k_soft * I_tau * |grad| exceeds
        # 0.02 max|p|) — and it is a non-canonical projection (see
        # test_symplecticity_defect_jcap_documented).  Lift it out of
        # the way for the invariant cases so they certify the exact
        # Hamiltonian flow the proofs PDF claims.
        cfg_kw.setdefault("j_max_cap", 1e6)
    cfg = nb.SimConfig(integrator_mode=mode, fast_float32=False, **cfg_kw)
    sim = NBodySimulation(masses=m, positions=q, velocities=v, G=1.0,
                          softening=soft, config=cfg)
    state = begin_step(sim._state, cfg)
    return state, sim._dyn, cfg


def _omega(k):
    """Canonical symplectic form for k dof pairs ordered (q..., p...)."""
    w = np.zeros((2 * k, 2 * k))
    w[:k, k:] = np.eye(k)
    w[k:, :k] = -np.eye(k)
    return jnp.asarray(w)


def _phase_map(state, dyn, cfg, extended):
    """The substep as a flat canonical-coordinate map z -> z'."""
    n, d = state.pos.shape
    nd = n * d
    m = state.mass
    body = substep_fn(cfg)

    def f(z):
        q = z[:nd].reshape(n, d)
        p = z[nd:2 * nd].reshape(n, d)
        st = state.replace(pos=q, vel=p / m[:, None])
        if extended:
            st = st.replace(eps=z[2 * nd], pi=z[2 * nd + 1])
        st = body(st, dyn, cfg, jnp.asarray(H, z.dtype))
        out = [st.pos.ravel(), (st.vel * m[:, None]).ravel()]
        if extended:
            out.append(jnp.stack([st.eps, st.pi]))
        return jnp.concatenate(out)

    z0 = [state.pos.ravel(), (state.vel * m[:, None]).ravel()]
    if extended:
        z0.append(jnp.stack([state.eps, state.pi]))
    return f, jnp.concatenate(z0)


def _defect(mode, **cfg_kw):
    extended = mode == "ham_soft"
    state, dyn, cfg = _sim(mode, **cfg_kw)
    f, z0 = _phase_map(state, dyn, cfg, extended)
    assert z0.dtype == jnp.float64
    # jacrev: ham_soft's eps* gradient path nests reverse-mode AD,
    # which composes with an outer reverse but not with jacfwd
    J = jax.jacrev(f)(z0)
    n, d = state.pos.shape
    k = n * d + (1 if extended else 0)
    # reorder (q..., p..., eps, pi) -> (q..., eps, p..., pi)
    if extended:
        perm = list(range(n * d)) + [2 * n * d] \
            + list(range(n * d, 2 * n * d)) + [2 * n * d + 1]
        J = J[np.ix_(perm, perm)]
    w = _omega(k)
    defect = jnp.linalg.norm(J.T @ w @ J - w)
    bound = 1e-11 * np.sqrt(n) * max(1.0, float(jnp.linalg.norm(J)))
    return float(defect), bound


@pytest.mark.parametrize("mode,kw", [
    ("verlet", {}),
    ("yoshida4", {}),
    ("whfast", {}),
    ("ham_soft", {}),                              # soft barrier, exact grad
    ("ham_soft", {"use_soft_barrier": False}),     # reflection folds
])
def test_symplecticity_defect(mode, kw):
    """BASELINE.md:17 (resultsNbody.pdf 4.3), per integrator mode."""
    defect, bound = _defect(mode, **kw)
    assert defect < bound, f"{mode} {kw}: defect {defect:.3e} >= {bound:.3e}"


def test_symplecticity_defect_jcap_documented():
    """The J-cap is a non-canonical projection: at the tight state the
    DEFAULT cap (0.02) engages and the defect measures O(1) — five
    orders above the 4.3 bound (the invariant genuinely breaks there; a
    test that hid this would be lying).  The reference applies the same
    cap (hamsoft_flows.py:692-738) and still claims the bound
    unconditionally — this test records the honest boundary of the
    claim: symplectic exactly, WHEN the safety cap is not engaged."""
    defect_capped, bound = _defect("ham_soft", j_max_cap=0.02)
    assert defect_capped > 1e3 * bound, (
        f"expected the active J-cap to break symplecticity: "
        f"{defect_capped:.3e} vs bound {bound:.3e}")


@pytest.mark.parametrize("mode,kw", [
    ("verlet", {}),
    ("yoshida4", {}),
    ("whfast", {}),
    ("ham_soft", {}),
    ("ham_soft", {"use_soft_barrier": False}),
])
def test_time_reversibility(mode, kw):
    """R o Phi_h o R o Phi_h = id to f64 roundoff (SURVEY.md section 4);
    R flips velocities (and pi on the extended phase space)."""
    extended = mode == "ham_soft"
    state, dyn, cfg = _sim(mode, **kw)
    body = substep_fn(cfg)

    def R(st):
        st = st.replace(vel=-st.vel)
        return st.replace(pi=-st.pi) if extended else st

    st1 = R(body(state, dyn, cfg, jnp.asarray(H, jnp.float64)))
    st2 = R(body(st1, dyn, cfg, jnp.asarray(H, jnp.float64)))

    scale_q = float(jnp.max(jnp.abs(state.pos)))
    scale_v = float(jnp.max(jnp.abs(state.vel))) + 1.0
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(state.pos),
                               atol=1e-12 * scale_q, rtol=0)
    np.testing.assert_allclose(np.asarray(st2.vel), np.asarray(state.vel),
                               atol=1e-12 * scale_v, rtol=0)
    if extended:
        np.testing.assert_allclose(float(st2.eps), float(state.eps),
                                   atol=1e-13, rtol=1e-11)
        np.testing.assert_allclose(float(st2.pi), float(state.pi),
                                   atol=1e-12, rtol=1e-10)
