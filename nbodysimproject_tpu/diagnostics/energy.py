"""Energy diagnostics: physical and extended Hamiltonians.

Parity: ``minbody/diagnostics.py`` — ``energy`` (:81),
``energy_breakdown`` (:158), high-precision
``compute_extended_hamiltonian`` (:457); ``minbody/hamsoft_energy.py``
— ``extended_hamiltonian`` (:48).

TPU-first: the reference's float128 + Kahan path (diagnostics.py:461)
becomes float64 + pairwise/Kahan-compensated summation
(SURVEY.md section 7, "No float128 on TPU").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import SimState
from ..ops.geometry import pair_mask
from ..ops.barrier import barrier_energy
from ..utils.summation import kahan_sum
from ..integrators import hamsoft as hs


def kinetic_energy(state: SimState):
    """T = 1/2 sum m |v|^2 (diagnostics.py:63-67)."""
    v2 = jnp.sum(state.vel * state.vel, axis=1)
    t = state.mass * v2
    if state.mask is not None:
        t = jnp.where(state.mask, t, 0.0)
    return 0.5 * jnp.sum(t)


def _pair_potential(state: SimState, G, eps):
    q = state.pos
    m = state.mass
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1) + eps * eps
    pm = pair_mask(n, state.mask)
    inv_r = jnp.where(pm, 1.0 / jnp.sqrt(jnp.where(pm, r2, 1.0)), 0.0)
    mprod = m[:, None] * m[None, :]
    return -0.5 * G * jnp.sum(mprod * inv_r)


def potential_energy(state: SimState, dyn):
    """Classical potential at eps^2 = step_s2 (diagnostics.py:69-78)."""
    eps = jnp.sqrt(jnp.maximum(state.step_s2, 0.0))
    return _pair_potential(state, dyn.G, eps)


def spring_terms(state: SimState, dyn, cfg, eps_star):
    """K_eps = pi^2/(2 mu), S_spring = k/2 (eps - eps*)^2."""
    mu = jnp.where(dyn.mu_soft != 0.0, dyn.mu_soft, 1.0)
    K_eps = 0.5 * state.pi * state.pi / mu
    d = state.eps - eps_star
    S_spring = 0.5 * dyn.k_soft * d * d
    return K_eps, S_spring


def barrier_term(state: SimState, dyn, cfg):
    """S_bar — soft policy only (hamsoft_energy.py:131-160)."""
    if hs.policy_is_soft(cfg) and cfg.k_wall > 0 and cfg.barrier_exponent >= 2:
        return barrier_energy(state.eps, dyn.min_softening, dyn.max_softening,
                              k_wall=dyn.k_wall, n=cfg.barrier_exponent)
    return jnp.zeros_like(state.eps)


def energy(state: SimState, dyn, cfg):
    """H_ext evaluated with eps = state.eps (diagnostics.py:81-155);
    the 'physical-facing' extended energy."""
    T = kinetic_energy(state)
    V = _pair_potential(state, dyn.G, state.eps)
    S_bar = barrier_term(state, dyn, cfg)
    eps_star = hs.eps_target(state, dyn, cfg)
    K_eps, S_spring = spring_terms(state, dyn, cfg, eps_star)
    return T + V + S_bar + K_eps + S_spring


def energy_breakdown(state: SimState, dyn, cfg):
    """dict(T, V, K_eps, PE_spring, H) (diagnostics.py:158-235).

    Classical modes evaluate V at step_s2; ham_soft at eps^2.
    """
    T = kinetic_energy(state)
    if cfg.integrator_mode == "ham_soft":
        s2 = state.eps * state.eps
    else:
        s2 = state.step_s2
    V = _pair_potential(state, dyn.G, jnp.sqrt(jnp.maximum(s2, 0.0)))
    eps_star = hs.eps_target(state, dyn, cfg)
    K_eps, S_spring = spring_terms(state, dyn, cfg, eps_star)
    S_spring = jnp.where(dyn.k_soft > 0.0, S_spring, 0.0)
    return dict(T=T, V=V, K_eps=K_eps, PE_spring=S_spring,
                H=T + V + K_eps + S_spring)


def extended_hamiltonian(state: SimState, dyn, cfg, eps_star=None):
    """High-accuracy H_ext (diagnostics.py:457-549): compensated pair
    sums in float64 replace the reference's float128 Kahan.

    The ``kepler_split`` tail mode conserves a DIFFERENT Hamiltonian
    (point-mass dominant pair, frozen eps/pi — see
    integrators/kepler_split.py), so its analysis measures that one.
    """
    if cfg.integrator_mode == "kepler_split":
        from ..integrators.kepler_split import split_hamiltonian

        return split_hamiltonian(state, dyn, cfg)
    m = state.mass
    v2 = jnp.sum(state.vel * state.vel, axis=1)
    tk = state.mass * v2
    if state.mask is not None:
        tk = jnp.where(state.mask, tk, 0.0)
    T = 0.5 * kahan_sum(tk)

    q = state.pos
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1) + state.eps * state.eps
    pm = pair_mask(n, state.mask)
    iu = jnp.triu_indices(n, 1)
    pair_ok = pm[iu]
    r2u = jnp.where(pair_ok, r2[iu], 1.0)
    inv_r = jnp.where(pair_ok, 1.0 / jnp.sqrt(r2u), 0.0)
    mprod = (m[:, None] * m[None, :])[iu]
    V = -dyn.G * kahan_sum(mprod * inv_r)

    if eps_star is None:
        eps_star = hs.eps_target(state, dyn, cfg)
    K_eps, S_spring = spring_terms(state, dyn, cfg, eps_star)
    S_bar = barrier_term(state, dyn, cfg)
    return T + V + K_eps + S_spring + S_bar


def extended_hamiltonian_of_sim(sim) -> float:
    """Facade adapter (Integrator.compute_extended_hamiltonian,
    integrator.py:144-147)."""
    return float(extended_hamiltonian(sim._state, sim._dyn, sim.cfg))


def angular_momentum_z(state: SimState):
    """L_z = sum m (x vy - y vx) (diagnostics.py:553-557); for d = 3
    returns the z component."""
    q = state.pos
    v = state.vel
    lz = state.mass * (q[:, 0] * v[:, 1] - q[:, 1] * v[:, 0])
    if state.mask is not None:
        lz = jnp.where(state.mask, lz, 0.0)
    return jnp.sum(lz)


def angular_momentum_vector(state: SimState):
    """Total angular momentum as a vector: (3,) L = sum m q x v for
    d = 3; for d = 2 the scalar L_z promoted to (1,).  The BASELINE
    north star states (batch, N, 3) — this is the d-agnostic
    diagnostic the 2-D reference never needed."""
    q = state.pos
    v = state.vel
    if q.shape[-1] == 2:
        return angular_momentum_z(state)[None]
    L_i = state.mass[:, None] * jnp.cross(q, v)
    if state.mask is not None:
        L_i = jnp.where(state.mask[:, None], L_i, 0.0)
    return jnp.sum(L_i, axis=0)


def linear_momentum(state: SimState):
    """(d,) total momentum (diagnostics.py:559-565)."""
    p = state.mass[:, None] * state.vel
    if state.mask is not None:
        p = jnp.where(state.mask[:, None], p, 0.0)
    return jnp.sum(p, axis=0)


def center_of_mass(state: SimState):
    """((d,), (d,)) COM position and velocity (diagnostics.py:567-583)."""
    m = state.mass
    if state.mask is not None:
        m = jnp.where(state.mask, m, 0.0)
    M = jnp.sum(m)
    Ms = jnp.where(M > 0.0, M, 1.0)
    x = jnp.sum(m[:, None] * state.pos, axis=0) / Ms
    v = jnp.sum(m[:, None] * state.vel, axis=0) / Ms
    zero = jnp.zeros_like(x)
    return (jnp.where(M > 0.0, x, zero), jnp.where(M > 0.0, v, zero))
