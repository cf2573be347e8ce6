"""Flow probes — the TPU-native replacement for the reference's
"stash dicts on the integrator" tracing (SURVEY.md section 5).

The reference records ``_last_s_info`` / ``_last_vkick`` /
``_last_s_trig`` / ``_last_strang_schedule_info`` as side effects of
each sub-flow (hamsoft_flows.py:740-754, hamsoft_stepper.py:656-662,
HSI:1105-1118).  Side effects don't exist under jit; instead these
probes recompute the identical quantities from a state on demand —
pure functions, jit/vmap friendly, usable inside scans as auxiliary
outputs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import SimState
from ..integrators import hamsoft as hs
from ..ops.forces import dV_d_epsilon


def spring_probe(state: SimState, dyn, cfg, h):
    """The quantities spring_half would log for a sub-flow of size h/2:
    I_tau, J, J_applied, eps_star, omega, theta, barrier kicks, k_eff
    (hamsoft_flows.py:740-754)."""
    dt_f = 0.5 * h
    eps_star, grad = hs.eps_star_and_grad(state, dyn, cfg)
    mu = jnp.where(jnp.isfinite(dyn.mu_soft) & (dyn.mu_soft != 0.0),
                   dyn.mu_soft, 1.0)
    k_s = jnp.where(jnp.isfinite(dyn.k_soft), dyn.k_soft, 0.0)
    has = (k_s > 0.0) & (mu > 0.0)
    omega = jnp.sqrt(jnp.where(has, k_s / mu, 0.0))
    theta = omega * dt_f
    sin_t, cos_t = hs.sin_cos_stable(theta)

    if hs._barrier_on(cfg):
        k1 = 0.5 * dt_f * hs._bar_force(cfg, dyn, state.eps)
    else:
        k1 = jnp.zeros_like(state.eps)
    Delta0 = state.eps - eps_star
    pi_in = state.pi + k1
    om = jnp.where(has & (omega != 0.0), omega, 1.0)
    denom = jnp.where(has, mu * om * om, 1.0)
    I_tau = jnp.where(has & (omega != 0.0),
                      (Delta0 / om) * sin_t + (pi_in / denom) * (1 - cos_t),
                      0.0)
    J = k_s * I_tau
    p = state.momenta()
    p_scale = jnp.maximum(hs._row_max_norm(p, state.mask), 1e-12)
    dp_inf = hs._row_max_norm(J * grad, state.mask)
    thr = cfg.j_max_cap * p_scale
    J_applied = J * jnp.where(dp_inf > thr, thr / jnp.maximum(dp_inf, 1e-300),
                              1.0)
    if hs._barrier_on(cfg):
        eps_rot = eps_star + Delta0 * cos_t + (pi_in / (mu * om)) * sin_t
        k2 = 0.5 * dt_f * hs._bar_force(cfg, dyn, eps_rot)
    else:
        k2 = jnp.zeros_like(state.eps)
    return dict(I_tau=I_tau, J=J, J_applied=J_applied, grad_used=grad,
                eps_star=eps_star, omega=omega, theta=theta,
                sin=sin_t, cos=cos_t, one_minus_cos=1.0 - cos_t,
                barrier_kick1=k1, barrier_kick2=k2, k_eff=k_s)


def vkick_probe(state: SimState, dyn, cfg, h):
    """What v_half_kick would log: eps used, dV/deps terms
    (hamsoft_stepper.py:656-662)."""
    h_half = 0.5 * h
    dU = dV_d_epsilon(state.pos, state.mass, state.eps, dyn.G,
                      mask=state.mask)
    if hs._barrier_on(cfg):
        dUbar = -hs._bar_force(cfg, dyn, state.eps)
    else:
        dUbar = jnp.zeros_like(dU)
    return dict(epsilon_used=state.eps, dVgrav_deps=dU, dSbar_deps=dUbar,
                dV_total_deps=dU + dUbar, dt_half=h_half)


def schedule_probe(state: SimState, dyn, cfg, dt):
    """The frozen-schedule record (HSI:1105-1118)."""
    n_sub = jnp.maximum(dyn.n_sub, 1)
    h_piece = jnp.abs(dt) / n_sub.astype(state.pos.dtype)
    theta_sub_half = 0.5 * dyn.omega_spr0 * h_piece
    return dict(dt=jnp.abs(dt), n_sub=n_sub, h_piece=h_piece,
                omega_eff=dyn.omega_spr0, theta_sub_half=theta_sub_half,
                k_soft=dyn.k_soft, mu_soft=dyn.mu_soft,
                h_sub_ref=dyn.h_sub_ref)
