"""Timestep / spring calibration — pure functions of arrays.

Parity targets:
* ``TimestepManager.init_substep_schedule`` (timestep_manager.py:139-253)
  and ``determine_substeps`` (:39-136),
* ``HamiltonianSofteningIntegrator._calibrate_mu_from_timescales``
  (hamiltonian_softening_integrator.py:251-296),
  ``_calibrate_mu_from_pi_budget`` (:145-246),
  ``_freeze_production_schedule`` (:986-1119),
  ``_estimate_pi_budget_h`` (:1125-1221),
* k_soft autoset 8 G M_tot^2 / eps_min^3 (:116-118).

All return traced scalars so they vmap across heterogeneous batches;
``n_sub`` outputs are int32 scalars.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import pair_mask
from ..ops.forces import dV_d_epsilon
from ..ops.barrier import barrier_force

CHI_GRAV = 0.9   # chi in timestep_manager.py:48 / HSI:1052
C_OMEGA = 8.0    # omega_spr = 8 / tau_grav (HSI:283)
C_KSOFT = 8.0    # k_soft autoset coefficient (HSI:117)


def tau_grav_min(q, m, G, eps=0.0, mask=None, *, softened: bool):
    """Minimum two-body gravitational timescale.

    softened=True:  min over pairs 1/omega_ij with omega_ij^2
      = G (m_i + m_j) / (r^2 + eps^2)^{3/2}  (HSI:997-1018, :262-276).
    softened=False: min over pairs sqrt(r^3 / (G (m_i+m_j)))
      (timestep_manager.py:150-165) — identical formula at eps = 0.
    Returns +inf when no valid pair or G == 0.
    """
    q = jnp.asarray(q)
    m = jnp.asarray(m)
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    if softened:
        r2 = r2 + eps * eps
    pm = pair_mask(n, mask)
    denom = G * (m[:, None] + m[None, :])
    valid = pm & (denom > 0.0) & (r2 > 0.0)
    r2s = jnp.where(valid, r2, 1.0)
    r3 = r2s * jnp.sqrt(r2s)
    tau = jnp.where(valid, jnp.sqrt(r3 / jnp.where(valid, denom, 1.0)), jnp.inf)
    return jnp.min(tau)


def init_substep_schedule(q, m, vel, G, *, eps_cur, pi, k_soft, mu_soft,
                          min_softening, max_softening, eps_star, grad_norm,
                          theta_cap, dt_user, split_n_max: int, mask=None):
    """h_sub_ref from four timescales (timestep_manager.py:139-253).

    h_sub = min(0.9 tau_grav, tau_spr, tau_eps, tau_imp), fallback
    dt_user (or 1.0), then capped so ceil(dt_user/h_sub) <= split_n_max.
    """
    dt_user = jnp.abs(dt_user)
    tau_grav = tau_grav_min(q, m, G, mask=mask, softened=False)

    omega = jnp.sqrt(jnp.maximum(k_soft, 0.0) / jnp.maximum(mu_soft, 1e-300))
    tcap = jnp.where(theta_cap > 0.0, theta_cap, 0.25)
    tau_spr = jnp.where((k_soft > 0.0) & (mu_soft > 0.0) & (omega > 0.0),
                        tcap / jnp.maximum(omega, 1e-300), jnp.inf)

    eps_safe = 0.1 * jnp.maximum(max_softening - min_softening, 0.0)
    v_eps = jnp.abs(pi / jnp.where(mu_soft != 0.0, mu_soft, 1.0))
    tau_eps = jnp.where((pi != 0.0) & (mu_soft != 0.0) & (eps_safe > 0.0),
                        CHI_GRAV * eps_safe / jnp.maximum(v_eps, 1e-300), jnp.inf)

    theta_imp = 0.1  # hard-coded in timestep_manager.py:199
    eps_p = 1e-12
    p = m[:, None] * vel
    pn = jnp.sqrt(jnp.sum(p * p, axis=1))
    if mask is not None:
        pn = jnp.where(mask, pn, 0.0)
    p_max = jnp.max(pn) if pn.shape[0] else jnp.asarray(0.0, q.dtype)
    p_max = jnp.where(jnp.isfinite(p_max), p_max, 0.0)
    delta = jnp.abs(eps_cur - eps_star)
    den = k_soft * delta * grad_norm
    tau_imp = jnp.where((k_soft > 0.0) & (grad_norm > 0.0) & (delta > 0.0)
                        & (den > 0.0) & jnp.isfinite(den),
                        (2.0 * theta_imp * (p_max + eps_p)) / jnp.maximum(den, 1e-300),
                        jnp.inf)

    h_sub = jnp.minimum(jnp.minimum(CHI_GRAV * tau_grav, tau_spr),
                        jnp.minimum(tau_eps, tau_imp))
    fallback = jnp.where(dt_user > 0.0, dt_user, 1.0)
    h_sub = jnp.where(jnp.isfinite(h_sub) & (h_sub > 0.0), h_sub, fallback)

    if split_n_max > 0:
        n_need = jnp.ceil(dt_user / jnp.maximum(h_sub, 1e-30))
        h_sub = jnp.where(n_need > split_n_max, dt_user / split_n_max, h_sub)
    return h_sub


def classical_n_sub(dt, h_sub_ref, split_n_max: int):
    """n_sub = clamp(ceil(|dt|/h_sub_ref), 1, split_n_max)
    (integrator.py:91)."""
    n = jnp.ceil(jnp.abs(dt) / jnp.maximum(h_sub_ref, 1e-300))
    return jnp.clip(n.astype(jnp.int32), 1, split_n_max)


def autoset_k_soft(k_cfg, G, m, eps_min, mask=None):
    """k_soft = 8 G M_tot^2 / eps_min^3 when the configured value is
    non-positive (HSI:110-118)."""
    mm = m if mask is None else m * mask.astype(m.dtype)
    M_tot = jnp.sum(mm)
    e = jnp.maximum(eps_min, 1e-12)
    auto = C_KSOFT * G * M_tot * M_tot / (e * e * e)
    return jnp.where(k_cfg > 0.0, k_cfg, auto)


def calibrate_mu_from_timescales(q, m, G, eps0, k_soft, mask=None):
    """mu from omega_spr = 8 / tau_grav (HSI:251-296).

    Returns (mu_soft, omega_spr0).
    """
    tau = tau_grav_min(q, m, G, eps=eps0, mask=mask, softened=True)
    tau = jnp.where(jnp.isfinite(tau) & (tau > 0.0), tau, 1.0)
    omega_spr = C_OMEGA / tau
    mu = jnp.where((omega_spr > 0.0) & (k_soft > 0.0),
                   k_soft / (omega_spr * omega_spr), 1.0)
    mu = jnp.where(jnp.isfinite(mu) & (mu > 0.0), mu, 1.0)
    return mu, omega_spr


def calibrate_mu_from_pi_budget(mu_cur, k_soft, dt, theta_imp):
    """Raise mu to at least k (dt/theta_imp)^2 (HSI:145-246; only the
    raise has an effect — the bound check there is a no-op)."""
    ti = jnp.where((theta_imp > 0.0) & jnp.isfinite(theta_imp), theta_imp, 0.5)
    mu_macro = k_soft * (jnp.abs(dt) / ti) ** 2
    mu = jnp.where(jnp.isfinite(mu_cur) & (mu_cur > 0.0), mu_cur, 1.0)
    ok = jnp.isfinite(k_soft) & (k_soft > 0.0)
    return jnp.where(ok & (mu < mu_macro), mu_macro, mu)


def estimate_pi_budget_h(q, m, G, *, eps, eps_star, k_soft, s0, chi_pi,
                         dt_abs, eps_min, eps_max, k_wall, barrier_n: int,
                         include_barrier: bool, mask=None):
    """h_pi = 2 chi_pi sqrt(k) max(|eps-eps*|, 1e-4 s0) / |dV/deps + dB/deps|
    (HSI:1125-1221)."""
    chi = jnp.where((chi_pi > 0.0) & jnp.isfinite(chi_pi), chi_pi, 0.2)
    s0_eff = jnp.where(jnp.isfinite(s0) & (s0 > 0.0), s0, 1.0)
    delta_eff = jnp.maximum(jnp.abs(eps - eps_star), 1e-4 * s0_eff)
    dV = dV_d_epsilon(q, m, eps, G, mask=mask)
    if include_barrier and barrier_n >= 2:
        dB = -_bar_force(eps, eps_min, eps_max, k_wall, barrier_n)
    else:
        dB = jnp.zeros_like(dV)
    deps_eff = jnp.maximum(jnp.abs(dV + dB), 1e-16)
    sqrtk = jnp.sqrt(jnp.maximum(k_soft, 0.0))
    h_pi = 2.0 * chi * sqrtk * delta_eff / deps_eff
    h_pi = jnp.where(jnp.isfinite(h_pi) & (h_pi >= 0.0), h_pi, dt_abs)
    return jnp.where(k_soft > 0.0, h_pi, dt_abs)


def _bar_force(eps, eps_min, eps_max, k_wall, n: int):
    return barrier_force(eps, eps_min, eps_max, k_wall=k_wall, n=n)


def freeze_production_schedule(q, m, G, *, eps0, eps_star, k_soft, mu_soft,
                               omega_spr0, dt_user, theta_cap, chi_pi, s0,
                               eps_min, eps_max, k_wall, barrier_n: int,
                               include_barrier: bool, mask=None):
    """The ham_soft frozen schedule (HSI:986-1119).

    h_sub = min(0.9 tau_grav, theta_cap/omega_spr, h_pi);
    n_sub = ceil(dt/h_sub); h_sub_ref = dt/n_sub.
    Returns (h_sub_ref, n_sub:int32, omega_spr).
    """
    dt_abs = jnp.abs(dt_user)
    dt_abs = jnp.where(jnp.isfinite(dt_abs) & (dt_abs > 0.0), dt_abs, 1e-2)

    tau_grav = tau_grav_min(q, m, G, eps=eps0, mask=mask, softened=True)
    tau_grav = jnp.where(jnp.isfinite(tau_grav) & (tau_grav > 0.0), tau_grav, dt_abs)

    omega_spr = jnp.where(jnp.isfinite(omega_spr0) & (omega_spr0 > 0.0),
                          omega_spr0, C_OMEGA / tau_grav)

    tcap = jnp.where(jnp.isfinite(theta_cap) & (theta_cap > 0.0), theta_cap, 0.1)
    h_theta_grav = CHI_GRAV * tau_grav
    h_theta_osc = jnp.where(omega_spr > 0.0, tcap / jnp.maximum(omega_spr, 1e-300),
                            jnp.inf)
    h_theta = jnp.where(jnp.isfinite(h_theta_osc) & (h_theta_osc > 0.0),
                        jnp.minimum(h_theta_grav, h_theta_osc), h_theta_grav)

    h_pi = estimate_pi_budget_h(
        q, m, G, eps=eps0, eps_star=eps_star, k_soft=k_soft, s0=s0,
        chi_pi=chi_pi, dt_abs=dt_abs, eps_min=eps_min, eps_max=eps_max,
        k_wall=k_wall, barrier_n=barrier_n, include_barrier=include_barrier,
        mask=mask)
    h_pi = jnp.where(jnp.isfinite(h_pi) & (h_pi > 0.0), h_pi, dt_abs)

    h_sub = jnp.minimum(h_theta, h_pi)
    h_sub = jnp.where(jnp.isfinite(h_sub) & (h_sub > 0.0), h_sub, dt_abs)

    n_sub = jnp.maximum(jnp.ceil(dt_abs / h_sub).astype(jnp.int32), 1)
    h_sub_ref = dt_abs / n_sub.astype(dt_abs.dtype)
    return h_sub_ref, n_sub, omega_spr
