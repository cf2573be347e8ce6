"""Fully-batched system construction and integration.

The facade builds one system at a time with host-side calibration; this
module is the TPU-native path: construction (COM removal, eps-model
calibration, k/mu calibration, frozen schedule — the whole
simulation.py:39-162 + HSI:47-141 cascade) is a pure function of
arrays, vmapped over the population, so building 10^4..10^6 systems is
one compiled program with no host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.state import SimState, DynParams, remove_center_of_mass_velocity
from ..core.config import SimConfig
from ..integrators import calibration as calib
from ..integrators import hamsoft as hs
from ..integrators.step import integrate_dynamic, macro_step_dynamic
from ..ops import eps_model as epsmod


def init_system(mass, pos, vel, mask, cfg: SimConfig, *, G, softening,
                min_softening, dt, skip_cm_recenter: bool = False):
    """Construct (SimState, DynParams) for one (padded) system.

    Mirrors the facade constructor semantics for a *static* integrator
    mode (no data-dependent demotions — cohorts pick their mode).
    """
    dtype = pos.dtype
    f = lambda x: jnp.asarray(x, dtype)
    if not skip_cm_recenter:
        vel = remove_center_of_mass_velocity(mass, vel, mask)

    min_softening = jnp.maximum(f(min_softening), 0.0)
    softening = f(softening)
    softening = jnp.where(softening < 0.0, min_softening, softening)
    min_softening = jnp.where((min_softening == 0.0) & (softening > 0.0),
                              0.1 * softening, min_softening)
    s0 = jnp.maximum(softening, min_softening)
    max_softening = 10.0 * s0

    state = SimState(
        mass=mass, pos=pos, vel=vel, eps=s0, pi=f(0.0), s=s0,
        step_s2=s0 * s0, softening_energy_delta=f(0.0),
        hist_count=f(1.0), hist_sum=s0, hist_sumsq=s0 * s0, mask=mask)

    dyn = DynParams(
        G=f(G), s0=s0, min_softening=min_softening,
        max_softening=max_softening, softening_scale=f(cfg.softening_scale),
        k_soft=f(0.0), mu_soft=f(1.0), chi_eps=f(1.0), k_wall=f(cfg.k_wall),
        alpha_run=f(1.0), omega_spr0=f(0.0), h_sub_ref=f(0.0),
        n_sub=jnp.asarray(1, jnp.int32), frozen_dt=f(dt))

    if cfg.integrator_mode == "ham_soft":
        return _init_hamsoft(state, dyn, cfg, f(dt))
    return _init_classical(state, dyn, cfg, f(dt))


def _init_classical(state, dyn, cfg, dt):
    eps_star = jnp.where(dyn.s0 > 0.0, dyn.s0,
                         jnp.where(dyn.softening_scale > 0.0,
                                   dyn.softening_scale, state.eps))
    h_sub = calib.init_substep_schedule(
        state.pos, state.mass, state.vel, dyn.G, eps_cur=state.eps,
        pi=state.pi, k_soft=dyn.k_soft, mu_soft=dyn.mu_soft,
        min_softening=dyn.min_softening, max_softening=dyn.max_softening,
        eps_star=eps_star, grad_norm=jnp.zeros_like(eps_star),
        theta_cap=jnp.asarray(cfg.theta_cap, dt.dtype), dt_user=dt,
        split_n_max=int(cfg.split_n_max), mask=state.mask)
    n_sub = calib.classical_n_sub(dt, h_sub, int(cfg.split_n_max))
    dyn = dyn.replace(h_sub_ref=h_sub, n_sub=n_sub, frozen_dt=jnp.abs(dt))
    return state, dyn


def _init_hamsoft(state, dyn, cfg, dt):
    f = lambda x: jnp.asarray(x, dt.dtype)
    if cfg.fixed_eps_star and cfg.eps_star_value is not None \
            and cfg.eps_star_value == cfg.eps_star_value:
        # fixed-eps* override (hamsoft_eps_model.py:645-667, HSI:71-86)
        vf = f(cfg.eps_star_value)
        min_soft = jnp.where(dyn.min_softening > vf, vf, dyn.min_softening)
        alpha_run = f(cfg.alpha if (cfg.alpha or 0) > 0 else 1.0)
        state = state.replace(eps=vf, s=vf, step_s2=vf * vf,
                              pi=jnp.zeros_like(vf))
    else:
        # eps-model calibration (hamsoft_eps_model.py:645-729)
        alpha_run, min_soft, eps_new = epsmod.calibrate_from_initial_conditions(
            state.pos, state.mass, eps0=state.eps, eps_min0=dyn.min_softening,
            eps_max=dyn.max_softening, alpha_cfg=f(cfg.alpha or -1.0),
            eta=cfg.eta, mask=state.mask)
        state = state.replace(eps=eps_new, s=eps_new, step_s2=eps_new * eps_new)
    dyn = dyn.replace(alpha_run=alpha_run, min_softening=min_soft)

    # k_soft (cfg value, autoset when <= 0; HSI:110-118)
    eps_min_eff = jnp.where(
        jnp.isfinite(dyn.min_softening) & (dyn.min_softening > 0.0),
        dyn.min_softening, jnp.maximum(dyn.s0 * 0.1, 1e-12))
    k_soft = calib.autoset_k_soft(f(cfg.k_soft), dyn.G, state.mass,
                                  eps_min_eff, mask=state.mask)
    dyn = dyn.replace(k_soft=k_soft)

    mu, omega = calib.calibrate_mu_from_timescales(
        state.pos, state.mass, dyn.G, state.eps, dyn.k_soft, mask=state.mask)
    dyn = dyn.replace(mu_soft=mu, omega_spr0=omega)

    eps_star = hs.eps_target(state, dyn, cfg)
    h_sub, n_sub, omega = calib.freeze_production_schedule(
        state.pos, state.mass, dyn.G, eps0=state.eps, eps_star=eps_star,
        k_soft=dyn.k_soft, mu_soft=dyn.mu_soft, omega_spr0=dyn.omega_spr0,
        dt_user=dt, theta_cap=f(cfg.theta_cap), chi_pi=f(cfg.chi_pi),
        s0=dyn.s0, eps_min=dyn.min_softening, eps_max=dyn.max_softening,
        k_wall=dyn.k_wall, barrier_n=int(cfg.barrier_exponent),
        include_barrier=hs.policy_is_soft(cfg), mask=state.mask)
    # pi-budget mu raise applied at step time in the facade; here once
    mu2 = calib.calibrate_mu_from_pi_budget(dyn.mu_soft, dyn.k_soft,
                                            jnp.abs(dt), f(cfg.theta_imp))
    dyn = dyn.replace(h_sub_ref=h_sub, n_sub=n_sub, omega_spr0=omega,
                      mu_soft=mu2, frozen_dt=jnp.abs(dt))
    return state, dyn


@partial(jax.jit, static_argnames=("cfg", "skip_cm_recenter"))
def init_system_jit(mass, pos, vel, mask, cfg, G, softening, min_softening,
                    dt, skip_cm_recenter=False):
    """Jitted single-system construction (the facade's calibration
    path — eager construction costs hundreds of per-op round trips on
    a remote-TPU link)."""
    return init_system(mass, pos, vel, mask, cfg, G=G, softening=softening,
                       min_softening=min_softening, dt=dt,
                       skip_cm_recenter=skip_cm_recenter)


@partial(jax.jit, static_argnames=("cfg",))
def refreeze_jit(state, dyn, cfg, dt):
    """Recompute the ham_soft frozen schedule for a new dt
    (HSI:862-864)."""
    eps_star = hs.eps_target(state, dyn, cfg)
    h_sub, n_sub, omega = calib.freeze_production_schedule(
        state.pos, state.mass, dyn.G, eps0=state.eps, eps_star=eps_star,
        k_soft=dyn.k_soft, mu_soft=dyn.mu_soft, omega_spr0=dyn.omega_spr0,
        dt_user=dt, theta_cap=jnp.asarray(cfg.theta_cap, dt.dtype),
        chi_pi=jnp.asarray(cfg.chi_pi, dt.dtype), s0=dyn.s0,
        eps_min=dyn.min_softening, eps_max=dyn.max_softening,
        k_wall=dyn.k_wall, barrier_n=int(cfg.barrier_exponent),
        include_barrier=hs.policy_is_soft(cfg), mask=state.mask)
    return dyn.replace(h_sub_ref=h_sub, n_sub=n_sub, omega_spr0=omega,
                       frozen_dt=jnp.abs(dt))


@partial(jax.jit, static_argnames=("cfg", "skip_cm_recenter"))
def build_batch(mass, pos, vel, mask, cfg, G, softening, min_softening, dt,
                skip_cm_recenter=False):
    """vmapped construction over a (B, N[, d]) population.

    G / softening / min_softening may be scalars or (B,) arrays.
    """
    B = pos.shape[0]
    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, pos.dtype), (B,))
    fn = lambda m, q, v, msk, g, s, ms: init_system(
        m, q, v, msk, cfg, G=g, softening=s, min_softening=ms, dt=dt,
        skip_cm_recenter=skip_cm_recenter)
    return jax.vmap(fn)(mass, pos, vel, mask, bc(G), bc(softening),
                        bc(min_softening))


@partial(jax.jit, static_argnames=("cfg", "n_steps", "n_sub_max"))
def integrate_batch(states, dyns, cfg, dt, n_steps, n_sub_max):
    """n_steps macro steps for every system — one compiled program."""
    fn = lambda s, d: integrate_dynamic(s, d, cfg, dt, n_steps, n_sub_max)
    return jax.vmap(fn)(states, dyns)


@partial(jax.jit, static_argnames=("cfg", "n_sub_max"))
def step_batch(states, dyns, cfg, dt, n_sub_max):
    fn = lambda s, d: macro_step_dynamic(s, d, cfg, dt, n_sub_max)
    return jax.vmap(fn)(states, dyns)
