"""Classical integrators: velocity-Verlet and Yoshida4 substeps.

Parity:
* velocity-Verlet kernel — integration_scheme_base.py:129-149 /
  integrator.py:106-136 (``atomicstep``),
* Yoshida4 triple jump — yoshida4_scheme.py:18-25,
* classical adaptive-softening refresh — integrator.py:126-134 +
  softening_manager.py:541-547 (proposal), :100-103 (2x limiter),
  :424-471 (energy correction).

Each substep is ``(state, dyn, cfg, h) -> state``; the macro step scans
these.  Acceleration uses eps_eff = sqrt(step_s2) for classical modes
(simulation.py:558-581).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import SimState
from ..ops.forces import gravitational_force
from ..ops.geometry import min_separation, pair_mask
from ..ops.barrier import barrier_energy

CBRT2 = 2.0 ** (1.0 / 3.0)
_W1 = 1.0 / (2.0 - CBRT2)
_W2 = -CBRT2 / (2.0 - CBRT2)


def _force(state: SimState, dyn, cfg, eps):
    """Force dispatch: dense XLA einsum for few-body, Pallas tiled
    kernel for large unpadded systems when cfg.use_pallas_forces
    (shared with the WHFast interaction kick — ops/forces.py)."""
    from ..ops.forces import force_auto

    return force_auto(state.pos, state.mass, eps, dyn.G, state.mask, cfg)


def classical_accel(state: SimState, dyn, cfg):
    """a_i = F_i / m_i with eps_eff = sqrt(max(step_s2, 0))
    (simulation.py:558-581)."""
    eps_eff = jnp.sqrt(jnp.maximum(state.step_s2, 0.0))
    F = _force(state, dyn, cfg, eps_eff)
    m_safe = jnp.where(state.mask, state.mass, 1.0)
    return F / m_safe[:, None]


def hamsoft_accel(state: SimState, dyn, cfg):
    """a_i with eps = state.eps (simulation.py:549-556)."""
    F = _force(state, dyn, cfg, state.eps)
    m_safe = jnp.where(state.mask, state.mass, 1.0)
    return F / m_safe[:, None]


def verlet_kernel(state: SimState, dyn, cfg, h) -> SimState:
    """One velocity-Verlet kick-drift-kick
    (integration_scheme_base.py:129-149)."""
    acc = classical_accel(state, dyn, cfg)
    vel = state.vel + 0.5 * h * acc
    pos = state.pos + h * vel
    state = state.replace(pos=pos, vel=vel)
    acc2 = classical_accel(state, dyn, cfg)
    return state.replace(vel=state.vel + 0.5 * h * acc2)


def yoshida4_kernel(state: SimState, dyn, cfg, h) -> SimState:
    """Triple-jump composition w1, w2, w1 (yoshida4_scheme.py:18-25)."""
    state = verlet_kernel(state, dyn, cfg, _W1 * h)
    state = verlet_kernel(state, dyn, cfg, _W2 * h)
    state = verlet_kernel(state, dyn, cfg, _W1 * h)
    return state


# --------------------------------------------------------------------------
# classical adaptive softening (adaptive-classic policy)
# --------------------------------------------------------------------------

def softening_from_min_sep(state: SimState, dyn):
    """Proposal: clamp(max(min_soft, min_sep/softening_scale), <= 10 s0)
    then limit change to a factor 2 per refresh
    (softening_manager.py:541-547, :100-103)."""
    min_sep = min_separation(state.pos, state.mask)
    proposed = jnp.maximum(dyn.min_softening, min_sep / dyn.softening_scale)
    proposed = jnp.minimum(proposed, 10.0 * dyn.s0)
    lower = state.s / 2.0
    upper = state.s * 2.0
    limited = jnp.maximum(lower, jnp.minimum(upper, proposed))
    ok = jnp.isfinite(min_sep) & (min_sep > 0.0)
    return jnp.where(ok, limited, state.s)


def _energy_correction(state: SimState, dyn, cfg, s_old, s_new):
    """SofteningManager._compute_energy_correction
    (softening_manager.py:424-471): gravitational pair-inverse delta
    (sign per reference), spring delta when k_soft != 0 (classical
    integrators have k_soft = 0, integrator.py:33), barrier delta."""
    q = state.pos
    m = state.mass
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    pm = pair_mask(n, state.mask)
    inv_old = jnp.where(pm, 1.0 / jnp.sqrt(jnp.where(pm, r2 + s_old * s_old, 1.0)), 0.0)
    inv_new = jnp.where(pm, 1.0 / jnp.sqrt(jnp.where(pm, r2 + s_new * s_new, 1.0)), 0.0)
    mprod = m[:, None] * m[None, :]
    dE_grav = dyn.G * 0.5 * jnp.sum(mprod * (inv_new - inv_old))

    kw = cfg.k_wall
    dE_bar = (barrier_energy(s_new, dyn.min_softening, dyn.max_softening,
                             k_wall=kw, n=cfg.barrier_exponent)
              - barrier_energy(s_old, dyn.min_softening, dyn.max_softening,
                               k_wall=kw, n=cfg.barrier_exponent))
    return dE_grav + dE_bar


def adaptive_softening_refresh(state: SimState, dyn, cfg) -> SimState:
    """refresh_softening with energy bookkeeping
    (integrator.py:126-134, softening_manager.py:298-336)."""
    s_new = softening_from_min_sep(state, dyn)
    dE = _energy_correction(state, dyn, cfg, state.s, s_new)
    dE = jnp.where(jnp.isfinite(dE), dE, 0.0)
    return state.replace(
        s=s_new,
        step_s2=s_new * s_new,
        softening_energy_delta=state.softening_energy_delta + dE,
    )


def apply_corrector(state: SimState, dyn, cfg, h_ref) -> SimState:
    """Startup corrector: one half-kick of h_ref
    (integration_scheme_base.py:154-192; the order-dependent force
    refreshes there have no state effect)."""
    acc = classical_accel(state, dyn, cfg)
    return state.replace(vel=state.vel + 0.5 * h_ref * acc)
