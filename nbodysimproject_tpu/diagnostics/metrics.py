"""Step metrics and the Diagnostics facade.

Parity: ``minbody/diagnostics.py`` — ``step_metrics`` (:241-285),
``energy_guard`` (:288-384), plus the per-body conserved-quantity
helpers.  The ``Diagnostics`` class mirrors the reference's OO surface
over the functional kernels.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

import importlib

from ..core.state import SimState

# The package __init__ re-binds the name ``energy`` to the function of
# the same name, so resolve the submodule explicitly.
E = importlib.import_module(__package__ + ".energy")


def tidal_trace(state: SimState, dyn, cfg=None):
    """Trace of the Hessian of the softened potential over all
    coordinates: sum_i lap_i V = 2 G sum_{i<j} m_i m_j
    (d*(r^2+eps^2) - 3 r^2) / (r^2+eps^2)^{5/2}.

    The reference's ``tr_hessian`` step metric reads the vestigial
    ``_last_tr_hessian`` attribute, initialised 0.0 and never updated
    (minbody/integrator.py:48, diagnostics.py:266) — a dead column in
    its training frame.  Here the tidal trace is computed for real
    (documented deviation; see README "reference defects")."""
    pos = state.pos
    m = state.mass
    msk = state.mask
    d_dim = pos.shape[-1]
    diff = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    # the force softening in use (facade _accel dispatch: ham_soft uses
    # the canonical eps, classical modes sqrt(step_s2))
    if cfg is not None and getattr(cfg, "integrator_mode", None) != "ham_soft":
        eps2 = state.step_s2
    else:
        eps2 = state.eps * state.eps
    s = r2 + eps2
    n = pos.shape[0]
    pm = (msk[:, None] & msk[None, :]) & ~jnp.eye(n, dtype=bool)
    mm = m[:, None] * m[None, :]
    num = d_dim * s - 3.0 * r2
    contrib = jnp.where(pm, mm * num / jnp.maximum(s, 1e-300) ** 2.5, 0.0)
    return dyn.G * jnp.sum(contrib)  # i!=j double counts = full trace


def step_metrics(state: SimState, dyn, cfg, L0=None, megno_slope_median=None):
    """dict of COM drift, J_eps, theta_eps, L stats, energy breakdown
    (diagnostics.py:241-285).  ``L0`` is the first-seen total angular
    momentum (the reference caches it on the instance)."""
    m = state.mass
    pos = state.pos
    vel = state.vel
    msk = state.mask

    com_vec = jnp.sum(jnp.where(msk[:, None], m[:, None] * pos, 0.0), axis=0)
    com_drift = jnp.sqrt(jnp.sum(com_vec * com_vec))

    mu = dyn.mu_soft
    J_eps = state.eps * state.pi / jnp.where(mu != 0.0, mu, 1.0)
    denom_ok = (mu * state.eps != 0.0) | (state.pi != 0.0)
    theta_eps = jnp.where(denom_ok, jnp.arctan2(state.pi, mu * state.eps),
                          jnp.nan)

    if pos.shape[-1] == 2:
        # scalar L_z statistics — exact reference semantics
        L_i = m * (pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0])
        L_i = jnp.where(msk, L_i, 0.0)
        L_tot = jnp.sum(L_i)
        nb = jnp.maximum(jnp.sum(msk.astype(L_i.dtype)), 1.0)
        L_mean = L_tot / nb
        var_L = jnp.sum(jnp.where(msk, (L_i - L_mean) ** 2, 0.0)) / nb

        if L0 is None:
            L0 = L_tot
        cos_ok = (L0 != 0.0) & (L_tot != 0.0)
        cos_theta = jnp.where(cos_ok,
                              (L_tot * L0) / (jnp.abs(L_tot) * jnp.abs(L0)),
                              jnp.nan)
    else:
        # d = 3: vector angular momentum; L_tot is the magnitude,
        # var_L the variance of per-body |L_i|, cos_theta the tilt of
        # the current L vector against L0 (the quantity the reference's
        # scalar cos_theta approximates in 2-D)
        L_iv = jnp.where(msk[:, None], m[:, None] * jnp.cross(pos, vel), 0.0)
        L_vec = jnp.sum(L_iv, axis=0)
        L_tot = jnp.sqrt(jnp.sum(L_vec * L_vec))
        l_i = jnp.sqrt(jnp.sum(L_iv * L_iv, axis=1))
        nb = jnp.maximum(jnp.sum(msk.astype(l_i.dtype)), 1.0)
        l_mean = jnp.sum(jnp.where(msk, l_i, 0.0)) / nb
        var_L = jnp.sum(jnp.where(msk, (l_i - l_mean) ** 2, 0.0)) / nb

        if L0 is None:
            L0 = L_vec
        L0v = jnp.asarray(L0)
        L0n = jnp.sqrt(jnp.sum(L0v * L0v))
        cos_ok = (L0n != 0.0) & (L_tot != 0.0)
        cos_theta = jnp.where(
            cos_ok, jnp.sum(L_vec * L0v)
            / jnp.maximum(L_tot * L0n, 1e-300), jnp.nan)

    out = dict(
        com_drift=com_drift,
        J_eps=J_eps,
        L_tot=L_tot,
        var_L=var_L,
        cos_theta=cos_theta,
        tr_hessian=tidal_trace(state, dyn, cfg),
        megno_slope_med=(jnp.asarray(jnp.nan, pos.dtype)
                         if megno_slope_median is None else megno_slope_median),
        theta_eps=theta_eps,
    )
    out.update(E.energy_breakdown(state, dyn, cfg))
    return out


class Diagnostics:
    """OO parity surface (diagnostics.py:33)."""

    def __init__(self, simulation, integrator=None):
        self.sim = simulation
        self._integ = integrator
        pref = getattr(simulation.cfg, "energy_tol_pref", None)
        self._tol_pref = float(pref) if pref is not None else 1e-7
        self._H0_mod = None
        self._step_idx = 0

    # -- conserved quantities -----------------------------------------
    def kinetic_energy(self) -> float:
        return float(E.kinetic_energy(self.sim._state))

    def potential_energy(self) -> float:
        return float(E.potential_energy(self.sim._state, self.sim._dyn))

    def energy(self) -> float:
        return float(E.energy(self.sim._state, self.sim._dyn, self.sim.cfg))

    def energy_breakdown(self) -> dict:
        d = E.energy_breakdown(self.sim._state, self.sim._dyn, self.sim.cfg)
        return {k: float(v) for k, v in d.items()}

    def angular_momentum(self) -> float:
        return float(E.angular_momentum_z(self.sim._state))

    def linear_momentum(self):
        p = np.asarray(E.linear_momentum(self.sim._state))
        return float(p[0]), float(p[1])

    def center_of_mass(self):
        x, v = E.center_of_mass(self.sim._state)
        x = np.asarray(x)
        v = np.asarray(v)
        return (float(x[0]), float(x[1])), (float(v[0]), float(v[1]))

    def compute_extended_hamiltonian(self) -> float:
        return float(E.extended_hamiltonian(self.sim._state, self.sim._dyn,
                                            self.sim.cfg))

    # -- step metrics ----------------------------------------------------
    def step_metrics(self, megno_slope_history=None) -> dict:
        med = (float(np.median(megno_slope_history))
               if megno_slope_history else None)
        if not hasattr(self, "_L0"):
            self._L0 = float(E.angular_momentum_z(self.sim._state))
        d = step_metrics(self.sim._state, self.sim._dyn, self.sim.cfg,
                         L0=self._L0, megno_slope_median=med)
        return {k: float(v) for k, v in d.items()}

    # -- rate-limited diagnostics (diagnostics.py:387-421) ----------------
    _GLOBAL_DIAG_COUNTS: dict = {}

    def _rate_limited_diag_print(self, key: str, msg: str) -> None:
        cfg = getattr(self.sim, "cfg", None)
        if cfg is not None and not getattr(cfg, "diag_prints", True):
            return
        limit = int(getattr(cfg, "diag_print_limit", 3)) if cfg else 3
        interval = int(getattr(cfg, "diag_print_interval", 1000)) if cfg else 1000
        limit = max(limit, 0)
        interval = max(interval, 1)
        counts = Diagnostics._GLOBAL_DIAG_COUNTS
        c = counts.get(key, 0) + 1
        counts[key] = c
        if c <= limit:
            print(msg)
        elif c % interval == 0:
            print(f"{msg} (occurrence #{c})")

    # -- runtime energy guard (diagnostics.py:288-384) --------------------
    def energy_guard(self, dt: float) -> None:
        cfg = self.sim.cfg
        if not cfg.enable_runtime_guard:
            return
        interval = int(cfg.invariant_check_interval)
        self._step_idx += 1
        if self._step_idx % interval:
            return
        H_now = self.compute_extended_hamiltonian()
        if self._H0_mod is None:
            self._H0_mod = H_now
            return
        tol = self._tol_pref * dt * dt
        if abs(H_now - self._H0_mod) > tol:
            print(f"[energy_guard] |dH_ext| = {abs(H_now - self._H0_mod):.3e}"
                  f" > tol = {tol:.3e}")
