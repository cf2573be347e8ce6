"""Immutable simulation state and per-system dynamic parameters.

TPU-first replacement for the reference's mutable object web
(``NBodySimulation`` + ``SimulationState`` + ``SofteningManager`` +
integrator back-pointers, minbody/simulation_state.py:27-31,
softening_manager.py:38-70): one flat PyTree per concern.

* ``SimState``  — everything that evolves during integration.
* ``DynParams`` — per-system scalars fixed at construction/calibration
  time (G, k_soft, mu_soft, softening bounds, frozen schedule, ...).
  These are *traced* values so a batch of heterogeneous systems vmaps.

A single system is unbatched (``pos: (N, d)``); batching is
``jax.vmap`` over a leading axis.  Ragged body counts are handled by
padding to a common N with ``mask`` (SURVEY.md section 7, hard part #5).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    return jax.tree_util.register_dataclass(dataclass(frozen=True)(cls))


@_pytree_dataclass
class SimState:
    """Evolving state.

    mass:  (N,)    — zero on padded slots
    pos:   (N, d)
    vel:   (N, d)
    eps:   ()      — softening canonical coordinate (sim._epsilon)
    pi:    ()      — its conjugate momentum (sim._pi)
    s:     ()      — SofteningManager.s (classical-mode softening)
    step_s2: ()    — SofteningManager._step_s2 (force softening^2 in use)
    softening_energy_delta: () — accumulated bookkeeping energy
                     (sim.softening_energy_delta)
    hist_count/hist_sum/hist_sumsq: () — running stats of the softening
                     history deque (softening_manager.py:59); the deque
                     itself is only consumed as mean/std by
                     dynamical_features.py:143-155, so we carry moments.
    mask:  (N,)    — bool validity of each body slot
    """

    mass: Any
    pos: Any
    vel: Any
    eps: Any
    pi: Any
    s: Any
    step_s2: Any
    softening_energy_delta: Any
    hist_count: Any
    hist_sum: Any
    hist_sumsq: Any
    mask: Any

    @property
    def n_slots(self) -> int:
        return self.pos.shape[-2]

    @property
    def dim(self) -> int:
        return self.pos.shape[-1]

    def replace(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)

    def momenta(self):
        return self.mass[..., :, None] * self.vel


@_pytree_dataclass
class DynParams:
    """Per-system parameters resolved at construction/calibration.

    All fields are 0-d arrays (floats unless noted) so heterogeneous
    batches vmap.  ``n_sub`` is an int32 scalar — the frozen substep
    count of the production schedule
    (hamiltonian_softening_integrator.py:986-1119 for ham_soft,
    timestep_manager.py:139-253 for classical modes).
    """

    G: Any
    s0: Any                 # SofteningManager.s0 = max(softening, min_softening)
    min_softening: Any      # sim._min_softening (possibly raised by calibration)
    max_softening: Any      # sim._max_softening = 10 * s0
    softening_scale: Any    # sim._softening_scale
    k_soft: Any
    mu_soft: Any
    chi_eps: Any
    k_wall: Any
    alpha_run: Any          # EpsilonModel._alpha_run (0.3 * median h_i)
    omega_spr0: Any         # frozen spring frequency (HSI._omega_spr0)
    h_sub_ref: Any          # substep size of the frozen schedule
    n_sub: Any              # int32 — frozen substep count for dt = frozen_dt
    frozen_dt: Any          # the dt the schedule was frozen for

    def replace(self, **kw) -> "DynParams":
        return dataclasses.replace(self, **kw)


def build_state(masses, positions, velocities, *, eps, n_slots=None,
                dim=None, dtype=jnp.float64):
    """Construct a padded SimState from array-likes.

    Mirrors SimulationState.build_state (simulation_state.py:98-144):
    velocities broadcast from a single (d,) vector; masses must be
    positive & finite on valid slots.  Padding slots get mass 0 and are
    masked out of every kernel.
    """
    m = np.asarray(masses, dtype=np.float64).ravel()
    q = np.atleast_2d(np.asarray(positions, dtype=np.float64))
    v = np.asarray(velocities, dtype=np.float64)
    n = m.size
    d = q.shape[1] if dim is None else dim
    if v.ndim == 1:
        v = np.broadcast_to(v, (n, d)).copy()
    v = np.atleast_2d(v)
    slots = n if n_slots is None else int(n_slots)
    if slots < n:
        raise ValueError(f"n_slots={slots} < n_bodies={n}")

    def pad(a, fill=0.0):
        out = np.full((slots,) + a.shape[1:], fill, dtype=np.float64)
        out[:n] = a
        return out

    mask = np.zeros(slots, dtype=bool)
    mask[:n] = True
    eps = float(eps)
    return SimState(
        mass=jnp.asarray(pad(m), dtype),
        pos=jnp.asarray(pad(q), dtype),
        vel=jnp.asarray(pad(v), dtype),
        eps=jnp.asarray(eps, dtype),
        pi=jnp.asarray(0.0, dtype),
        s=jnp.asarray(eps, dtype),
        step_s2=jnp.asarray(eps * eps, dtype),
        softening_energy_delta=jnp.asarray(0.0, dtype),
        hist_count=jnp.asarray(1.0, dtype),
        hist_sum=jnp.asarray(eps, dtype),
        hist_sumsq=jnp.asarray(eps * eps, dtype),
        mask=jnp.asarray(mask),
    )


def n_bodies(state: SimState):
    return jnp.sum(state.mask.astype(jnp.int32))


def remove_center_of_mass_velocity(mass, vel, mask=None):
    """Project out the COM velocity (minbody/physics_utils.py:16-26)."""
    if mask is not None:
        mass = mass * mask.astype(mass.dtype)
    M = jnp.sum(mass)
    vcom = jnp.sum(mass[:, None] * vel, axis=0) / jnp.where(M > 0, M, 1.0)
    out = vel - vcom[None, :]
    if mask is not None:
        out = jnp.where(mask[:, None], out, vel)
    return out
