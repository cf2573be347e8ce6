"""Macro step: scan of substeps with softening-manager protocol.

Parity:
* classical macro step — integrator.py:78-104 (n_sub from h_sub_ref,
  capped at split_n_max; begin/commit/finish protocol,
  softening_manager.py:186-372),
* ham_soft macro step — HSI:496-557 (n_pred frozen substeps of
  h = dt/n_pred; eps frozen in the manager, simulation.py:583-630 —
  here simply: s mirrors eps),
* per-substep classical adaptive-softening refresh —
  integrator.py:200-227.

Two entry points:
* ``macro_step`` — n_sub is a static Python int (facade path; jit
  caches per n_sub),
* ``macro_step_dynamic`` — n_sub is read from ``dyn.n_sub`` and the
  scan runs a static ``n_sub_max`` trips with identity masking, so a
  heterogeneous batch vmaps while every system keeps its own exact
  h = dt / n_sub (SURVEY.md section 7, hard part #2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.state import SimState
from .classical import verlet_kernel, yoshida4_kernel, adaptive_softening_refresh
from .whfast import whfast_substep
from .hamsoft import strang_substep


def begin_step(state: SimState, cfg) -> SimState:
    """softening_manager.begin_step (:186-199): ham_soft mirrors eps into
    s; classical freezes step_s2 = s^2; history records s."""
    if cfg.integrator_mode == "ham_soft":
        s = state.eps
    else:
        s = state.s
    state = state.replace(s=s, step_s2=s * s)
    return state.replace(
        hist_count=state.hist_count + 1.0,
        hist_sum=state.hist_sum + s,
        hist_sumsq=state.hist_sumsq + s * s,
    )


def finish_step(state: SimState, cfg) -> SimState:
    """softening_manager.finish_step (:355-372)."""
    if cfg.integrator_mode == "ham_soft":
        return state.replace(s=state.eps, step_s2=state.eps * state.eps)
    return state


def substep_fn(cfg):
    """Select the substep body for the (static) integrator mode
    (integrator.py:200-227)."""
    mode = cfg.integrator_mode
    adaptive = cfg.adaptive_softening and mode != "ham_soft"

    if mode == "ham_soft":
        return strang_substep

    if mode == "yoshida4":
        kernel = yoshida4_kernel
    elif mode == "whfast":
        kernel = whfast_substep
    elif mode == "kepler_split":
        # tight-binary tail fast path (integrators/kepler_split.py);
        # eps is frozen, so no adaptive refresh applies
        from .kepler_split import kepler_split_substep

        return kepler_split_substep
    else:
        kernel = verlet_kernel

    if not adaptive:
        return kernel

    def with_refresh(state, dyn, cfg, h):
        state = kernel(state, dyn, cfg, h)
        return adaptive_softening_refresh(state, dyn, cfg)

    return with_refresh


def macro_step(state: SimState, dyn, cfg, dt, n_sub: int) -> SimState:
    """One sim.step(dt) with a static substep count.

    ham_soft threads the (eps*, grad) cache across substep boundaries
    (hamsoft.strang_substep_cached): only T moves q, so the trailing
    S-flow's evaluation is exact for the next substep's leading S-flow
    — one SPH solve + reverse sweep per substep instead of two.
    """
    h = dt / n_sub
    state = begin_step(state, cfg)

    if cfg.integrator_mode == "ham_soft":
        from .hamsoft import strang_substep_cached

        state, cache = strang_substep_cached(state, dyn, cfg, h, None)
        if n_sub > 1:
            def scan_body(carry, _):
                s, c = carry
                s, c = strang_substep_cached(s, dyn, cfg, h, c)
                return (s, c), None

            (state, _c), _ = jax.lax.scan(scan_body, (state, cache), None,
                                          length=n_sub - 1)
        return finish_step(state, cfg)

    body = substep_fn(cfg)

    def scan_body(s, _):
        return body(s, dyn, cfg, h), None

    state, _ = jax.lax.scan(scan_body, state, None, length=n_sub)
    return finish_step(state, cfg)


def macro_step_dynamic(state: SimState, dyn, cfg, dt, n_sub_max: int) -> SimState:
    """One sim.step(dt) with per-system dynamic n_sub = dyn.n_sub.

    Runs ``n_sub_max`` scan trips; trip i applies the substep only when
    i < n_sub (identity otherwise), with h = dt / n_sub, so each system
    in a vmapped batch follows its own frozen schedule exactly.
    """
    n_sub = jnp.maximum(dyn.n_sub, 1)
    h = dt / n_sub.astype(state.pos.dtype)
    state = begin_step(state, cfg)

    if cfg.integrator_mode == "ham_soft":
        from .hamsoft import strang_substep_cached

        # trip 0 is never masked (n_sub >= 1); later trips select
        # identity per lane — a masked lane's q is unchanged, so its
        # carried cache stays valid
        state, cache = strang_substep_cached(state, dyn, cfg, h, None)
        if n_sub_max > 1:
            def scan_body(carry, i):
                s, c = carry
                s_new, c_new = strang_substep_cached(s, dyn, cfg, h, c)
                keep = i < n_sub
                sel = lambda a, b: jnp.where(keep, a, b)
                s_out = jax.tree_util.tree_map(sel, s_new, s)
                c_out = jax.tree_util.tree_map(sel, c_new, c)
                return (s_out, c_out), None

            (state, _c), _ = jax.lax.scan(scan_body, (state, cache),
                                          jnp.arange(1, n_sub_max))
        return finish_step(state, cfg)

    body = substep_fn(cfg)

    def scan_body(carry, i):
        s = carry
        s_new = body(s, dyn, cfg, h)
        s_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(i < n_sub, a, b), s_new, s)
        return s_out, None

    state, _ = jax.lax.scan(scan_body, state, jnp.arange(n_sub_max))
    return finish_step(state, cfg)


def integrate(state: SimState, dyn, cfg, dt, n_steps: int, n_sub: int) -> SimState:
    """n_steps macro steps under one scan — the TPU hot loop."""
    def body(s, _):
        return macro_step(s, dyn, cfg, dt, n_sub), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state


def integrate_dynamic(state: SimState, dyn, cfg, dt, n_steps: int,
                      n_sub_max: int) -> SimState:
    def body(s, _):
        return macro_step_dynamic(s, dyn, cfg, dt, n_sub_max), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state
