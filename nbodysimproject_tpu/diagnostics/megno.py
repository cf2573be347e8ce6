"""MEGNO (Mean Exponential Growth of Nearby Orbits) chaos indicator.

Parity: ``minbody/evolution_features.py:34-66`` — tangent vectors
(delta_r, delta_v) initialised COM-free and unit-norm, then per step:
    sim.step(dt)
    delta_r += delta_v * dt
    delta_a  = variational_accel(delta_r)
    delta_v += delta_a * dt
    accum   += (|delta_v| / |delta_r|) * t * dt
    Y = 2 accum / t ;  t_lyap = t / |Y|

TPU-first (SURVEY.md section 4 of the build plan): the whole MEGNO loop
is fused into one ``lax.scan`` carrying (state, delta_r, delta_v,
accum, t) — vmappable over the system batch, jitted end to end.  The
norm_r < 1e-12 quirk of the reference (which *divides* by the tiny
norm, evolution_features.py:54-57) is reproduced.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.state import SimState
from ..integrators.step import macro_step, macro_step_dynamic
from .tangent import variational_accel_state


def init_tangent(key, state: SimState):
    """Random COM-free unit tangent vectors
    (evolution_features.py:37-44)."""
    k1, k2 = jax.random.split(key)
    shape = state.pos.shape
    m = jnp.where(state.mask, state.mass, 0.0)
    M = jnp.maximum(jnp.sum(m), 1e-300)

    def make(k):
        d = jax.random.normal(k, shape, state.pos.dtype)
        d = jnp.where(state.mask[:, None], d, 0.0)
        com = jnp.sum(m[:, None] * d, axis=0) / M
        d = jnp.where(state.mask[:, None], d - com, 0.0)
        return d / jnp.maximum(jnp.sqrt(jnp.sum(d * d)), 1e-300)

    return make(k1), make(k2)


def megno_scan(state: SimState, dyn, cfg, key, n_steps: int, dt,
               n_sub=None, n_sub_max: int = 0):
    """Run n_steps MEGNO steps fused with the integrator.

    Returns (final_state, Y, lyapunov_time, slope_med).  ``n_sub``
    static int for the facade path; ``n_sub_max`` > 0 selects the
    dynamic batched path.

    ``slope_med`` is the median over steps of the instantaneous MEGNO
    slope dY/dt — the quantity the reference's ``megno_slope_med``
    metric was designed to summarise but never actually produces (its
    ``step_metrics`` is only ever called without a slope history,
    minbody/diagnostics.py:266-282, stability_analyzer.py:121-127).
    Computing it here fills the otherwise-dead training column.
    """
    delta_r0, delta_v0 = init_tangent(key, state)
    dt = jnp.asarray(dt, state.pos.dtype)

    def body(carry, _):
        st, dr, dv, accum, t = carry
        if n_sub_max > 0:
            st = macro_step_dynamic(st, dyn, cfg, dt, n_sub_max)
        else:
            st = macro_step(st, dyn, cfg, dt, n_sub)
        dr = dr + dv * dt
        da = variational_accel_state(st, dyn, cfg, dr)
        dv = dv + da * dt
        t = t + dt
        norm_r = jnp.sqrt(jnp.sum(dr * dr))
        # reference quirk: divides by the tiny norm then treats it as 1
        tiny = norm_r < 1e-12
        scale = jnp.where(tiny, jnp.maximum(norm_r, 1e-300), 1.0)
        dr = dr / scale
        dv = dv / scale
        norm_r = jnp.where(tiny, 1.0, norm_r)
        norm_v = jnp.sqrt(jnp.sum(dv * dv))
        accum = accum + (norm_v / jnp.maximum(norm_r, 1e-300)) * t * dt
        Y_t = 2.0 * accum / jnp.maximum(t, 1e-300)
        return (st, dr, dv, accum, t), Y_t

    zero = jnp.zeros((), state.pos.dtype)
    (st, _dr, _dv, accum, t), ys = jax.lax.scan(
        body, (state, delta_r0, delta_v0, zero, zero), None, length=n_steps)
    Y = 2.0 * accum / jnp.maximum(t, 1e-300)
    lyap = jnp.where(Y == 0.0, jnp.inf, t / jnp.abs(Y))
    # per-step slope dY/dt; ys has static length n_steps so the median
    # is a fixed-shape sort
    if n_steps >= 2:
        slopes = (ys[1:] - ys[:-1]) / dt
        slope_med = jnp.median(slopes)
    else:
        slope_med = jnp.zeros((), state.pos.dtype)
    return st, Y, lyap, slope_med


@partial(jax.jit, static_argnames=("cfg", "n_steps", "n_sub"))
def megno_jit(state, dyn, cfg, key, n_steps, dt, n_sub):
    return megno_scan(state, dyn, cfg, key, n_steps, dt, n_sub=n_sub)
