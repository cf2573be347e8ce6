"""Large-N integration: fused leapfrog rollouts over the P3M / tiled
direct force engines.

The reference has no large-N path at all (its results PDF claims a
Barnes-Hut 8-15x speedup at N in [1e4, 1e5] without shipping tree
code — resultsNbody.pdf section 5.2).  This module makes whole
simulations, not just force evaluations, run at N >= 1e5: a
kick-drift-kick leapfrog whose force comes from

* ``ops.pm_force.p3m_force`` — smooth-split FFT mesh + banded-window
  short-range pass (d = 2), or
* ``ops.pallas_kernels.pairwise_force_pallas`` — the tiled exact
  direct kernel (any d), or
* the dense XLA einsum (small N / CPU tests).

Everything is one ``lax.scan`` under jit: mesh bounds are recomputed
from the live positions every step as *traced* values (the mesh
resolution ``Ng`` stays static, so there is a single compiled program
regardless of how the cloud expands).

Design notes (TPU-first):
- KDK with end-of-step force reuse: one force evaluation per step.
- The P3M short-range window size is a static shape; overflow is
  *counted* (max over steps) and returned, never silently dropped.
- float32 throughout on TPU (the mesh FFT dominates; f32 is the fast
  radix); pass float64 arrays on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LargeNInfo(NamedTuple):
    n_dropped_max: jnp.ndarray  # max short-range window overflow (p3m)
    kinetic: jnp.ndarray        # final kinetic energy (cheap sanity)


def _direct_force_xla(q, m, eps, G):
    """Dense O(N^2) einsum force (small N or CPU)."""
    diff = q[:, None, :] - q[None, :, :]          # (N, N, d)
    r2 = jnp.sum(diff * diff, -1) + eps * eps
    inv_r = jax.lax.rsqrt(r2)
    w = inv_r * inv_r * inv_r
    w = w.at[jnp.diag_indices(q.shape[0])].set(0.0)
    gm = G * m
    acc = -jnp.einsum("ij,ijd,j->id", w, diff, gm)
    return m[:, None] * acc


def make_force_fn(cfg, n: int, d: int, interpret: bool = False):
    """Resolve cfg.force_mode -> a traced (q, m, eps, G) -> ((N,d) force,
    n_dropped) function.  Static decision: one compiled program."""
    mode = cfg.force_mode
    if mode == "auto":
        mode = "p3m" if (d == 2 and n >= cfg.pm_auto_min_n) else \
            ("direct_pallas" if n >= cfg.pallas_force_min_n else "direct")

    if mode == "p3m":
        if d != 2:
            raise ValueError("force_mode='p3m' supports d=2 only "
                             f"(got d={d}); use 'direct_pallas'")
        from ..ops.pm_force import p3m_force

        def force(q, m, eps, G):
            return p3m_force(q, m, eps, G, Ng=int(cfg.pm_grid),
                             r_cut_cells=float(cfg.pm_r_cut_cells))

        return force
    if mode == "direct_pallas":
        from ..ops.pallas_kernels import pairwise_force_pallas

        def force(q, m, eps, G):
            f = pairwise_force_pallas(q, m, eps, G, interpret=interpret)
            return f, jnp.int32(0)

        return force
    if mode == "direct":
        def force(q, m, eps, G):
            return _direct_force_xla(q, m, eps, G), jnp.int32(0)

        return force
    raise ValueError(f"unknown force_mode {mode!r}")


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "interpret"))
def largen_rollout(pos, vel, mass, eps, G, dt, n_steps: int, cfg,
                   interpret: bool = False):
    """Advance one (N, d) system ``n_steps`` KDK-leapfrog steps with the
    force engine selected by ``cfg.force_mode``.

    Returns (pos, vel, LargeNInfo).  Counterpart of the reference's
    Verlet loop (integration_scheme_base.py velocity-verlet) at scales
    the reference cannot reach.
    """
    n, d = pos.shape
    force_fn = make_force_fn(cfg, n, d, interpret=interpret)
    dtf = jnp.asarray(dt, pos.dtype)
    h2 = 0.5 * dtf
    inv_m = jnp.where(mass > 0, 1.0 / jnp.maximum(mass, 1e-300), 0.0)

    f0, drop0 = force_fn(pos, mass, eps, G)

    def body(carry, _):
        q, v, f, dropped = carry
        v = v + h2 * f * inv_m[:, None]
        q = q + dtf * v
        f, drop = force_fn(q, mass, eps, G)
        v = v + h2 * f * inv_m[:, None]
        return (q, v, f, jnp.maximum(dropped, drop)), None

    (q, v, _f, dropped), _ = jax.lax.scan(
        body, (pos, vel, f0, drop0), None, length=n_steps)
    kin = 0.5 * jnp.sum(mass * jnp.sum(v * v, -1))
    return q, v, LargeNInfo(n_dropped_max=dropped, kinetic=kin)
