"""Power-law wall potential confining eps in [eps_min, eps_max].

Parity: ``minbody/barrier.py`` — ``barrier_energy`` (:35),
``barrier_force`` (:66), ``barrier_curvature`` (:116).

U(eps)  = (k_wall / (n-1)) * (max(0, a-eps)^{n-1} + max(0, eps-b)^{n-1})
F(eps)  = -dU/deps = k_wall * (max(0, a-eps)^{n-2} - max(0, eps-b)^{n-2})
K(eps)  =  d2U/deps2 = k_wall (n-2) (max(0,a-eps)^{n-3} + max(0,eps-b)^{n-3})

All three are scalar-in/scalar-out jax functions (also broadcast over
arrays).  ``n`` is a static Python int (config value), so the invalid-
input early-outs of the reference are resolved at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sorted_bounds(eps_min, eps_max):
    a = jnp.minimum(eps_min, eps_max)
    b = jnp.maximum(eps_min, eps_max)
    return a, b


def _powm(x, e: int):
    """x**e for non-negative x with the reference's e == 0 convention:
    only strictly-positive overhangs contribute 1 (minbody/barrier.py:98-106)."""
    if e == 0:
        return jnp.where(x > 0.0, 1.0, 0.0)
    return x**e


def barrier_energy(eps, eps_min, eps_max, *, k_wall=1.0e9, n: int = 5):
    eps = jnp.asarray(eps)
    if n < 2:
        return jnp.zeros_like(eps)
    a, b = _sorted_bounds(eps_min, eps_max)
    left = jnp.maximum(0.0, a - eps)
    right = jnp.maximum(0.0, eps - b)
    power = n - 1
    k = jnp.where(jnp.isfinite(k_wall) & (k_wall > 0.0), k_wall, 0.0)
    return (k / power) * (left**power + right**power)


def barrier_force(eps, eps_min, eps_max, *, k_wall=1.0e9, n: int = 5):
    eps = jnp.asarray(eps)
    if n < 2:
        return jnp.zeros_like(eps)
    # NOTE: reference barrier_force does NOT sort the bounds
    # (minbody/barrier.py:90-91) — kept bitwise-compatible.
    left = jnp.maximum(0.0, eps_min - eps)
    right = jnp.maximum(0.0, eps - eps_max)
    e = n - 2
    k = jnp.where(jnp.isfinite(k_wall) & (k_wall > 0.0), k_wall, 0.0)
    return k * (_powm(left, e) - _powm(right, e))


def barrier_curvature(eps, eps_min, eps_max, *, k_wall=1.0e9, n: int = 5):
    eps = jnp.asarray(eps)
    if n < 3:
        # n == 2 returns zero curvature in the reference (barrier.py:130-131)
        return jnp.zeros_like(eps)
    a, b = _sorted_bounds(eps_min, eps_max)
    left = jnp.maximum(0.0, a - eps)
    right = jnp.maximum(0.0, eps - b)
    power = n - 3
    # Reference uses a plain power here (minbody/barrier.py:143-144), so
    # for n == 3 the curvature is 2*k_wall everywhere (0**0 == 1).
    k = jnp.where(jnp.isfinite(k_wall) & (k_wall > 0.0), k_wall, 0.0)
    return k * (n - 2) * (left ** power + right ** power)
