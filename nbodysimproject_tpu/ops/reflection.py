"""eps-wall reflection machinery for the extended phase space (eps, pi).

Parity: ``minbody/hamsoft_utils.py`` — ``reflect_if_needed`` (:159),
``symplectic_bounce`` (:31), ``symplectic_reflect_eps`` (:105),
``reflect_and_limit_eps`` (:234).

TPU-first design (SURVEY.md section 7): the reference's iterative
billiard loop (``symplectic_bounce``) is replaced by the *closed-form*
triangle-wave fold — the free flight eps + (pi/mu) h folded into [a, b]
with period 2(b-a) and pi flipped on odd reflections.  This is the exact
solution of the same dynamics with no data-dependent loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def reflect_if_needed(eps, pi, eps_min, eps_max):
    """Fold (eps, pi) into [a, b] by the period-2(b-a) triangle map,
    flipping pi on odd reflections (minbody/hamsoft_utils.py:159-184).

    Degenerate interval (b <= a or non-finite width) returns (a, -pi),
    matching the reference.
    """
    a = eps_min
    b = eps_max
    R = b - a
    P = 2.0 * R
    y = jnp.where(P > 0.0, (eps - a) % P, 0.0)
    on_up = y <= R
    e_out = jnp.where(on_up, a + y, b - (y - R))
    p_out = jnp.where(on_up, pi, -pi)
    ok = jnp.isfinite(R) & (R > 0.0)
    return jnp.where(ok, e_out, a), jnp.where(ok, p_out, -pi)


def symplectic_bounce(eps, pi, eps_min, eps_max, h, mu):
    """Exact billiard flight for time h at velocity pi/mu inside
    [eps_min, eps_max] (minbody/hamsoft_utils.py:31-101).

    Closed form: fold the incoming point, advance freely, fold again.
    The reference's wall-by-wall loop computes exactly this triangle
    wave; odd total reflections flip pi.
    """
    mu = jnp.where(mu == 0.0, 1.0, mu)
    a = eps_min
    b = eps_max
    ok = jnp.isfinite(a) & jnp.isfinite(b) & (b > a)
    eps0, pi0 = reflect_if_needed(eps, pi, a, b)
    v = pi0 / mu
    e_free = eps0 + v * h
    e_out, pi_out = reflect_if_needed(e_free, pi0, a, b)
    return jnp.where(ok, e_out, a), jnp.where(ok, pi_out, -pi)


def symplectic_reflect_eps(eps, pi, eps_min, eps_max, h=0.0, mu=1.0):
    """minbody/hamsoft_utils.py:105-144: fold, then bounce if h != 0 and
    pi != 0."""
    e1, p1 = reflect_if_needed(eps, pi, eps_min, eps_max)
    e2, p2 = symplectic_bounce(e1, p1, eps_min, eps_max, h, mu)
    move = (jnp.abs(h) > 0.0) & (p1 != 0.0)
    return jnp.where(move, e2, e1), jnp.where(move, p2, p1)


# Alias parity (minbody/hamsoft_utils.py:146-156).
reflect_eps_symplectic = symplectic_reflect_eps


def reflect_and_limit_eps(eps, pi, eps_min, eps_max, h, mu, *, max_ratio: float = 2.0):
    """Bounded-ratio variant (minbody/hamsoft_utils.py:234-261)."""
    eps0 = eps
    e_new, p_new = symplectic_reflect_eps(eps, pi, eps_min, eps_max, h, mu)
    upper = eps0 * max_ratio
    lower = eps0 / max_ratio
    e_new = jnp.clip(e_new, lower, upper)
    return reflect_if_needed(e_new, p_new, eps_min, eps_max)
