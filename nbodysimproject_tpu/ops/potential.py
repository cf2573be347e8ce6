"""Softened gravitational potential.

Parity: ``minbody/potential.py`` — ``softened_potential`` (:23),
``dU_d_eps`` (:67).
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import pair_mask
from .forces import dV_d_epsilon


def softened_potential(q, m, G, eps, mask=None):
    """U = -G sum_{i<j} m_i m_j / sqrt(r_ij^2 + eps^2)
    (minbody/potential.py:23-64)."""
    q = jnp.asarray(q)
    m = jnp.asarray(m)
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1) + eps * eps
    pm = pair_mask(n, mask)
    valid = pm & (r2 > 0.0)
    inv_r = jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, r2, 1.0)), 0.0)
    mprod = m[:, None] * m[None, :]
    return -0.5 * G * jnp.sum(mprod * inv_r)


def dU_d_eps(q, m, G, eps, mask=None):
    """Wrapper parity with minbody/potential.py:67-74."""
    return dV_d_epsilon(q, m, eps, G, mask=mask)
