"""Legacy eps* target: harmonic mean over pair distances.

Parity: ``minbody/softening.py`` — ``eps_target`` (:48),
``grad_eps_target`` (:86).  eps* = lam * M / sum_{i<j} 1/(r_ij + delta)
with M = N (number of valid bodies) and delta = 1e-12.

NOTE ON SIGN: the reference's analytic gradient carries a leading minus
sign (softening.py:126, ``grad = -c_pref * sum(...)``) which is the
*negative* of the true derivative of eps*.  Downstream code compensates
by sign-aligning the production gradient against this one
(hamiltonian_softening_integrator.py:706-719).  We reproduce the
reference convention bit-for-bit so the alignment logic behaves
identically.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import pair_mask


_DELTA = 1.0e-12


def eps_target(q, *, alpha: float = 1.0, lam: float = 0.3, mask=None):
    """minbody/softening.py:48-81 (alpha unused there too)."""
    q = jnp.asarray(q)
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pm = pair_mask(n, mask)
    inv_den = jnp.where(pm, 1.0 / (r + _DELTA), 0.0)
    D = 0.5 * jnp.sum(inv_den)  # i<j pairs
    M = jnp.sum(mask.astype(q.dtype)) if mask is not None else jnp.asarray(float(n), q.dtype)
    eps_star = lam * M / D
    good = jnp.isfinite(D) & (D > 0.0) & jnp.isfinite(eps_star)
    return jnp.where(good, eps_star, 0.0)


def grad_eps_target(q, *, alpha: float = 1.0, lam: float = 0.3, mask=None):
    """minbody/softening.py:86-131 — including the sign convention noted
    in the module docstring."""
    q = jnp.asarray(q)
    n = q.shape[0]
    diff = q[:, None, :] - q[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pm = pair_mask(n, mask)
    r_safe = jnp.maximum(r, 1.0e-15)
    den = r_safe + _DELTA
    inv_den = jnp.where(pm, 1.0 / den, 0.0)
    D = 0.5 * jnp.sum(inv_den)
    M = jnp.sum(mask.astype(q.dtype)) if mask is not None else jnp.asarray(float(n), q.dtype)
    c_pref = lam * M / (D * D)
    A = jnp.where(pm, 1.0 / (r_safe * den * den), 0.0)
    grad = -c_pref * jnp.einsum("ij,ijd->id", A, diff)
    good = jnp.isfinite(D) & (D > 0.0)
    grad = jnp.where(good, grad, 0.0)
    return jnp.where(jnp.isfinite(grad), grad, 0.0)


def pairwise_rms_length_and_grad(q, mask=None):
    """minbody/softening.py:25-44 (kept for API parity; unused by callers
    in the reference as well)."""
    q = jnp.asarray(q)
    if mask is not None:
        q = q * mask[:, None].astype(q.dtype)
        n = jnp.sum(mask.astype(q.dtype))
    else:
        n = jnp.asarray(float(q.shape[0]), q.dtype)
    Qsum = jnp.sum(q, axis=0)
    sum_norm2 = jnp.sum(q * q)
    S = n * sum_norm2 - jnp.dot(Qsum, Qsum)
    c = 2.0 / (n * (n - 1.0))
    L = jnp.sqrt(jnp.maximum(c * S, 0.0))
    good = (S > 0.0) & (n >= 2)
    factor = jnp.where(L > 0.0, c / jnp.maximum(L, 1e-300), 0.0)
    gradL = factor * (n * q - Qsum[None, :])
    if mask is not None:
        gradL = gradL * mask[:, None].astype(q.dtype)
    return jnp.where(good, L, 0.0), jnp.where(good, gradL, jnp.zeros_like(gradL))
