"""Pairwise geometry kernel — the O(N^2) hot path.

Parity target: ``minbody/geometry_cache.py:24-39`` (``geometry_buffers``),
re-designed TPU-first:

* dimension-parameterised (the reference hard-codes d=2; BASELINE.json's
  north star asks for ``(batch, N, d)``),
* optional validity mask so ragged-N batches (systems with 3..8 bodies
  padded to a common N, cf. ml_training_pipeline.py:48,90) conserve
  momentum exactly — masked pairs contribute exactly zero both ways,
* pure function of arrays; a single system is ``(N, d)`` and batching is
  ``jax.vmap``.

For few-body systems the dense (N, N) einsum maps straight onto the VPU;
a Pallas-tiled variant for large N lives in ``ops/pallas_kernels.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pair_mask(n: int, mask=None, dtype=bool):
    """(N, N) boolean mask of valid interacting pairs (off-diagonal,
    both endpoints valid)."""
    eye = jnp.eye(n, dtype=bool)
    if mask is None:
        return ~eye
    m = mask.astype(bool)
    return (m[:, None] & m[None, :]) & ~eye


def pairwise_geometry(pos, eps=0.0, mask=None):
    """Return (diff, r2, inv_r3) in one pass.

    diff[i, j] = pos[i] - pos[j]                    (N, N, d)
    r2[i, j]   = |diff|^2 (unsoftened)              (N, N)
    inv_r3     = (r2 + eps^2)^{-3/2}, zeroed on the diagonal and on
                 masked pairs                        (N, N)

    Matches geometry_buffers (minbody/geometry_cache.py:24-39): inv_r3
    softened, diagonal zero, r2 returned raw.
    """
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    diff = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    pm = pair_mask(n, mask)
    r2_soft = r2 + eps * eps
    valid = pm & (r2_soft > 0.0)
    safe = jnp.where(valid, r2_soft, 1.0)
    inv_r3 = jnp.where(valid, safe ** (-1.5), 0.0)
    return diff, r2, inv_r3


# Name parity with the reference's kernel (geometry_cache.py:24).
def geometry_buffers(pos, eps=0.0, mask=None):
    return pairwise_geometry(pos, eps=eps, mask=mask)


def pairwise_r2(pos, mask=None):
    """Unsoftened pairwise squared distances with ``inf`` on the diagonal
    and on masked pairs (the reference's ``fill_diagonal(r2, inf)``
    idiom, e.g. minbody/forces.py:31)."""
    pos = jnp.asarray(pos)
    n = pos.shape[0]
    diff = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1)
    pm = pair_mask(n, mask)
    return jnp.where(pm, r2, jnp.inf)


def min_separation(pos, mask=None):
    """Minimum pairwise distance, floored at 1e-12
    (minbody/simulation.py:659-665)."""
    r2 = pairwise_r2(pos, mask)
    return jnp.maximum(jnp.sqrt(jnp.min(r2)), 1e-12)
