"""Compensated summation primitives.

The reference leans on ``np.float128`` for high-precision energy sums
(minbody/diagnostics.py:461, minbody/hamsoft_utils.py:205-222).  TPUs
have no float128, so the design (SURVEY.md section 7) replaces it with
float64 + compensated (Kahan / pairwise) summation.  These helpers are
jit-friendly: fixed shapes, ``lax``-based loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free transform: returns (s, err) with a+b = s+err exactly.

    Parity: minbody/softening_manager.py:91-96.
    """
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def kahan_sum(x):
    """Kahan-compensated sum of a 1-D array (minbody/hamsoft_utils.py:214).

    Sequential by nature; intended for small fixed-size arrays (pair
    lists of few-body systems) where the O(n) scan is negligible.
    """
    x = jnp.ravel(x)

    def body(carry, xi):
        s, c = carry
        y = xi - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    # data-derived zeros so the carry's mesh-varying type matches under
    # shard_map
    zero = jnp.sum(x) * 0.0
    (s, _c), _ = jax.lax.scan(body, (zero, zero), x)
    return s


def pairwise_sum(x):
    """Pairwise (cascade) summation (minbody/hamsoft_utils.py:188-201).

    O(log n) error growth instead of O(n); fully vectorised so it is the
    default for batched reductions.  Works on any 1-D length by padding
    with zeros to the next power of two (static shapes under jit).
    """
    x = jnp.ravel(x)
    n = x.shape[0]
    if n == 0:
        return jnp.zeros((), x.dtype)
    p = 1
    while p < n:
        p *= 2
    x = jnp.pad(x, (0, p - n))
    while x.shape[0] > 1:
        x = x[0::2] + x[1::2]
    return x[0]
