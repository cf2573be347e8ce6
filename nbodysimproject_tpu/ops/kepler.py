"""Universal-variable (Stiefel–Scheifele) two-body propagation.

Parity: ``minbody/kepler_solver.py`` — Stumpff c0..c3 via series with
quad-angle argument reduction (:25-46), Newton iteration on chi with
fixed-point / 2-cycle termination (:64-79), f/g and fdot/gdot update
(:80-91).

TPU-first design (SURVEY.md section 7, hard part #3): all loops are
fixed-trip-count with per-lane convergence masking so the solver vmaps
over bodies and over the system batch:

* argument reduction: |z| shrinks 4x per conditional quartering; 40
  static iterations cover |z| up to ~1.2e24 (the reference's while loop
  rarely needs more than ~10),
* Newton: 64 masked iterations matching the reference cap, freezing a
  lane when chi_new == chi or chi_new == prev2 (2-cycle) or f' == 0.

Dimension-parameterised: works for d = 2 or 3 (the reference hard-codes
d = 2 via hypot, kepler_solver.py:53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_REDUCTION_ITERS = 40
_NEWTON_ITERS = 64


def stumpff(z):
    """c0(z), c1(z), c2(z), c3(z) elementwise (kepler_solver.py:25-46)."""
    z = jnp.asarray(z)

    # -- downward argument reduction: quarter z until |z| <= 0.1 --------
    def red_body(_, carry):
        zz, n = carry
        small = jnp.abs(zz) <= 0.1
        zz = jnp.where(small, zz, zz * 0.25)
        n = jnp.where(small, n, n + 1)
        return zz, n

    z_red, n_up = jax.lax.fori_loop(
        0, _REDUCTION_ITERS, red_body, (z, jnp.zeros_like(z, dtype=jnp.int32))
    )

    z2 = z_red * z_red
    c0 = 1 - z_red * 0.5 + z2 / 24 - z_red * z2 / 720 + z2 * z2 / 40320
    c1 = 1 - z_red / 6 + z2 / 120 - z_red * z2 / 5040 + z2 * z2 / 362880
    c2 = 0.5 - z_red / 24 + z2 / 720 - z_red * z2 / 40320
    c3 = 1 / 6 - z_red / 120 + z2 / 5040 - z_red * z2 / 362880

    # -- upward recursion: exact quad-angle identities --------------------
    # c0(4z) = 2 c0^2 - 1,  c1(4z) = c0 c1,
    # c2(4z) = c1^2 / 2,    c3(4z) = (c2 + c0 c3) / 4.
    # NOTE: the reference's recursion (kepler_solver.py:36-45) uses a
    # low-order approximation of these identities (e.g. c0' = 4 c0 - 3)
    # that is only accurate for small z; since the reference restricts
    # itself to |z| <= 0.1 before recursing, both agree in its working
    # regime, but we use the exact identities so the solver stays
    # correct for arbitrarily large |z| (long Kepler drifts).
    def up_body(_, carry):
        zz, n, c0_, c1_, c2_, c3_ = carry
        act = n > 0
        zz_n = jnp.where(act, zz * 4.0, zz)
        c0_n = 2.0 * c0_ * c0_ - 1.0
        c1_n = c0_ * c1_
        c2_n = 0.5 * c1_ * c1_
        c3_n = 0.25 * (c2_ + c0_ * c3_)
        return (
            zz_n,
            jnp.where(act, n - 1, n),
            jnp.where(act, c0_n, c0_),
            jnp.where(act, c1_n, c1_),
            jnp.where(act, c2_n, c2_),
            jnp.where(act, c3_n, c3_),
        )

    _, _, c0, c1, c2, c3 = jax.lax.fori_loop(
        0, _REDUCTION_ITERS, up_body, (z_red, n_up, c0, c1, c2, c3)
    )
    return c0, c1, c2, c3


@jax.jit
def kepler_propagate(r, v, mu, dt):
    """Propagate one two-body state (r, v) for time dt under GM = mu.

    Shapes: r, v — (d,); mu, dt — scalars.  vmap over leading axes for
    per-planet / per-system batching.  Matches _propagate_single
    (kepler_solver.py:48-91) including the r0 < 1e-14 linear-drift
    fallback and the rn == 0 velocity passthrough.
    """
    r = jnp.asarray(r)
    v = jnp.asarray(v)
    dtype = r.dtype

    r0 = jnp.sqrt(jnp.sum(r * r))
    degenerate = r0 < 1e-14
    r0s = jnp.where(degenerate, 1.0, r0)

    vr0 = jnp.dot(r, v) / r0s
    v2 = jnp.dot(v, v)
    alpha = 2.0 / r0s - v2 / mu
    sqrt_mu = jnp.sqrt(mu)

    chi0 = jnp.where(
        jnp.abs(alpha) > 1e-12,
        sqrt_mu * jnp.abs(alpha) * dt,
        sqrt_mu * dt / r0s,
    )

    nan = jnp.asarray(jnp.nan, dtype)

    # Universal Kepler equation (Vallado convention, C = c2, S = c3):
    #   f(chi)  = (r0 vr0/sqrt(mu)) chi^2 c2 + (1 - alpha r0) chi^3 c3
    #             + r0 chi - sqrt(mu) dt
    #   f'(chi) = (r0 vr0/sqrt(mu)) chi (1 - z c3) + (1 - alpha r0) chi^2 c2
    #             + r0                                  (= r(chi))
    # NOTE: the reference's residual shifts the Stumpff indices by one
    # (c1, c2 in place of c2, c3 — kepler_solver.py:69-70), introducing
    # an O(chi^3) error in the converged chi; we solve the correct
    # equation.
    def newton_body(_, carry):
        chi, prev1, prev2, done = carry
        z = alpha * chi * chi
        _c0, _c1, c2, c3 = stumpff(z)
        f = (
            r0s * vr0 / sqrt_mu * chi * chi * c2
            + (1 - alpha * r0s) * chi * chi * chi * c3
            + r0s * chi
            - sqrt_mu * dt
        )
        fp = (
            r0s * vr0 / sqrt_mu * chi * (1 - alpha * chi * chi * c3)
            + (1 - alpha * r0s) * chi * chi * c2
            + r0s
        )
        fp_zero = fp == 0.0
        chi_new = jnp.where(fp_zero, chi, chi - f / jnp.where(fp_zero, 1.0, fp))
        converged = (chi_new == chi) | (chi_new == prev2)
        chi_out = jnp.where(done | fp_zero, chi, chi_new)
        done_out = done | fp_zero | converged
        prev2_out = jnp.where(done, prev2, prev1)
        prev1_out = jnp.where(done, prev1, chi_new)
        return chi_out, prev1_out, prev2_out, done_out

    chi, _, _, _ = jax.lax.fori_loop(
        0, _NEWTON_ITERS, newton_body,
        (chi0, nan, nan, jnp.zeros((), bool)),
    )

    z = alpha * chi * chi
    _c0, c1, c2, c3 = stumpff(z)
    f = 1 - chi * chi * c2 / r0s
    g = dt - chi * chi * chi * c3 / sqrt_mu
    r_vec = f * r + g * v
    rn = jnp.sqrt(jnp.sum(r_vec * r_vec))
    rn_zero = rn == 0.0
    rns = jnp.where(rn_zero, 1.0, rn)
    # fdot = sqrt(mu)/(r r0) * chi * (z c3(z) - 1), z = alpha chi^2.
    # NOTE: the reference writes alpha*chi^2*c3 here
    # (kepler_solver.py:88), i.e. z*c3 without the extra chi — an O(chi)
    # relative velocity error that breaks its own energy conservation on
    # every drift; we use the correct universal-variable expression.
    fdot = sqrt_mu / (rns * r0s) * (alpha * chi * chi * chi * c3 - chi)
    gdot = 1 - chi * chi * c2 / rns
    v_vec = jnp.where(rn_zero, v, fdot * r + gdot * v)

    # degenerate r0: straight-line drift (kepler_solver.py:54-55)
    r_out = jnp.where(degenerate, r + v * dt, r_vec)
    v_out = jnp.where(degenerate, v, v_vec)
    return r_out, v_out


class UniversalVariableKeplerSolver:
    """OO wrapper for API parity (kepler_solver.py:24); `propagate`
    accepts a single (d,) state or an (N, d) batch like the reference
    (:94-107)."""

    def propagate(self, r, v, mu, dt):
        r = jnp.asarray(r)
        v = jnp.asarray(v)
        if r.ndim == 1:
            return kepler_propagate(r, v, mu, dt)
        return _kepler_propagate_batch(r, v, mu, dt)


@jax.jit
def _kepler_propagate_batch(r, v, mu, dt):
    return jax.vmap(lambda ri, vi: kepler_propagate(ri, vi, mu, dt))(r, v)
