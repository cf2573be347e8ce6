"""Universal-variable (Stiefel–Scheifele) two-body propagation.

Parity: ``minbody/kepler_solver.py`` — Stumpff c0..c3 via series with
quad-angle argument reduction (:25-46), Newton iteration on chi with
fixed-point / 2-cycle termination (:64-79), f/g and fdot/gdot update
(:80-91).

TPU-first design (SURVEY.md section 7, hard part #3): bounded control
flow with per-lane convergence masking so the solver vmaps over bodies
and over the system batch:

* Stumpff functions in closed form — trig for z > 0, hyperbolic for
  z < 0, series near zero — instead of the reference's series +
  quad-angle recursion (kepler_solver.py:25-46).  The recursion costs
  ~80 sequential loop iterations per evaluation inside the Newton
  loop; the closed form is O(1).  In float64 it is usable to the same
  |z| ~ 5e5 where the recursion's repeated c0 -> 2 c0^2 - 1 squaring
  would overflow; in float32 cosh/sinh saturate near |z| ~ 7.7e3, so
  the hyperbolic argument is clamped there (saturated lanes return
  huge-but-finite values instead of inf propagating to c2/c3),
* Newton: while_loop capped at 64 iterations (the reference cap),
  freezing a lane when chi_new == chi or chi_new == prev2 (2-cycle) or
  f' == 0; under vmap the loop exits when every lane is frozen
  (typical Kepler drifts converge in <= 7 iterations).

Dimension-parameterised: works for d = 2 or 3 (the reference hard-codes
d = 2 via hypot, kepler_solver.py:53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEWTON_ITERS = 64
_SERIES_CUTOFF = 0.3


def stumpff(z):
    """c0(z), c1(z), c2(z), c3(z) elementwise (kepler_solver.py:25-46).

    Closed form: for z > 0 (elliptic) c0 = cos(s), c1 = sin(s)/s with
    s = sqrt(z); for z < 0 (hyperbolic) the cosh/sinh analogues; and
    c2 = (1 - c0)/z, c3 = (1 - c1)/z.  Near zero those quotients
    cancel catastrophically, so |z| <= 0.3 uses the Taylor series
    (truncation < 3e-15 at the cutoff).  Replaces the reference's
    series + quad-angle recursion, which is both approximate
    (kepler_solver.py:36-45 uses low-order identities) and ~80
    sequential iterations per call.
    """
    z = jnp.asarray(z)
    small = jnp.abs(z) <= _SERIES_CUTOFF

    # ---- series branch (argument zeroed where unused) -------------------
    zs = jnp.where(small, z, 0.0)
    z2 = zs * zs
    z3 = z2 * zs
    z4 = z2 * z2
    z5 = z4 * zs
    z6 = z4 * z2
    c0_s = (1 - zs / 2 + z2 / 24 - z3 / 720 + z4 / 40320 - z5 / 3628800
            + z6 / 479001600)
    c1_s = (1 - zs / 6 + z2 / 120 - z3 / 5040 + z4 / 362880
            - z5 / 39916800 + z6 / 6227020800)
    c2_s = (0.5 - zs / 24 + z2 / 720 - z3 / 40320 + z4 / 3628800
            - z5 / 479001600)
    c3_s = (1 / 6 - zs / 120 + z2 / 5040 - z3 / 362880 + z4 / 39916800
            - z5 / 6227020800)

    # ---- closed-form branch (safe sqrt arguments where unused) ----------
    pos = z > 0
    s_e = jnp.sqrt(jnp.where(pos, z, 1.0))
    s_h = jnp.sqrt(jnp.where(pos, 1.0, -z))
    # cosh/sinh overflow at s ~ 710 in f64 (|z| ~ 5e5) but already at
    # s ~ 88 in f32 (|z| ~ 7.7e3); clamp so a saturated hyperbolic lane
    # yields a huge finite c0/c1 (the Newton step still pulls chi back)
    # rather than inf -> nan in the c2/c3 quotients
    s_cap = 700.0 if z.dtype == jnp.float64 else 88.0
    s_h = jnp.minimum(s_h, jnp.asarray(s_cap, z.dtype))
    c0_t = jnp.where(pos, jnp.cos(s_e), jnp.cosh(s_h))
    c1_t = jnp.where(pos, jnp.sin(s_e) / s_e, jnp.sinh(s_h) / s_h)
    z_safe = jnp.where(small, 1.0, z)
    c2_t = (1.0 - c0_t) / z_safe
    c3_t = (1.0 - c1_t) / z_safe

    return (
        jnp.where(small, c0_s, c0_t),
        jnp.where(small, c1_s, c1_t),
        jnp.where(small, c2_s, c2_t),
        jnp.where(small, c3_s, c3_t),
    )


def _kepler_prologue(r, v, mu, dt):
    """Shared setup: orbit invariants and the Newton/Halley seed."""
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
    return r0s, degenerate, vr0, alpha, sqrt_mu, chi0


def _kepler_epilogue(r, v, mu, dt, chi, r0s, degenerate, alpha, sqrt_mu):
    """Shared f/g + fdot/gdot update from the converged chi."""
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

    r0s, degenerate, vr0, alpha, sqrt_mu, chi0 = _kepler_prologue(
        r, v, mu, dt)

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
    def newton_cond(carry):
        _chi, _p1, _p2, done, it = carry
        return jnp.logical_and(it < _NEWTON_ITERS, jnp.logical_not(done))

    def newton_body(carry):
        chi, prev1, prev2, done, it = carry
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
        return chi_out, prev1_out, prev2_out, done_out, it + 1

    # while_loop (not fori): a typical Kepler drift converges in <= 7
    # iterations, so the early exit saves ~90% of the Newton work; under
    # vmap the loop runs until every lane is frozen, with the reference's
    # 64-iteration cap as the bound (kepler_solver.py:66).
    chi, _, _, _, _ = jax.lax.while_loop(
        newton_cond, newton_body,
        (chi0, nan, nan, jnp.zeros((), bool), jnp.zeros((), jnp.int32)),
    )

    return _kepler_epilogue(r, v, mu, dt, chi, r0s, degenerate, alpha,
                            sqrt_mu)


@functools.partial(jax.jit, static_argnames=("iters",))
def kepler_propagate_fixed(r, v, mu, dt, iters: int = 8):
    """Fixed-depth Laguerre–Conway variant of :func:`kepler_propagate`.

    The adaptive solver's ``while_loop`` gates every vmapped lane on
    the WORST lane's Newton count — at N = 4096 planets that
    sequential depth dominated the WHFast drift (ROADMAP round-2
    measurement: ~2 ms/step was the per-lane Newton gating).  This
    variant runs a FIXED ``iters`` Laguerre–Conway updates (Conway
    1986 — the practically-globally-convergent root iteration for the
    universal Kepler equation, n = 5 as in Danby/SWIFT) with no
    convergence branch: converged lanes take f ~ 0 so further updates
    are exact no-ops, and the unrolled loop exposes all lanes' work to
    the VPU with no cross-lane control flow.

        chi -= n f / (f' + sgn(f') sqrt(|(n-1)^2 f'^2 - n(n-1) f f''|))

    with f''(chi) = (r0 vr0/sqrt(mu))(1 - z c2)
    + (1 - alpha r0) chi (1 - z c3) (from d/dchi[chi^2 c2] =
    chi(1 - z c3), d/dchi[chi^3 c3] = chi^2 c2).  Unlike plain
    Newton/Halley it does not blow through pericenter passages where
    f' = r ~ 0, so multi-period drifts converge from the same seed.
    Typical WHFast drifts converge in <= 4 iterations; ``iters`` = 8
    leaves 2x headroom and is still ~8x shallower than the
    worst-lane-gated 64-cap loop.
    """
    r = jnp.asarray(r)
    v = jnp.asarray(v)

    r0s, degenerate, vr0, alpha, sqrt_mu, chi0 = _kepler_prologue(
        r, v, mu, dt)

    # The generic seed sqrt(mu)|alpha|dt lands exponentially far from
    # the root on strongly hyperbolic orbits (f ~ e^{sqrt(-alpha) chi},
    # so an overshoot of s costs ~s corrective iterations — fine for
    # the 64-cap adaptive loop, fatal at fixed depth).  Use Vallado's
    # logarithmic hyperbolic seed (Alg. 8) there instead:
    #   chi0 = sgn(dt) sqrt(-1/alpha)
    #          * ln[ -2 mu alpha dt / (r.v + sgn(dt) sqrt(-mu/alpha)
    #                                  (1 - r0 alpha)) ]
    hyp = alpha < -1e-12
    alpha_h = jnp.where(hyp, alpha, -1.0)
    sgn_dt = jnp.where(dt >= 0.0, 1.0, -1.0)
    log_num = -2.0 * mu * alpha_h * dt
    log_den = (r0s * vr0
               + sgn_dt * jnp.sqrt(-mu / alpha_h) * (1.0 - r0s * alpha_h))
    log_arg = log_num / jnp.where(log_den == 0.0, 1.0, log_den)
    hyp_ok = hyp & (log_den != 0.0) & (log_arg > 0.0)
    chi0_hyp = sgn_dt * jnp.sqrt(-1.0 / alpha_h) * \
        jnp.log(jnp.where(hyp_ok, log_arg, 1.0))
    chi0 = jnp.where(hyp_ok, chi0_hyp, chi0)

    a1 = r0s * vr0 / sqrt_mu
    a2 = 1 - alpha * r0s
    ln = 5.0  # Laguerre order (Conway 1986)

    def body(_i, chi):
        z = alpha * chi * chi
        _c0, _c1, c2, c3 = stumpff(z)
        chi2 = chi * chi
        f = a1 * chi2 * c2 + a2 * chi2 * chi * c3 + r0s * chi \
            - sqrt_mu * dt
        fp = a1 * chi * (1 - z * c3) + a2 * chi2 * c2 + r0s
        fpp = a1 * (1 - z * c2) + a2 * chi * (1 - z * c3)
        disc = jnp.sqrt(jnp.abs((ln - 1.0) ** 2 * fp * fp
                                - ln * (ln - 1.0) * f * fpp))
        den = fp + jnp.where(fp >= 0.0, disc, -disc)
        den_bad = den == 0.0
        step = ln * f / jnp.where(den_bad, 1.0, den)
        return chi - jnp.where(den_bad, 0.0, step)

    chi = jax.lax.fori_loop(0, iters, body, chi0, unroll=True)

    return _kepler_epilogue(r, v, mu, dt, chi, r0s, degenerate, alpha,
                            sqrt_mu)


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
