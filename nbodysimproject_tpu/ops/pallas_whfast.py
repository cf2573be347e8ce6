"""Fused multi-step batched WHFast (Wisdom–Holman) kernel.

The batched WHFast scan (integrators/whfast.py over parallel/
batch_engine.py) round-trips the state through HBM every substep and
re-dispatches the Kepler drift, Jacobi transforms, and interaction
kick as separate XLA ops.  For the few-body regime this kernel keeps
a lane-block of the batch resident in VMEM and advances it ``n_steps``
whole Wisdom–Holman steps in-register — the same design as the fused
Verlet/yoshida4 (ops/pallas_batch.py) and ham_soft
(ops/pallas_hamsoft.py) kernels, completing fused coverage of all
four reference integrator modes (minbody/sim_config.py:19).

In-kernel pieces (all elementwise on (8, L) blocks, bodies unrolled):

* Jacobi transforms — closed-form prefix sums over the unrolled body
  axis (whfast.py:30-71; reference loops at simulation.py:487-534);
* Kepler drift — fixed-depth Laguerre–Conway universal-variable solve,
  the exact math of ``ops/kepler.py::kepler_propagate_fixed``
  (closed-form Stumpff with series window, Vallado hyperbolic seed,
  n = 5 Laguerre updates, f/g epilogue), ported ref-to-register;
* interaction kick — softened direct acceleration plus the Jacobi
  back-reaction suffix sum (whfast.py:154-188).

Step fusion: one WH step is D(h/2) K(h) D(h/2); consecutive interior
half-drifts merge, so the loop runs [K(h) D(h)] with single half
drifts at the two ends — n_steps + 1 Kepler solves instead of
2 n_steps.

Mosaic toolchain rules as in ops/pallas_kernels.py: rank-2 blocks,
float32, trace under an x64-disabled scope, flat single fori loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_SUB = 8  # VPU sublanes
_SERIES_CUTOFF = 0.3
_LAGUERRE_N = 5.0


def _stumpff23(z):
    """c2(z), c3(z) and the (1 - z c2), (1 - z c3) helpers, elementwise
    float32 blocks — same branch structure as ops/kepler.py::stumpff
    (closed form + series window |z| <= 0.3), with cosh/sinh expressed
    through exp (the Mosaic-supported primitive) and the f32 overflow
    clamp at s ~ 88 (kepler.py:76-81)."""
    f32 = np.float32
    small = jnp.abs(z) <= f32(_SERIES_CUTOFF)

    zs = jnp.where(small, z, f32(0.0))
    z2 = zs * zs
    z3 = z2 * zs
    z4 = z2 * z2
    z5 = z4 * zs
    c2_s = (f32(0.5) - zs / f32(24.0) + z2 / f32(720.0) - z3 / f32(40320.0)
            + z4 / f32(3628800.0) - z5 / f32(479001600.0))
    c3_s = (f32(1.0 / 6.0) - zs / f32(120.0) + z2 / f32(5040.0)
            - z3 / f32(362880.0) + z4 / f32(39916800.0)
            - z5 / f32(6227020800.0))

    pos = z > f32(0.0)
    s_e = jnp.sqrt(jnp.where(pos, z, f32(1.0)))
    s_h = jnp.minimum(jnp.sqrt(jnp.where(pos, f32(1.0), -z)), f32(88.0))
    e_h = jnp.exp(s_h)
    inv_e = f32(1.0) / e_h
    c0 = jnp.where(pos, jnp.cos(s_e), f32(0.5) * (e_h + inv_e))
    c1 = jnp.where(pos, jnp.sin(s_e) / s_e,
                   f32(0.5) * (e_h - inv_e) / s_h)
    z_safe = jnp.where(small, f32(1.0), z)
    c2 = jnp.where(small, c2_s, (f32(1.0) - c0) / z_safe)
    c3 = jnp.where(small, c3_s, (f32(1.0) - c1) / z_safe)
    return c2, c3


def _kepler_lc_blocks(r, v, mu, dt, iters):
    """Laguerre–Conway universal-variable propagation on per-coordinate
    blocks.  ``r``, ``v``: lists of dim (8, L) blocks; ``mu`` a block;
    ``dt`` a float.  Exact port of kepler.py::kepler_propagate_fixed.
    """
    f32 = np.float32
    dim = len(r)
    dtf = f32(dt)

    r0sq = r[0] * r[0]
    rv = r[0] * v[0]
    v2 = v[0] * v[0]
    for a in range(1, dim):
        r0sq = r0sq + r[a] * r[a]
        rv = rv + r[a] * v[a]
        v2 = v2 + v[a] * v[a]
    r0 = jnp.sqrt(r0sq)
    degenerate = r0 < f32(1e-14)
    r0s = jnp.where(degenerate, f32(1.0), r0)
    vr0 = rv / r0s
    alpha = f32(2.0) / r0s - v2 / mu
    sqrt_mu = jnp.sqrt(mu)

    chi0 = jnp.where(jnp.abs(alpha) > f32(1e-12),
                     sqrt_mu * jnp.abs(alpha) * dtf,
                     sqrt_mu * dtf / r0s)
    # Vallado's logarithmic hyperbolic seed (kepler.py:244-258)
    hyp = alpha < f32(-1e-12)
    alpha_h = jnp.where(hyp, alpha, f32(-1.0))
    sgn_dt = f32(1.0) if dt >= 0.0 else f32(-1.0)
    log_num = f32(-2.0) * mu * alpha_h * dtf
    log_den = (r0s * vr0
               + sgn_dt * jnp.sqrt(-mu / alpha_h) * (f32(1.0)
                                                     - r0s * alpha_h))
    log_arg = log_num / jnp.where(log_den == f32(0.0), f32(1.0), log_den)
    hyp_ok = hyp & (log_den != f32(0.0)) & (log_arg > f32(0.0))
    chi0_hyp = sgn_dt * jnp.sqrt(f32(-1.0) / alpha_h) * \
        jnp.log(jnp.where(hyp_ok, log_arg, f32(1.0)))
    chi = jnp.where(hyp_ok, chi0_hyp, chi0)

    a1 = r0s * vr0 / sqrt_mu
    a2 = f32(1.0) - alpha * r0s
    ln = f32(_LAGUERRE_N)
    smudt = sqrt_mu * dtf
    for _ in range(iters):
        z = alpha * chi * chi
        c2, c3 = _stumpff23(z)
        chi2 = chi * chi
        f = a1 * chi2 * c2 + a2 * chi2 * chi * c3 + r0s * chi - smudt
        fp = a1 * chi * (f32(1.0) - z * c3) + a2 * chi2 * c2 + r0s
        fpp = a1 * (f32(1.0) - z * c2) + a2 * chi * (f32(1.0) - z * c3)
        disc = jnp.sqrt(jnp.abs((ln - f32(1.0)) ** 2 * fp * fp
                                - ln * (ln - f32(1.0)) * f * fpp))
        den = fp + jnp.where(fp >= f32(0.0), disc, -disc)
        den_bad = den == f32(0.0)
        step = ln * f / jnp.where(den_bad, f32(1.0), den)
        chi = chi - jnp.where(den_bad, f32(0.0), step)

    # f/g epilogue (kepler.py:115-137)
    z = alpha * chi * chi
    c2, c3 = _stumpff23(z)
    chi2 = chi * chi
    ff = f32(1.0) - chi2 * c2 / r0s
    gg = dtf - chi2 * chi * c3 / sqrt_mu
    r_new = [ff * r[a] + gg * v[a] for a in range(dim)]
    rn2 = r_new[0] * r_new[0]
    for a in range(1, dim):
        rn2 = rn2 + r_new[a] * r_new[a]
    rn = jnp.sqrt(rn2)
    rn_zero = rn == f32(0.0)
    rns = jnp.where(rn_zero, f32(1.0), rn)
    fdot = sqrt_mu / (rns * r0s) * (alpha * chi2 * chi * c3 - chi)
    gdot = f32(1.0) - chi2 * c2 / rns
    v_new = [jnp.where(rn_zero, v[a], fdot * r[a] + gdot * v[a])
             for a in range(dim)]
    r_out = [jnp.where(degenerate, r[a] + v[a] * dtf, r_new[a])
             for a in range(dim)]
    v_out = [jnp.where(degenerate, v[a], v_new[a]) for a in range(dim)]
    return r_out, v_out


def _whfast_multistep_kernel(pos_ref, vel_ref, mass_ref, eps2_ref,
                             out_pos_ref, out_vel_ref, *, n: int, dim: int,
                             n_steps: int, h: float, G: float, iters: int):
    f32 = np.float32
    nd = n * dim
    pos = [pos_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    vel = [vel_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    mass = [mass_ref[i * _SUB:(i + 1) * _SUB, :] for i in range(n)]
    eps2 = eps2_ref[...]
    Gf = f32(G)

    # cumulative interior masses and Kepler mu_i = G cum_i (constant)
    cm = [mass[0]]
    for i in range(1, n):
        cm.append(cm[-1] + mass[i])
    inv_cm = [f32(1.0) / c for c in cm]
    mu = [Gf * c for c in cm]
    live = [mass[i] > f32(0.0) for i in range(n)]
    msafe = [jnp.where(live[i], mass[i], f32(1.0)) for i in range(n)]

    def to_jacobi(x):
        """Cartesian coordinate blocks -> Jacobi blocks (whfast.py:30)."""
        jx = list(x)
        Rs = [mass[0] * x[a] for a in range(dim)]
        for i in range(1, n):
            for a in range(dim):
                jx[i * dim + a] = x[i * dim + a] - Rs[a] * inv_cm[i - 1]
            if i < n - 1:
                for a in range(dim):
                    Rs[a] = Rs[a] + mass[i] * x[i * dim + a]
        return jx

    def from_jacobi(jx):
        """Jacobi blocks -> Cartesian via the telescoped prefix sum
        pos_i = j_i + sum_{k<i} m_k j_k / M_k (whfast.py:51-71)."""
        x = [None] * nd
        s = [jnp.zeros_like(jx[0]) for _ in range(dim)]
        for i in range(n):
            for a in range(dim):
                x[i * dim + a] = jx[i * dim + a] + s[a]
            if i < n - 1:
                w = mass[i] * inv_cm[i]
                for a in range(dim):
                    s[a] = s[a] + w * jx[i * dim + a]
        return x

    def kepler_drift(pos, vel, dt):
        """D(dt): the COM drifts linearly, planets on Kepler orbits
        with mu_i = G cum_i — the COM-anchored (exactly symplectic)
        convention of whfast.py:74-124: reconstruct with slot 0 zeroed,
        then translate so the COM lands on its free drift."""
        jp = to_jacobi(pos)
        jv = to_jacobi(vel)
        dtf = f32(dt)
        invM = inv_cm[n - 1]
        comq = []
        comv = []
        for a in range(dim):
            sq = mass[0] * pos[a]
            sv = mass[0] * vel[a]
            for i in range(1, n):
                sq = sq + mass[i] * pos[i * dim + a]
                sv = sv + mass[i] * vel[i * dim + a]
            comq.append(sq * invM)
            comv.append(sv * invM)
        for a in range(dim):  # gauge: slot 0 zeroed before reconstruction
            jp[a] = jnp.zeros_like(jp[a])
            jv[a] = jnp.zeros_like(jv[a])
        for i in range(1, n):
            sl = slice(i * dim, (i + 1) * dim)
            r_i, v_i = _kepler_lc_blocks(jp[sl], jv[sl], mu[i], dt, iters)
            jp[sl] = r_i
            jv[sl] = v_i
        x = from_jacobi(jp)
        v = from_jacobi(jv)
        for a in range(dim):
            sq = mass[0] * x[a]
            sv = mass[0] * v[a]
            for i in range(1, n):
                sq = sq + mass[i] * x[i * dim + a]
                sv = sv + mass[i] * v[i * dim + a]
            dq = comq[a] + comv[a] * dtf - sq * invM
            dv = comv[a] - sv * invM
            for i in range(n):
                x[i * dim + a] = x[i * dim + a] + dq
                v[i * dim + a] = v[i * dim + a] + dv
        return x, v

    def accel(pos):
        """a_int = -grad V_int / m: softened direct acceleration plus
        the Jacobi back-reaction suffix sum (whfast.py:154-188)."""
        acc = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        # direct part (pair loop; masked slots carry zero mass)
        for i in range(n):
            for j in range(i + 1, n):
                r2 = eps2
                dxs = []
                for a in range(dim):
                    dx = pos[i * dim + a] - pos[j * dim + a]
                    dxs.append(dx)
                    r2 = r2 + dx * dx
                # masked pairs sit at the same padded point: floor r2
                # so rsqrt(0) cannot poison the (mass-zero) lanes
                inv_r = jax.lax.rsqrt(jnp.maximum(r2, f32(1e-30)))
                w = inv_r * inv_r * inv_r
                wi = (Gf * mass[j]) * w
                wj = (Gf * mass[i]) * w
                for a in range(dim):
                    acc[i * dim + a] = acc[i * dim + a] - wi * dxs[a]
                    acc[j * dim + a] = acc[j * dim + a] + wj * dxs[a]
        # Kepler-part gradient: w_i = G m_i jac_i / (|jac_i|^2+eps2)^3/2,
        # grad_k V_kep / m_k = (Mprev_k / m_k) w_k - sum_{i>k} w_i
        jp = to_jacobi(pos)
        wvec = [None] * nd  # per planet, zero for body 0
        for a in range(dim):
            wvec[a] = jnp.zeros_like(pos[0])
        for i in range(1, n):
            jr2 = eps2
            for a in range(dim):
                jr2 = jr2 + jp[i * dim + a] * jp[i * dim + a]
            inv_jr = jax.lax.rsqrt(jnp.maximum(jr2, f32(1e-30)))
            wfac = jnp.where(live[i], Gf * mass[i] * inv_jr * inv_jr
                             * inv_jr, f32(0.0))
            for a in range(dim):
                wvec[i * dim + a] = wfac * jp[i * dim + a]
        # suffix sums S_k = sum_{i>k} w_i, accumulated in reverse
        S = [jnp.zeros_like(pos[0]) for _ in range(dim)]
        for i in range(n - 1, -1, -1):
            mprev_over_m = jnp.where(
                live[i],
                (cm[i - 1] if i >= 1 else jnp.ones_like(mass[0])) / msafe[i],
                f32(0.0))
            for a in range(dim):
                acc[i * dim + a] = jnp.where(
                    live[i],
                    acc[i * dim + a] + mprev_over_m * wvec[i * dim + a]
                    - S[a], f32(0.0))
                S[a] = S[a] + wvec[i * dim + a]
        return acc

    hf = f32(h)

    def body(_, carry):
        pos = list(carry[:nd])
        vel = list(carry[nd:])
        acc = accel(pos)
        vel = [v + hf * a for v, a in zip(vel, acc)]
        pos, vel = kepler_drift(pos, vel, h)
        return tuple(pos) + tuple(vel)

    # D(h/2) [K(h) D(h)]^{n_steps-1} K(h) D(h/2)
    pos, vel = kepler_drift(pos, vel, 0.5 * h)
    out = jax.lax.fori_loop(np.int32(0), np.int32(n_steps - 1), body,
                            tuple(pos) + tuple(vel))
    pos, vel = list(out[:nd]), list(out[nd:])
    acc = accel(pos)
    vel = [v + hf * a for v, a in zip(vel, acc)]
    pos, vel = kepler_drift(pos, vel, 0.5 * h)

    for k in range(nd):
        out_pos_ref[k * _SUB:(k + 1) * _SUB, :] = pos[k]
        out_vel_ref[k * _SUB:(k + 1) * _SUB, :] = vel[k]


def _fold(x):  # (B,) -> (8, B/8)
    B = x.shape[0]
    return x.reshape(_SUB, B // _SUB)


def whfast_multistep(pos, vel, mass, eps2, *, h: float, G: float,
                     n_steps: int, iters: int = 8, lanes: int = 256,
                     interpret: bool = False):
    """Advance a (B, N, d) float32 batch ``n_steps`` Wisdom–Holman
    steps entirely in VMEM.  ``eps2``: (B,) squared softening per
    system (the interaction splitting keeps it, whfast.py:104-143;
    the facade path always passes 0).  Bodies must be ordered with the
    dominant mass first (Jacobi convention).  B must be a multiple of
    8 * lanes.  Returns (pos, vel)."""
    B, n, dim = pos.shape
    nd = n * dim
    assert n_steps >= 1

    def run():
        pos_c = jnp.concatenate(
            [_fold(pos[:, i, a]) for i in range(n) for a in range(dim)], 0)
        vel_c = jnp.concatenate(
            [_fold(vel[:, i, a]) for i in range(n) for a in range(dim)], 0)
        mass_c = jnp.concatenate([_fold(mass[:, i]) for i in range(n)], 0)
        eps2_c = _fold(eps2)

        kernel = functools.partial(_whfast_multistep_kernel, n=n, dim=dim,
                                   n_steps=n_steps, h=h, G=G, iters=iters)
        L = B // _SUB
        grid = (L // lanes,)
        bs = lambda rows: pl.BlockSpec((rows, lanes), lambda i: (0, i))
        out_pos, out_vel = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(nd * _SUB), bs(nd * _SUB), bs(n * _SUB), bs(_SUB)],
            out_specs=(bs(nd * _SUB), bs(nd * _SUB)),
            out_shape=(jax.ShapeDtypeStruct((nd * _SUB, L), pos.dtype),
                       jax.ShapeDtypeStruct((nd * _SUB, L), pos.dtype)),
            interpret=interpret,
        )(pos_c, vel_c, mass_c, eps2_c)

        def unfold(block):
            coords = [block[k * _SUB:(k + 1) * _SUB, :].reshape(B)
                      for k in range(nd)]
            return jnp.stack(coords, axis=1).reshape(B, n, dim)

        return unfold(out_pos), unfold(out_vel)

    if interpret:
        return run()
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        return run()


@functools.partial(jax.jit, static_argnames=("h", "G", "n_steps", "iters",
                                             "lanes"))
def whfast_multistep_jit(pos, vel, mass, eps2, h, G, n_steps, iters=8,
                         lanes=256):
    return whfast_multistep(pos, vel, mass, eps2, h=h, G=G, n_steps=n_steps,
                            iters=iters, lanes=lanes)
