"""Fused multi-step ham_soft integrator kernel.

The flagship integrator's batched scan round-trips ~20 (B, N, N)
intermediates through HBM per Strang substep; this kernel keeps a tile
of the batch resident in VMEM and advances it whole macro steps
in-register (VERDICT round-1 item 8; same layout rules as
``pallas_batch.py``: batch folded to (8, L) VPU tiles per coordinate,
body/coordinate loops unrolled, rank-2 everything, int32 indices,
float32, traced under an x64-disabled scope).

Covered configuration — the dataset pipeline's default:
* soft barrier policy (``use_soft_barrier`` on, barrier exponent
  static), production SPH eps* with the exact AD gradient
  (``eps_grad_mode='exact'``), J-cap, per-system dynamic ``n_sub``
  under a static ``n_sub_max`` (bucketed), cross-substep (eps*, grad)
  cache.

The eps* gradient is obtained by calling ``jax.vjp`` on the in-kernel
eps* function: AD runs at trace time, so Mosaic only ever sees the
resulting elementwise block ops — the same reverse-through-8-iterations
gradient as the XLA path (ops/eps_model.py), with one documented
deviation: the global convergence freeze is dropped (all 8 iterations
always run), which perturbs eps* by at most the 1e-6 freeze tolerance —
below float32 resolution.

Reference counterpart: the hot loop chunks of
hamiltonian_softening_integrator.py:496-557 + hamsoft_stepper.py:247-308.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


_SUB = 8  # VPU sublanes


def _build_physics(n: int, dim: int, mass, valid, inv_m, k_s, mu, alpha,
                   flo, cap, eps_seed, G: float, k_wall: float, eta: float,
                   jcap: float, bexp: int, policy: str = "soft",
                   grad_mode: str = "exact", lam_align: float = 0.3,
                   clamp_bounds=None):
    """Construct the in-kernel ham_soft physics closures over a set of
    (8, L) VPU blocks.  Shared by the plain multi-step kernel and the
    MEGNO-fused kernel so the two cannot drift apart.

    ``policy``: "soft" — smooth wall kicks on pi (the round-2 covered
    configuration); "reflection" — closed-form triangle folds of
    (eps, pi) around each flow (integrators/hamsoft.py refl branches;
    reference HSI:447-484 + hamsoft_utils.py:159-184).
    ``grad_mode``: "exact" — AD gradient of the truncated eps* map;
    "reference" — the bug-compatible fallback: when the exact gradient
    degenerates, substitute the Omega-corrected SPH gradient
    sign-aligned against the legacy one (ops/eps_model.py:308-358).
    ``clamp_bounds``: optional (a, b) blocks replicating the XLA path's
    soft-policy value clamp (ops/eps_model.py:233-235): eps* is clipped
    to [a, b] and the exact gradient is gated to zero where the clip
    saturates — BEFORE the "reference" degeneracy test, so a saturated
    lane falls back to the Omega gradient exactly like the XLA path."""
    nd = n * dim
    f32 = jnp.float32

    Gf = np.float32(G)
    kw = np.float32(k_wall)
    etaf = np.float32(eta)
    jcapf = np.float32(jcap)
    inv_pi = np.float32(1.0 / math.pi)

    def pair_r2(pos):
        r2 = {}
        for i in range(n):
            for j in range(i + 1, n):
                acc = jnp.zeros_like(pos[0])
                for a in range(dim):
                    dx = pos[i * dim + a] - pos[j * dim + a]
                    acc = acc + dx * dx
                r2[(i, j)] = acc
        return r2

    # ---------------- eps* (SPH softmin; ops/eps_model.py) -------------
    mval = [jnp.where(v, mm, 0.0) for mm, v in zip(mass, valid)]

    def _sigma_terms_at(r2, hi, i):
        """(S_i, Sd_i, W_ij list) at smoothing length hi for body i."""
        ih2 = 1.0 / jnp.maximum(hi * hi, 1e-24)
        S = jnp.zeros_like(hi)
        Sd = jnp.zeros_like(hi)
        Ws = {}
        for j in range(n):
            if j == i:
                continue
            key = (i, j) if i < j else (j, i)
            w = inv_pi * ih2 * jnp.exp(-r2[key] * ih2)
            Ws[j] = w
            S = S + mval[j] * w
            # dW/dh = W * (-2/h + 2 r^2 / h^3)
            Sd = Sd + mval[j] * w * (-2.0 + 2.0 * r2[key] * ih2) \
                / jnp.maximum(hi, 1e-12)
        return S, Sd, Ws

    def _solve_iterates(pos, r2):
        """Run the 8 SPH iterations, returning every iterate
        [h_0, ..., h_8] (each a list of n blocks) — the only stored
        state; kernel matrices are recomputed in the reverse sweep
        (hand-written remat: Mosaic cannot lower jax.checkpoint, and
        storing AD residuals blows the 16M scoped-VMEM budget)."""
        # SPH h_i seed: the kernel-entry eps (the fixed point is
        # seed-insensitive at 8 iterations; keeping the entry value
        # matches the original single-kernel behaviour exactly)
        h0 = jnp.clip(eps_seed, flo, cap)
        iters = [[h0 for _ in range(n)]]
        for _ in range(8):
            prev = iters[-1]
            new = []
            for i in range(n):
                S, _, _ = _sigma_terms_at(r2, prev[i], i)
                hn = etaf * jnp.sqrt(mval[i] / jnp.maximum(S, 1e-30))
                new.append(jnp.clip(hn, flo, cap))
            iters.append(new)
        return iters

    def eps_star_of(h_final):
        t = [jnp.where(v, -x / alpha, f32(-1e30))
             for x, v in zip(h_final, valid)]
        tmax = t[0]
        for x in t[1:]:
            tmax = jnp.maximum(tmax, x)
        s = jnp.zeros_like(tmax)
        for x in t:
            s = s + jnp.exp(x - tmax)
        es = -alpha * (tmax + jnp.log(s))
        omega = [jnp.exp(x - tmax) / s for x in t]  # d es / d h_i
        return es, omega

    def _exact_grad(pos, r2, iters, u):
        """Reverse sweep through the truncated solve (grad_ad)."""
        g_q = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        # reverse sweep: h_k = clip(G_i(h_{k-1})) with a DIAGONAL
        # Jacobian (Sigma_i depends only on h_i), so the cotangent on
        # h stays per-body; kernel sums are recomputed at h_{k-1}
        for k in range(8, 0, -1):
            h_prev = iters[k - 1]
            u_new = []
            for i in range(n):
                S, Sd, Ws = _sigma_terms_at(r2, h_prev[i], i)
                Ssafe = jnp.maximum(S, 1e-30)
                G_raw = etaf * jnp.sqrt(mval[i] / Ssafe)
                gate = (G_raw > flo) & (G_raw < cap)
                ui = jnp.where(gate, u[i], 0.0)
                # dG/dS = -G_raw / (2 S)
                c = ui * (-G_raw / (2.0 * Ssafe))
                # finite-guard like the XLA path's sanitizer: the
                # float32 backward overflows on saturated lanes where
                # the true gradient is exactly zero
                c = jnp.where(jnp.isfinite(c), c, 0.0)
                # dS/dq and dS/dh
                ih2 = 1.0 / jnp.maximum(h_prev[i] * h_prev[i], 1e-24)
                for j in range(n):
                    if j == i:
                        continue
                    key = (i, j) if i < j else (j, i)
                    coeff = c * mval[j] * Ws[j] * (-2.0 * ih2)
                    for a in range(dim):
                        d = pos[i * dim + a] - pos[j * dim + a]
                        g_q[i * dim + a] = g_q[i * dim + a] + coeff * d
                        g_q[j * dim + a] = g_q[j * dim + a] - coeff * d
                u_new.append(c * Sd)
            u = u_new

        return [jnp.where(valid[k // dim] & jnp.isfinite(g), g, 0.0)
                for k, g in enumerate(g_q)]

    def _omega_grad(pos, r2, h_final):
        """Omega-corrected SPH fallback gradient
        (ops/eps_model.py:237-298 production_grad_omega), on the
        clamped final iterate with the XLA path's h floor."""
        # softmax weights of the softmin over h
        _es, omega_w = eps_star_of(h_final)
        h_clamp_min = jnp.maximum(1e-12, 0.1 * jnp.maximum(flo, 1e-12))
        g_q = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        for i in range(n):
            hj = jnp.maximum(h_final[i], h_clamp_min)
            S, Sd, Ws = _sigma_terms_at(r2, hj, i)
            Ssafe = jnp.maximum(S, 1e-30)
            Om = 1.0 + hj * Sd / (2.0 * Ssafe)
            Om = jnp.where(jnp.isfinite(Om) & (Om != 0.0), Om, 1.0)
            P = -hj / (2.0 * Ssafe * Om)
            s_i = -omega_w[i] * P
            ih2 = 1.0 / jnp.maximum(hj * hj, 1e-24)
            for j in range(n):
                if j == i:
                    continue
                key = (i, j) if i < j else (j, i)
                coeff = s_i * mval[j] * Ws[j] * (-2.0 * ih2)
                for a in range(dim):
                    d = pos[i * dim + a] - pos[j * dim + a]
                    g_q[i * dim + a] = g_q[i * dim + a] + coeff * d
                    g_q[j * dim + a] = g_q[j * dim + a] - coeff * d
        return [jnp.where(valid[k // dim] & jnp.isfinite(g), g, 0.0)
                for k, g in enumerate(g_q)]

    def _legacy_grad(pos, r2):
        """Legacy harmonic-mean gradient with the reference's sign
        convention (ops/softening.py:41-59), for the sign alignment."""
        lam = np.float32(lam_align)
        delta = np.float32(1.0e-12)
        inv_sum = jnp.zeros_like(pos[0])
        rs = {}
        for (i, j), rr in r2.items():
            r = jnp.sqrt(rr)
            rs[(i, j)] = r
            vp = valid[i] & valid[j]
            inv_sum = inv_sum + jnp.where(vp, 1.0 / (r + delta), 0.0)
        D = inv_sum  # i<j sum
        M = jnp.zeros_like(pos[0])
        for v in valid:
            M = M + jnp.where(v, 1.0, 0.0)
        Dsafe = jnp.maximum(D, 1e-30)
        c_pref = lam * M / (Dsafe * Dsafe)
        g_q = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        for (i, j), r in rs.items():
            vp = valid[i] & valid[j]
            r_safe = jnp.maximum(r, 1e-15)
            den = r_safe + delta
            A = jnp.where(vp, 1.0 / (r_safe * den * den), 0.0)
            for a in range(dim):
                d = pos[i * dim + a] - pos[j * dim + a]
                g_q[i * dim + a] = g_q[i * dim + a] - c_pref * A * d
                g_q[j * dim + a] = g_q[j * dim + a] + c_pref * A * d
        good = jnp.isfinite(D) & (D > 0.0)
        return [jnp.where(good & jnp.isfinite(g), g, 0.0) for g in g_q]

    def _pair_r_median(r2):
        """Masked median of pair distances via rank selection (numpy
        nanmedian convention: mean of the two middle order stats of the
        valid set) — the degeneracy threshold of the reference fallback
        (ops/eps_model.py:336-345)."""
        keys = sorted(r2.keys())
        rv = []
        vps = []
        for key in keys:
            i, j = key
            vp = valid[i] & valid[j]
            vps.append(vp)
            rv.append(jnp.where(vp, jnp.sqrt(r2[key]), f32(3e38)))
        cnt = jnp.zeros_like(rv[0])
        for vp in vps:
            cnt = cnt + jnp.where(vp, 1.0, 0.0)
        lo = jnp.floor(jnp.maximum(cnt - 1.0, 0.0) * 0.5)
        hi = jnp.floor(cnt * 0.5)
        hi = jnp.where(cnt > 0.0, jnp.minimum(hi, cnt - 1.0), 0.0)
        med_lo = jnp.zeros_like(rv[0])
        med_hi = jnp.zeros_like(rv[0])
        for k, x in enumerate(rv):
            rank = jnp.zeros_like(x)
            for k2, y in enumerate(rv):
                lt = (y < x) | ((y == x) & (np.float32(k2) < np.float32(k)))
                rank = rank + jnp.where(lt, 1.0, 0.0)
            med_lo = med_lo + jnp.where(rank == lo, x, 0.0)
            med_hi = med_hi + jnp.where(rank == hi, x, 0.0)
        med = 0.5 * (med_lo + med_hi)
        med = jnp.where(cnt > 0.0, med, 0.0)
        return jnp.where(jnp.isfinite(med), med, 0.0)

    def eps_star_and_grad(pos):
        r2 = pair_r2(pos)
        iters = _solve_iterates(pos, r2)
        es, u = eps_star_of(iters[-1])
        g_q = _exact_grad(pos, r2, iters, u)

        if clamp_bounds is not None:
            lo_b, hi_b = clamp_bounds
            gate = (es >= lo_b) & (es <= hi_b)
            g_q = [jnp.where(gate, g, 0.0) for g in g_q]
            es = jnp.clip(es, lo_b, hi_b)

        if grad_mode == "reference":
            # fallback semantics (eps_star_and_grad,
            # ops/eps_model.py:308-358): when the exact gradient
            # degenerates, use the sign-aligned Omega gradient
            gmax = jnp.zeros_like(es)
            for i in range(n):
                g2 = jnp.zeros_like(es)
                for a in range(dim):
                    gg = g_q[i * dim + a]
                    g2 = g2 + gg * gg
                gmax = jnp.maximum(gmax,
                                   jnp.where(valid[i], jnp.sqrt(g2), 0.0))
            r_med = _pair_r_median(r2)
            degenerate = (gmax <= f32(1e-12)) | (gmax <= f32(1e-9) * r_med)

            g_fb = _omega_grad(pos, r2, iters[-1])
            g_ref = _legacy_grad(pos, r2)
            dot = jnp.zeros_like(es)
            for a, b in zip(g_fb, g_ref):
                dot = dot + a * b
            flip = jnp.isfinite(dot) & (dot < 0.0)
            g_fb = [jnp.where(flip, -g, g) for g in g_fb]
            g_q = [jnp.where(degenerate, fb, g)
                   for fb, g in zip(g_fb, g_q)]
        return es, g_q

    # ---------------- barrier force on eps (ops/barrier.py:46) ---------
    def bar_force(e):
        left = jnp.maximum(0.0, flo - e)
        right = jnp.maximum(0.0, e - cap)
        le = jnp.ones_like(e)
        re = jnp.ones_like(e)
        for _ in range(bexp - 2):
            le = le * left
            re = re * right
        return kw * (le - re)

    # barrier kicks apply only under the soft policy (_barrier_on)
    barrier_on = policy == "soft" and k_wall > 0.0 and bexp >= 2
    refl = policy == "reflection"

    # ------- closed-form reflection fold (ops/reflection.py:19-35) -----
    def fold(e, p):
        R = cap - flo
        Pw = 2.0 * R
        Psafe = jnp.where(Pw > 0.0, Pw, 1.0)
        x = e - flo
        y = x - Psafe * jnp.floor(x / Psafe)
        y = jnp.where(Pw > 0.0, y, 0.0)
        on_up = y <= R
        e_out = jnp.where(on_up, flo + y, cap - (y - R))
        p_out = jnp.where(on_up, p, -p)
        ok = jnp.isfinite(R) & (R > 0.0)
        return jnp.where(ok, e_out, flo), jnp.where(ok, p_out, -p)

    # ---------------- S(h/2) (hamsoft.spring_half_cached) --------------
    def s_half(pos, vel, eps, pi, es, grad, hh):
        if refl:
            eps, pi = fold(eps, pi)  # s_half pre-fold
        dt_f = 0.5 * hh
        omega = jnp.sqrt(k_s / mu)
        theta = omega * dt_f
        # small-theta series switch (hamsoft_flows.py:575-585)
        th2 = theta * theta
        s_ser = theta * (1.0 - th2 / 6.0 * (1.0 - th2 / 20.0))
        c_ser = 1.0 - th2 / 2.0 * (1.0 - th2 / 12.0)
        small = jnp.abs(theta) < 1e-8
        sin_t = jnp.where(small, s_ser, jnp.sin(theta))
        cos_t = jnp.where(small, c_ser, jnp.cos(theta))

        if barrier_on:
            pi_in = pi + 0.5 * dt_f * bar_force(eps)
        else:
            pi_in = pi
        Delta0 = eps - es
        mu_om = jnp.sqrt(mu * k_s)
        delta_t = Delta0 * cos_t + (pi_in / (mu * omega)) * sin_t
        eta_t = pi_in * cos_t - mu_om * Delta0 * sin_t
        I_tau = (Delta0 / omega) * sin_t \
            + (pi_in / (mu * omega * omega)) * (1.0 - cos_t)
        eps_new = es + delta_t
        if barrier_on:
            pi_new = eta_t + 0.5 * dt_f * bar_force(eps_new)
        else:
            pi_new = eta_t

        # J-cap (hamsoft_flows.py:692-738)
        J = k_s * I_tau
        p_scale = jnp.zeros_like(eps)
        dp_inf = jnp.zeros_like(eps)
        absJ = jnp.abs(J)
        for i in range(n):
            p2 = jnp.zeros_like(eps)
            g2 = jnp.zeros_like(eps)
            for a in range(dim):
                pv = mass[i] * vel[i * dim + a]
                p2 = p2 + pv * pv
                gg = grad[i * dim + a]
                g2 = g2 + gg * gg
            p_scale = jnp.maximum(p_scale,
                                  jnp.where(valid[i], jnp.sqrt(p2), 0.0))
            dp_inf = jnp.maximum(
                dp_inf, jnp.where(valid[i], absJ * jnp.sqrt(g2), 0.0))
        p_scale = jnp.maximum(p_scale, 1e-12)
        thr = jcapf * p_scale
        scale = jnp.where(dp_inf > thr, thr / jnp.maximum(dp_inf, 1e-30),
                          jnp.ones_like(dp_inf))
        Ja = J * scale
        vel = [v + Ja * grad[k] * inv_m[k // dim]
               for k, v in enumerate(vel)]
        if refl:
            eps_new, pi_new = fold(eps_new, pi_new)  # s_half post-fold
        return vel, eps_new, pi_new

    # ---------------- V(h/2) (hamsoft.v_half_kick) ---------------------
    def v_half_kick(pos, vel, eps, pi, hh):
        h2 = 0.5 * hh
        eps2 = eps * eps
        acc = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        ddU = jnp.zeros_like(eps)
        for i in range(n):
            for j in range(i + 1, n):
                r2 = eps2
                dxs = []
                for a in range(dim):
                    dx = pos[i * dim + a] - pos[j * dim + a]
                    dxs.append(dx)
                    r2 = r2 + dx * dx
                inv_r = jax.lax.rsqrt(r2)
                w = inv_r * inv_r * inv_r
                pairm = jnp.where(valid[i] & valid[j],
                                  mass[i] * mass[j], 0.0)
                ddU = ddU + pairm * w
                wi = jnp.where(valid[j], mass[j], 0.0) * w
                wj = jnp.where(valid[i], mass[i], 0.0) * w
                for a in range(dim):
                    acc[i * dim + a] = acc[i * dim + a] - wi * dxs[a]
                    acc[j * dim + a] = acc[j * dim + a] + wj * dxs[a]
        vel = [v + h2 * Gf * a for v, a in zip(vel, acc)]
        dU = Gf * eps * ddU
        if barrier_on:
            pi = pi - h2 * (dU - bar_force(eps))
        else:
            pi = pi - h2 * dU
        return vel, pi

    # ------------ one masked Strang substep (shared trip body) ---------
    def strang_trip(pos, vel, eps, pi, es, grad, h, active):
        """Advance one Strang substep where ``active``; identity
        elsewhere.  The (eps*, grad) cache carries across the
        trailing-S/leading-S boundary (identical q)."""
        eps0, pi0 = (fold(eps, pi) if refl else (eps, pi))  # substep pre-fold
        vel1, eps1, pi1 = s_half(pos, vel, eps0, pi0, es, grad, h)
        vel1, pi1 = v_half_kick(pos, vel1, eps1, pi1, h)
        pos1 = [p + h * v for p, v in zip(pos, vel1)]
        vel1, pi1 = v_half_kick(pos1, vel1, eps1, pi1, h)
        es1, grad1 = eps_star_and_grad(pos1)
        vel1, eps1, pi1 = s_half(pos1, vel1, eps1, pi1, es1, grad1, h)
        if refl:
            eps1, pi1 = fold(eps1, pi1)  # substep post-fold

        sel = lambda a, b: jnp.where(active, a, b)
        return ([sel(a, b) for a, b in zip(pos1, pos)],
                [sel(a, b) for a, b in zip(vel1, vel)],
                sel(eps1, eps), sel(pi1, pi), sel(es1, es),
                [sel(a, b) for a, b in zip(grad1, grad)])

    # ------- variational (tangent-map) acceleration (tangent.py:16) ----
    def tangent_accel(pos, dr, eps):
        """delta_a_i = G sum_j m_j [ddx/r^3 - 3 (dx . ddx) dx / r^5]
        with softened r^2 = |q_j - q_i|^2 + eps^2; contributions of
        pairs with an invalid member are zero (pair_mask semantics)."""
        eps2 = eps * eps
        acc = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        for i in range(n):
            for j in range(i + 1, n):
                pairv = valid[i] & valid[j]
                r2 = eps2
                dxs, ddxs = [], []
                for a in range(dim):
                    dx = pos[j * dim + a] - pos[i * dim + a]
                    ddx = dr[j * dim + a] - dr[i * dim + a]
                    dxs.append(dx)
                    ddxs.append(ddx)
                    r2 = r2 + dx * dx
                inv_r2 = 1.0 / r2
                inv_r3 = inv_r2 * jax.lax.rsqrt(r2)
                dot = dxs[0] * ddxs[0]
                for a in range(1, dim):
                    dot = dot + dxs[a] * ddxs[a]
                coeff = 3.0 * dot * inv_r2 * inv_r3
                mj = jnp.where(pairv, mval[j], 0.0)
                mi = jnp.where(pairv, mval[i], 0.0)
                for a in range(dim):
                    term = ddxs[a] * inv_r3 - coeff * dxs[a]
                    acc[i * dim + a] = acc[i * dim + a] + Gf * mj * term
                    acc[j * dim + a] = acc[j * dim + a] - Gf * mi * term
        return acc

    class _Ops:
        pass

    ops = _Ops()
    ops.eps_star_and_grad = eps_star_and_grad
    ops.strang_trip = strang_trip
    ops.tangent_accel = tangent_accel
    return ops


def _read_common(pos_ref, vel_ref, mass_ref, eps_ref, pi_ref, k_ref,
                 mu_ref, alpha_ref, flo_ref, cap_ref, h_ref, nsub_ref,
                 n: int, dim: int):
    nd = n * dim
    pos = [pos_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    vel = [vel_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    mass = [mass_ref[i * _SUB:(i + 1) * _SUB, :] for i in range(n)]
    valid = [m > 0.0 for m in mass]
    inv_m = [jnp.where(v, 1.0 / jnp.maximum(m, 1e-30), 0.0)
             for m, v in zip(mass, valid)]
    scal = (eps_ref[...], pi_ref[...], k_ref[...], mu_ref[...],
            alpha_ref[...], flo_ref[...], cap_ref[...], h_ref[...],
            nsub_ref[...])
    return pos, vel, mass, valid, inv_m, scal


def _hamsoft_multistep_kernel(pos_ref, vel_ref, mass_ref, eps_ref, pi_ref,
                              k_ref, mu_ref, alpha_ref, flo_ref, cap_ref,
                              h_ref, nsub_ref,
                              out_pos_ref, out_vel_ref, out_eps_ref,
                              out_pi_ref, *, n: int, dim: int, n_steps: int,
                              n_sub_max: int, G: float, k_wall: float,
                              eta: float, jcap: float, bexp: int,
                              policy: str, grad_mode: str,
                              lam_align: float):
    nd = n * dim
    f32 = jnp.float32
    pos, vel, mass, valid, inv_m, scal = _read_common(
        pos_ref, vel_ref, mass_ref, eps_ref, pi_ref, k_ref, mu_ref,
        alpha_ref, flo_ref, cap_ref, h_ref, nsub_ref, n, dim)
    eps, pi, k_s, mu, alpha, flo, cap, h, nsub = scal

    ops = _build_physics(n, dim, mass, valid, inv_m, k_s, mu, alpha, flo,
                         cap, eps, G, k_wall, eta, jcap, bexp,
                         policy=policy, grad_mode=grad_mode,
                         lam_align=lam_align)

    # ---------------- fused trip loop -----------------------------------
    # trip t advances substep (t mod n_sub_max) of macro step
    # (t div n_sub_max); a lane is active when its substep index is
    # below its own n_sub.
    es0, grad0 = ops.eps_star_and_grad(pos)

    def body(t, carry):
        pos = list(carry[:nd])
        vel = list(carry[nd:2 * nd])
        eps, pi, es = carry[2 * nd:2 * nd + 3]
        grad = list(carry[2 * nd + 3:])

        sub_idx = jnp.remainder(t, np.int32(n_sub_max)).astype(f32)
        active = sub_idx < nsub
        pos, vel, eps, pi, es, grad = ops.strang_trip(
            pos, vel, eps, pi, es, grad, h, active)
        return tuple(pos) + tuple(vel) + (eps, pi, es) + tuple(grad)

    carry0 = tuple(pos) + tuple(vel) + (eps, pi, es0) + tuple(grad0)
    out = jax.lax.fori_loop(np.int32(0),
                            np.int32(n_steps * n_sub_max), body, carry0)

    for k in range(nd):
        out_pos_ref[k * _SUB:(k + 1) * _SUB, :] = out[k]
        out_vel_ref[k * _SUB:(k + 1) * _SUB, :] = out[nd + k]
    out_eps_ref[...] = out[2 * nd]
    out_pi_ref[...] = out[2 * nd + 1]


#: metric order of the analysis kernel's accumulator block (the four
#: metrics whose sampled values are reduced in-register; J_eps and
#: theta_eps are derived in XLA from the sampled (eps, pi) rows so the
#: arctan2 never has to lower through Mosaic)
_ACC_METRICS = ("com_drift", "cos_theta", "var_L", "tr_hessian")


def _hamsoft_analysis_kernel(pos_ref, vel_ref, mass_ref, eps_ref, pi_ref,
                             k_ref, mu_ref, alpha_ref, flo_ref, cap_ref,
                             h_ref, nsub_ref, l0_ref,
                             out_pos_ref, out_vel_ref, out_eps_ref,
                             out_pi_ref, out_acc_ref, out_es_ref,
                             out_ps_ref, *, n: int, dim: int, n_steps: int,
                             n_sub_max: int, interval: int, G: float,
                             k_wall: float, eta: float, jcap: float,
                             bexp: int, policy: str, grad_mode: str,
                             lam_align: float):
    """Multi-step kernel with the analysis metric sampling fused in.

    Replaces ``analysis/fused.py``'s ~100 alternations between the
    multistep kernel and an XLA ``step_metrics`` pass — each
    ``pallas_call`` inside the sampling scan costs ~0.3 ms of launch +
    HBM round-trip, which dominated low-``n_sub`` analysis chunks
    (engine 34 ms of which the integration itself is ~2 ms;
    tools/profile_analysis_chunk.py).  One kernel call now advances the
    whole horizon, accumulating the sampled step metrics
    (diagnostics/metrics.py:56-123 semantics) in-register:

    * metric sample after macro step i when ``i % interval == 0`` —
      exactly the scan path's predicate (analysis/stability.py:113);
    * com_drift / cos_theta / var_L / tr_hessian reduce into
      (count, sum, sumsq, max, min) running moments
      (stability.py::_running_update);
    * the (eps, pi) pair at each sample is stored to per-sample output
      rows instead (J_eps and theta_eps need ``arctan2``, which is
      computed in XLA afterwards from these rows — bit-identical
      formulas to the scan path on kernel-exact sampled values).  The
      row store uses the frozen-carry idiom: the carried sample value
      only changes on a sample event, and every trip rewrites the
      current sample row, so the last write holds the event value (the
      MEGNO kernel's ``ys`` trick generalised to interval sampling).

    ``l0_ref``: the initial angular momentum per lane — 1 block (L_z)
    for d = 2, 3 blocks (the L vector) for d = 3 — matching the
    ``step_metrics`` branch semantics for cos_theta.
    """
    nd = n * dim
    f32 = jnp.float32
    pos, vel, mass, valid, inv_m, scal = _read_common(
        pos_ref, vel_ref, mass_ref, eps_ref, pi_ref, k_ref, mu_ref,
        alpha_ref, flo_ref, cap_ref, h_ref, nsub_ref, n, dim)
    eps, pi, k_s, mu, alpha, flo, cap, h, nsub = scal
    dL = 1 if dim == 2 else 3
    L0 = [l0_ref[a * _SUB:(a + 1) * _SUB, :] for a in range(dL)]

    ops = _build_physics(n, dim, mass, valid, inv_m, k_s, mu, alpha, flo,
                         cap, eps, G, k_wall, eta, jcap, bexp,
                         policy=policy, grad_mode=grad_mode,
                         lam_align=lam_align)
    es0, grad0 = ops.eps_star_and_grad(pos)

    mval = [jnp.where(v, mm, 0.0) for mm, v in zip(mass, valid)]
    nb = jnp.zeros_like(eps)
    for v in valid:
        nb = nb + jnp.where(v, 1.0, 0.0)
    nb = jnp.maximum(nb, 1.0)
    Gf = np.float32(G)
    dimf = np.float32(dim)

    def metrics_of(pos, vel, eps):
        """The four in-register step metrics (metrics.py:56-123)."""
        # --- com_drift = |sum_i m_i q_i| -------------------------------
        com2 = jnp.zeros_like(eps)
        for a in range(dim):
            s = jnp.zeros_like(eps)
            for i in range(n):
                s = s + mval[i] * pos[i * dim + a]
            com2 = com2 + s * s
        com_drift = jnp.sqrt(com2)

        # --- angular momentum statistics --------------------------------
        if dim == 2:
            L_i = [mval[i] * (pos[i * dim] * vel[i * dim + 1]
                              - pos[i * dim + 1] * vel[i * dim])
                   for i in range(n)]
            L_tot = L_i[0]
            for x in L_i[1:]:
                L_tot = L_tot + x
            L_mean = L_tot / nb
            var_L = jnp.zeros_like(eps)
            for i in range(n):
                d0 = L_i[i] - L_mean
                var_L = var_L + jnp.where(valid[i], d0 * d0, 0.0)
            var_L = var_L / nb
            cos_ok = (L0[0] != 0.0) & (L_tot != 0.0)
            cos_theta = jnp.where(
                cos_ok, (L_tot * L0[0])
                / (jnp.abs(L_tot) * jnp.abs(L0[0])), jnp.nan)
        else:
            # per-body L_i = m q x v; totals + |L_i| variance + tilt
            Lv = [jnp.zeros_like(eps) for _ in range(3)]
            l2_i = []
            for i in range(n):
                qx, qy, qz = (pos[i * dim], pos[i * dim + 1],
                              pos[i * dim + 2])
                vx, vy, vz = (vel[i * dim], vel[i * dim + 1],
                              vel[i * dim + 2])
                cx = mval[i] * (qy * vz - qz * vy)
                cy = mval[i] * (qz * vx - qx * vz)
                cz = mval[i] * (qx * vy - qy * vx)
                Lv[0] = Lv[0] + cx
                Lv[1] = Lv[1] + cy
                Lv[2] = Lv[2] + cz
                l2_i.append(cx * cx + cy * cy + cz * cz)
            L_tot = jnp.sqrt(Lv[0] * Lv[0] + Lv[1] * Lv[1] + Lv[2] * Lv[2])
            l_mean = jnp.zeros_like(eps)
            l_i = [jnp.sqrt(x) for x in l2_i]
            for i in range(n):
                l_mean = l_mean + jnp.where(valid[i], l_i[i], 0.0)
            l_mean = l_mean / nb
            var_L = jnp.zeros_like(eps)
            for i in range(n):
                d0 = l_i[i] - l_mean
                var_L = var_L + jnp.where(valid[i], d0 * d0, 0.0)
            var_L = var_L / nb
            L0n = jnp.sqrt(L0[0] * L0[0] + L0[1] * L0[1] + L0[2] * L0[2])
            dot = Lv[0] * L0[0] + Lv[1] * L0[1] + Lv[2] * L0[2]
            cos_ok = (L0n != 0.0) & (L_tot != 0.0)
            cos_theta = jnp.where(
                cos_ok, dot / jnp.maximum(L_tot * L0n, 1e-300), jnp.nan)

        # --- tidal trace (metrics.py:25-53, ham_soft eps) ---------------
        eps2 = eps * eps
        tr = jnp.zeros_like(eps)
        for i in range(n):
            for j in range(i + 1, n):
                r2 = jnp.zeros_like(eps)
                for a in range(dim):
                    dx = pos[i * dim + a] - pos[j * dim + a]
                    r2 = r2 + dx * dx
                s = r2 + eps2
                num = dimf * s - 3.0 * r2
                ssafe = jnp.maximum(s, 0.0)
                den = ssafe * ssafe * jnp.sqrt(ssafe)
                pairm = jnp.where(valid[i] & valid[j],
                                  mass[i] * mass[j], 0.0)
                tr = tr + pairm * num / den
        tr_hessian = Gf * 2.0 * tr  # i != j double-counts the i < j sum

        return (com_drift, cos_theta, var_L, tr_hessian)

    zero = jnp.zeros_like(eps)
    ninf = jnp.full_like(eps, -jnp.inf)
    pinf = jnp.full_like(eps, jnp.inf)
    # carry layout after the integrator's 2nd+3+nd blocks:
    #   count, then per metric (sum, sumsq, max, min), then the frozen
    #   (eps, pi) sample pair
    acc0 = (zero,) + (zero, zero, ninf, pinf) * len(_ACC_METRICS) \
        + (eps, pi)

    def body(t, carry):
        pos = list(carry[:nd])
        vel = list(carry[nd:2 * nd])
        eps, pi, es = carry[2 * nd:2 * nd + 3]
        grad = list(carry[2 * nd + 3:3 * nd + 3])
        acc = list(carry[3 * nd + 3:])

        sub_idx = jnp.remainder(t, np.int32(n_sub_max))
        step_i = t // np.int32(n_sub_max)
        active = sub_idx.astype(f32) < nsub
        pos, vel, eps, pi, es, grad = ops.strang_trip(
            pos, vel, eps, pi, es, grad, h, active)

        # ---- predicated metric sampling -------------------------------
        last = sub_idx == np.int32(n_sub_max - 1)
        on_point = jnp.remainder(step_i, np.int32(interval)) == 0
        samp = last & on_point
        mets = metrics_of(pos, vel, eps)
        cnt = acc[0] + jnp.where(samp, 1.0, 0.0)
        new = [cnt]
        for k, x in enumerate(mets):
            s, s2, mx, mn = acc[1 + 4 * k:5 + 4 * k]
            new.append(s + jnp.where(samp, x, 0.0))
            new.append(s2 + jnp.where(samp, x * x, 0.0))
            new.append(jnp.where(samp, jnp.maximum(mx, x), mx))
            new.append(jnp.where(samp, jnp.minimum(mn, x), mn))
        eps_s = jnp.where(samp, eps, acc[-2])
        pi_s = jnp.where(samp, pi, acc[-1])
        new.extend([eps_s, pi_s])
        # frozen-carry row store: idempotent rewrites of the current
        # sample row; the event-trip value lands last
        samp_row = step_i // np.int32(interval)
        out_es_ref[pl.ds(samp_row * _SUB, _SUB), :] = eps_s
        out_ps_ref[pl.ds(samp_row * _SUB, _SUB), :] = pi_s

        return tuple(pos) + tuple(vel) + (eps, pi, es) + tuple(grad) \
            + tuple(new)

    carry0 = tuple(pos) + tuple(vel) + (eps, pi, es0) + tuple(grad0) + acc0
    out = jax.lax.fori_loop(np.int32(0),
                            np.int32(n_steps * n_sub_max), body, carry0)

    for k in range(nd):
        out_pos_ref[k * _SUB:(k + 1) * _SUB, :] = out[k]
        out_vel_ref[k * _SUB:(k + 1) * _SUB, :] = out[nd + k]
    out_eps_ref[...] = out[2 * nd]
    out_pi_ref[...] = out[2 * nd + 1]
    n_acc = 1 + 4 * len(_ACC_METRICS)
    for k in range(n_acc):
        out_acc_ref[k * _SUB:(k + 1) * _SUB, :] = out[3 * nd + 3 + k]


def _hamsoft_megno_kernel(pos_ref, vel_ref, mass_ref, eps_ref, pi_ref,
                          k_ref, mu_ref, alpha_ref, flo_ref, cap_ref,
                          h_ref, nsub_ref, dt_ref, dr_ref, dv_ref,
                          out_pos_ref, out_vel_ref, out_eps_ref,
                          out_pi_ref, out_acc_ref, out_t_ref, out_ys_ref,
                          *, n: int, dim: int, n_steps: int,
                          n_sub_max: int, G: float, k_wall: float,
                          eta: float, jcap: float, bexp: int,
                          policy: str, grad_mode: str,
                          lam_align: float):
    """MEGNO continuation fused with the integrator (VMEM-resident).

    Per macro step (diagnostics/megno.py:67-87, itself the parity
    port of minbody/evolution_features.py:47-66):
        advance n_sub Strang substeps (masked to the lane's schedule),
        dr += dv dt;  da = tangent_accel;  dv += da dt;  t += dt,
        the reference's tiny-norm renormalisation quirk,
        accum += (|dv|/|dr|) t dt;  Y_t = 2 accum / t  -> ys[t].
    ``ys`` is written per step so the host can take the slope median
    (megno_slope_med) without keeping history in registers.

    Loop structure: ONE flat fori over n_steps * n_sub_max trips (the
    plain kernel's shape), with the MEGNO update predicated on the
    last trip of each macro step — NOT an outer steps x inner substeps
    nest.  Mosaic compiles the flat form in seconds; the nested form
    with this carry size ran past 30 minutes at n = 8 slots before
    being abandoned.  The predicated tangent pass costs one extra
    pairwise sweep per trip (~2% of a Strang trip's work).
    """
    nd = n * dim
    f32 = jnp.float32
    pos, vel, mass, valid, inv_m, scal = _read_common(
        pos_ref, vel_ref, mass_ref, eps_ref, pi_ref, k_ref, mu_ref,
        alpha_ref, flo_ref, cap_ref, h_ref, nsub_ref, n, dim)
    eps, pi, k_s, mu, alpha, flo, cap, h, nsub = scal
    dt = dt_ref[...]
    dr = [dr_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    dv = [dv_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]

    ops = _build_physics(n, dim, mass, valid, inv_m, k_s, mu, alpha, flo,
                         cap, eps, G, k_wall, eta, jcap, bexp,
                         policy=policy, grad_mode=grad_mode,
                         lam_align=lam_align)
    es0, grad0 = ops.eps_star_and_grad(pos)

    def body(t, carry):
        pos = list(carry[:nd])
        vel = list(carry[nd:2 * nd])
        eps, pi, es = carry[2 * nd:2 * nd + 3]
        grad = list(carry[2 * nd + 3:3 * nd + 3])
        dr = list(carry[3 * nd + 3:4 * nd + 3])
        dv = list(carry[4 * nd + 3:5 * nd + 3])
        accum = carry[5 * nd + 3]
        tt = carry[5 * nd + 4]

        sub_idx = jnp.remainder(t, np.int32(n_sub_max))
        step_i = t // np.int32(n_sub_max)
        active = sub_idx.astype(f32) < nsub
        pos, vel, eps, pi, es, grad = ops.strang_trip(
            pos, vel, eps, pi, es, grad, h, active)

        # ---- MEGNO update, applied on the macro-step boundary ---------
        # (megno.py:73-87).  Computed every trip, selected on the last
        # sub-trip: the fori stores below overwrite in trip order, so
        # the boundary value lands last.
        last = sub_idx == np.int32(n_sub_max - 1)
        dr1 = [r + v * dt for r, v in zip(dr, dv)]
        da = ops.tangent_accel(pos, dr1, eps)
        dv1 = [v + a * dt for v, a in zip(dv, da)]
        tt1 = tt + dt
        nr2 = dr1[0] * dr1[0]
        for r in dr1[1:]:
            nr2 = nr2 + r * r
        norm_r = jnp.sqrt(nr2)
        # reference quirk: divides by the tiny norm then treats it as 1
        tiny = norm_r < 1e-12
        scale = jnp.where(tiny, norm_r, 1.0)
        dr1 = [r / scale for r in dr1]
        dv1 = [v / scale for v in dv1]
        norm_r = jnp.where(tiny, 1.0, norm_r)
        nv2 = dv1[0] * dv1[0]
        for v in dv1[1:]:
            nv2 = nv2 + v * v
        norm_v = jnp.sqrt(nv2)
        accum1 = accum + (norm_v / norm_r) * tt1 * dt
        y = 2.0 * accum1 / tt1
        out_ys_ref[pl.ds(step_i * _SUB, _SUB), :] = y

        sel = lambda a, b: jnp.where(last, a, b)
        dr = [sel(a, b) for a, b in zip(dr1, dr)]
        dv = [sel(a, b) for a, b in zip(dv1, dv)]
        return (tuple(pos) + tuple(vel) + (eps, pi, es) + tuple(grad)
                + tuple(dr) + tuple(dv)
                + (sel(accum1, accum), sel(tt1, tt)))

    zero = jnp.zeros_like(eps)
    carry0 = (tuple(pos) + tuple(vel) + (eps, pi, es0) + tuple(grad0)
              + tuple(dr) + tuple(dv) + (zero, zero))
    out = jax.lax.fori_loop(np.int32(0),
                            np.int32(n_steps * n_sub_max), body, carry0)

    for k in range(nd):
        out_pos_ref[k * _SUB:(k + 1) * _SUB, :] = out[k]
        out_vel_ref[k * _SUB:(k + 1) * _SUB, :] = out[nd + k]
    out_eps_ref[...] = out[2 * nd]
    out_pi_ref[...] = out[2 * nd + 1]
    out_acc_ref[...] = out[5 * nd + 3]
    out_t_ref[...] = out[5 * nd + 4]


def _fold(x):  # (B,) -> (8, B/8)
    B = x.shape[0]
    return x.reshape(_SUB, B // _SUB)


def hamsoft_multistep(pos, vel, mass, eps, pi, *, k_soft, mu, alpha,
                      eps_min, eps_max, h, n_sub, n_steps: int,
                      n_sub_max: int, G: float = 1.0, k_wall: float = 1e9,
                      eta: float = 1.35, jcap: float = 0.02, bexp: int = 5,
                      lanes: int = 256, interpret: bool = False,
                      policy: str = "soft", grad_mode: str = "exact",
                      lam_align: float = 0.3):
    """Advance a (B, N, d) float32 ham_soft batch ``n_steps`` macro
    steps (each lane running its own ``n_sub`` <= n_sub_max substeps of
    size ``h``) entirely in VMEM.

    Per-system (B,) arrays: eps, pi, k_soft, mu, alpha, eps_min,
    eps_max, h, n_sub.  B must be a multiple of 8 * lanes.
    Returns (pos, vel, eps, pi).
    """
    B, n, dim = pos.shape
    nd = n * dim
    f32 = jnp.float32

    def run():
        pos_c = jnp.concatenate(
            [_fold(pos[:, i, a]) for i in range(n) for a in range(dim)], 0)
        vel_c = jnp.concatenate(
            [_fold(vel[:, i, a]) for i in range(n) for a in range(dim)], 0)
        mass_c = jnp.concatenate([_fold(mass[:, i]) for i in range(n)], 0)
        scalars = [jnp.asarray(x, f32) * jnp.ones((B,), f32)
                   for x in (eps, pi, k_soft, mu, alpha, eps_min, eps_max,
                             h, jnp.asarray(n_sub, f32))]
        folded = [_fold(s) for s in scalars]

        kernel = functools.partial(
            _hamsoft_multistep_kernel, n=n, dim=dim, n_steps=n_steps,
            n_sub_max=n_sub_max, G=G, k_wall=k_wall, eta=eta, jcap=jcap,
            bexp=bexp, policy=policy, grad_mode=grad_mode,
            lam_align=lam_align)
        L = B // _SUB
        grid = (L // lanes,)
        bs = lambda rows: pl.BlockSpec((rows, lanes), lambda i: (0, i))
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(nd * _SUB), bs(nd * _SUB), bs(n * _SUB)]
            + [bs(_SUB)] * 9,
            out_specs=(bs(nd * _SUB), bs(nd * _SUB), bs(_SUB), bs(_SUB)),
            out_shape=(jax.ShapeDtypeStruct((nd * _SUB, L), f32),
                       jax.ShapeDtypeStruct((nd * _SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32)),
            interpret=interpret,
        )(pos_c, vel_c, mass_c, *folded)
        out_pos, out_vel, out_eps, out_pi = outs

        def unfold(block):
            coords = [block[k * _SUB:(k + 1) * _SUB, :].reshape(B)
                      for k in range(nd)]
            return jnp.stack(coords, axis=1).reshape(B, n, dim)

        return (unfold(out_pos), unfold(out_vel),
                out_eps.reshape(B), out_pi.reshape(B))

    if interpret:
        return run()
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        return run()


def hamsoft_analysis_multistep(pos, vel, mass, eps, pi, L0, *, k_soft, mu,
                               alpha, eps_min, eps_max, h, n_sub,
                               n_steps: int, n_sub_max: int, interval: int,
                               G: float = 1.0, k_wall: float = 1e9,
                               eta: float = 1.35, jcap: float = 0.02,
                               bexp: int = 5, lanes: int = 128,
                               interpret: bool = False,
                               policy: str = "soft",
                               grad_mode: str = "exact",
                               lam_align: float = 0.3):
    """Advance a (B, N, d) float32 ham_soft batch ``n_steps`` macro
    steps with the analysis metric sampling fused in (one kernel call
    for the whole horizon; see ``_hamsoft_analysis_kernel``).

    ``L0``: (B,) initial L_z for d = 2, (B, 3) initial L vector for
    d = 3.  Returns (pos, vel, eps, pi, accs, eps_samples, pi_samples)
    where ``accs`` maps each of ``_ACC_METRICS`` to a
    (count, sum, sumsq, max, min) tuple of (B,) arrays and the sample
    arrays are (n_samples, B) with n_samples = ceil(n_steps/interval).
    """
    B, n, dim = pos.shape
    nd = n * dim
    f32 = jnp.float32
    dL = 1 if dim == 2 else 3
    n_samples = -(-n_steps // interval)

    def run():
        pos_c = jnp.concatenate(
            [_fold(pos[:, i, a]) for i in range(n) for a in range(dim)], 0)
        vel_c = jnp.concatenate(
            [_fold(vel[:, i, a]) for i in range(n) for a in range(dim)], 0)
        mass_c = jnp.concatenate([_fold(mass[:, i]) for i in range(n)], 0)
        scalars = [jnp.asarray(x, f32) * jnp.ones((B,), f32)
                   for x in (eps, pi, k_soft, mu, alpha, eps_min, eps_max,
                             h, jnp.asarray(n_sub, f32))]
        folded = [_fold(s) for s in scalars]
        L0a = jnp.asarray(L0, f32).reshape(B, dL)
        l0_c = jnp.concatenate([_fold(L0a[:, a]) for a in range(dL)], 0)

        kernel = functools.partial(
            _hamsoft_analysis_kernel, n=n, dim=dim, n_steps=n_steps,
            n_sub_max=n_sub_max, interval=interval, G=G, k_wall=k_wall,
            eta=eta, jcap=jcap, bexp=bexp, policy=policy,
            grad_mode=grad_mode, lam_align=lam_align)
        L = B // _SUB
        grid = (L // lanes,)
        bs = lambda rows: pl.BlockSpec((rows, lanes), lambda i: (0, i))
        n_acc = 1 + 4 * len(_ACC_METRICS)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(nd * _SUB), bs(nd * _SUB), bs(n * _SUB)]
            + [bs(_SUB)] * 9 + [bs(dL * _SUB)],
            out_specs=(bs(nd * _SUB), bs(nd * _SUB), bs(_SUB), bs(_SUB),
                       bs(n_acc * _SUB), bs(n_samples * _SUB),
                       bs(n_samples * _SUB)),
            out_shape=(jax.ShapeDtypeStruct((nd * _SUB, L), f32),
                       jax.ShapeDtypeStruct((nd * _SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((n_acc * _SUB, L), f32),
                       jax.ShapeDtypeStruct((n_samples * _SUB, L), f32),
                       jax.ShapeDtypeStruct((n_samples * _SUB, L), f32)),
            interpret=interpret,
        )(pos_c, vel_c, mass_c, *folded, l0_c)
        out_pos, out_vel, out_eps, out_pi, out_acc, out_es, out_ps = outs

        def unfold(block):
            coords = [block[k * _SUB:(k + 1) * _SUB, :].reshape(B)
                      for k in range(nd)]
            return jnp.stack(coords, axis=1).reshape(B, n, dim)

        row = lambda k: out_acc[k * _SUB:(k + 1) * _SUB, :].reshape(B)
        cnt = row(0)
        accs = {}
        for k, name in enumerate(_ACC_METRICS):
            base = 1 + 4 * k
            accs[name] = (cnt, row(base), row(base + 1), row(base + 2),
                          row(base + 3))
        samples = lambda blk: blk.reshape(n_samples, _SUB, L).reshape(
            n_samples, B)
        return (unfold(out_pos), unfold(out_vel), out_eps.reshape(B),
                out_pi.reshape(B), accs, samples(out_es), samples(out_ps))

    if interpret:
        return run()
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        return run()


@functools.partial(jax.jit, static_argnames=("n_steps", "n_sub_max", "G",
                                             "k_wall", "eta", "jcap", "bexp",
                                             "lanes", "policy", "grad_mode",
                                             "lam_align"))
def hamsoft_multistep_jit(pos, vel, mass, eps, pi, k_soft, mu, alpha,
                          eps_min, eps_max, h, n_sub, n_steps, n_sub_max,
                          G=1.0, k_wall=1e9, eta=1.35, jcap=0.02, bexp=5,
                          lanes=256, policy="soft", grad_mode="exact",
                          lam_align=0.3):
    return hamsoft_multistep(pos, vel, mass, eps, pi, k_soft=k_soft, mu=mu,
                             alpha=alpha, eps_min=eps_min, eps_max=eps_max,
                             h=h, n_sub=n_sub, n_steps=n_steps,
                             n_sub_max=n_sub_max, G=G, k_wall=k_wall,
                             eta=eta, jcap=jcap, bexp=bexp, lanes=lanes,
                             policy=policy, grad_mode=grad_mode,
                             lam_align=lam_align)


def hamsoft_megno_multistep(pos, vel, mass, eps, pi, dr, dv, *, k_soft, mu,
                            alpha, eps_min, eps_max, h, n_sub, dt,
                            n_steps: int, n_sub_max: int, G: float = 1.0,
                            k_wall: float = 1e9, eta: float = 1.35,
                            jcap: float = 0.02, bexp: int = 5,
                            lanes: int = 128, interpret: bool = False,
                            policy: str = "soft", grad_mode: str = "exact",
                            lam_align: float = 0.3):
    """MEGNO continuation: advance the batch ``n_steps`` macro steps
    with the tangent map fused in VMEM (the full-mode analysis tail,
    diagnostics/megno.py:49-101).

    ``dr``/``dv`` are the (B, N, d) initial tangent vectors
    (``init_tangent``).  Returns (pos, vel, eps, pi, megno,
    lyapunov_time, slope_med)."""
    B, n, dim = pos.shape
    nd = n * dim
    f32 = jnp.float32

    def run():
        fold_c = lambda arr: jnp.concatenate(
            [_fold(arr[:, i, a]) for i in range(n) for a in range(dim)], 0)
        pos_c, vel_c, dr_c, dv_c = map(fold_c, (pos, vel, dr, dv))
        mass_c = jnp.concatenate([_fold(mass[:, i]) for i in range(n)], 0)
        scalars = [jnp.asarray(x, f32) * jnp.ones((B,), f32)
                   for x in (eps, pi, k_soft, mu, alpha, eps_min, eps_max,
                             h, jnp.asarray(n_sub, f32), dt)]
        folded = [_fold(s) for s in scalars]

        kernel = functools.partial(
            _hamsoft_megno_kernel, n=n, dim=dim, n_steps=n_steps,
            n_sub_max=n_sub_max, G=G, k_wall=k_wall, eta=eta, jcap=jcap,
            bexp=bexp, policy=policy, grad_mode=grad_mode,
            lam_align=lam_align)
        L = B // _SUB
        grid = (L // lanes,)
        bs = lambda rows: pl.BlockSpec((rows, lanes), lambda i: (0, i))
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(nd * _SUB), bs(nd * _SUB), bs(n * _SUB)]
            + [bs(_SUB)] * 10 + [bs(nd * _SUB), bs(nd * _SUB)],
            out_specs=(bs(nd * _SUB), bs(nd * _SUB), bs(_SUB), bs(_SUB),
                       bs(_SUB), bs(_SUB), bs(n_steps * _SUB)),
            out_shape=(jax.ShapeDtypeStruct((nd * _SUB, L), f32),
                       jax.ShapeDtypeStruct((nd * _SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((n_steps * _SUB, L), f32)),
            interpret=interpret,
        )(pos_c, vel_c, mass_c, *folded, dr_c, dv_c)
        out_pos, out_vel, out_eps, out_pi, out_acc, out_t, out_ys = outs

        def unfold(block):
            coords = [block[k * _SUB:(k + 1) * _SUB, :].reshape(B)
                      for k in range(nd)]
            return jnp.stack(coords, axis=1).reshape(B, n, dim)

        accum = out_acc.reshape(B)
        tt = out_t.reshape(B)
        # final MEGNO / Lyapunov time (megno.py:92-93)
        Y = 2.0 * accum / jnp.maximum(tt, 1e-300)
        lyap = jnp.where(Y == 0.0, jnp.inf, tt / jnp.abs(Y))
        # per-step slope median (megno.py:96-100)
        if n_steps >= 2:
            ys = out_ys.reshape(n_steps, _SUB, L).reshape(n_steps, B)
            slopes = (ys[1:] - ys[:-1]) / jnp.asarray(dt, f32)
            slope_med = jnp.median(slopes, axis=0)
        else:
            slope_med = jnp.zeros((B,), f32)
        return (unfold(out_pos), unfold(out_vel), out_eps.reshape(B),
                out_pi.reshape(B), Y, lyap, slope_med)

    if interpret:
        return run()
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        return run()
