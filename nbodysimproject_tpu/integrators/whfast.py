"""Wisdom–Holman (WHFast) integrator in Jacobi coordinates.

Parity: ``minbody/whfast_scheme.py`` — ``_wh_kepler_drift`` (:22),
``_wh_interaction_accel`` (:39), ``_wisdom_holman`` (:71) — and the
Jacobi transforms ``NBodySimulation.to_jacobi``/``from_jacobi``
(simulation.py:487-534).

TPU-first: ``to_jacobi`` is closed-form via exclusive prefix sums;
``from_jacobi`` is a short ``lax.scan`` over bodies (sequential by
construction, N is small).  Per-planet Kepler propagation vmaps over
the body axis (the reference loops bodies sequentially,
whfast_scheme.py:29-33).  The interaction acceleration's double loops
(:52-68) are vectorised into masked einsums.

WHFast is only reachable with zero softening (simulation.py:119-120
demotes to Verlet when manager.s > 0), so no mask-handling subtleties
arise: the facade restricts whfast to unpadded systems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.state import SimState
from ..ops.forces import force_auto, gravitational_force
from ..ops.kepler import kepler_propagate, kepler_propagate_fixed


def to_jacobi(m, pos, vel):
    """Jacobi coordinates (simulation.py:487-507).

    jac_0 = pos_0; jac_i = pos_i - COM(bodies < i).
    """
    # exclusive prefix sums of m, m*pos, m*vel
    csum_m = jnp.cumsum(m)
    M_prev = jnp.concatenate([m[:1], csum_m[:-1]])  # M_prev[i] = sum_{k<i} m_k for i>=1
    R = jnp.cumsum(m[:, None] * pos, axis=0)
    V = jnp.cumsum(m[:, None] * vel, axis=0)
    R_prev = jnp.concatenate([ (m[:1, None] * pos[:1]), R[:-1]], axis=0)
    V_prev = jnp.concatenate([ (m[:1, None] * vel[:1]), V[:-1]], axis=0)
    cm_pos = R_prev / M_prev[:, None]
    cm_vel = V_prev / M_prev[:, None]
    jac_pos = pos - cm_pos
    jac_vel = vel - cm_vel
    jac_pos = jac_pos.at[0].set(pos[0])
    jac_vel = jac_vel.at[0].set(vel[0])
    return jac_pos, jac_vel


def from_jacobi(m, jac_pos, jac_vel):
    """Inverse transform (simulation.py:509-534) in closed form.

    The reference reconstructs sequentially (body i needs the COM of
    bodies < i).  The recurrence R_i = (M_i/M_{i-1}) R_{i-1} + m_i j_i
    (R = running sum of m q, M = cumsum m) is a first-order linear
    recurrence whose product telescopes: R_i = M_i sum_{k<=i} m_k j_k
    / M_k, hence

        pos_i = j_i + exclusive_cumsum(m j / M)_i

    — an O(N) parallel prefix instead of an N-trip ``lax.scan``
    (which dominated many-planet WHFast: the scan's 4096 sequential
    trips cost more than both Kepler drifts combined)."""
    M = jnp.cumsum(m)
    s_pos = jnp.cumsum(m[:, None] * jac_pos / M[:, None], axis=0)
    s_vel = jnp.cumsum(m[:, None] * jac_vel / M[:, None], axis=0)
    zero = jnp.zeros_like(jac_pos[:1])
    pos = jac_pos + jnp.concatenate([zero, s_pos[:-1]], axis=0)
    vel = jac_vel + jnp.concatenate([zero, s_vel[:-1]], axis=0)
    return pos, vel


def wh_kepler_drift(state: SimState, dyn, dt,
                    kepler_iters: int = 0) -> SimState:
    """Half drift: the center of mass drifts linearly, bodies i >= 1
    propagate on Kepler orbits in Jacobi coordinates with
    mu = G (M_interior + m_i) (whfast_scheme.py:22-37).

    NOTE vs reference: the reference anchors Jacobi slot 0 at BODY 0's
    position and drifts it with body 0's bare velocity
    (simulation.py:487-507 + whfast_scheme.py:29) — a linear coordinate
    change whose slot-0 pairing is NOT canonically conjugate, so its
    drift is not the exact flow of any splitting Hamiltonian: the
    measured symplectic-form defect is ~3.5e-6 at h = 1e-3 (scaling
    with m_planet * h), 5 orders above the paper's own 4.3 bound.
    Anchoring slot 0 at the center of mass (the standard Wisdom-Holman
    construction: conjugate momenta m~_i jac_v_i with reduced masses
    m~_i = m_i M_{i-1}/M_i, m~_0 = M_total) makes every piece an exact
    Hamiltonian flow — the drift then passes
    ||J^T w J - w||_F < 1e-11 sqrt(N) max(1, ||J||_F)
    (tests/test_structure_preservation.py).  Slots i >= 1 are
    unchanged, so the interaction split (V_true - V_kep) is identical.

    ``kepler_iters > 0`` selects the fixed-depth Halley solver — the
    adaptive while_loop gates every vmapped planet lane on the worst
    lane's Newton count, which dominated many-planet drifts (2 ms/step
    at N = 4096; see cfg.whfast_kepler_iters)."""
    m = state.mass
    cum = jnp.cumsum(m)
    jac_pos, jac_vel = to_jacobi(m, state.pos, state.vel)

    M = cum[-1]
    com_q = jnp.sum(m[:, None] * state.pos, axis=0) / M
    com_v = jnp.sum(m[:, None] * state.vel, axis=0) / M

    mu = dyn.G * cum  # mu_i = G * (cum[i-1] + m[i]) = G * cum[i]
    if kepler_iters > 0:
        kp = jax.vmap(lambda r, v, mu_i: kepler_propagate_fixed(
            r, v, mu_i, dt, iters=kepler_iters))
    else:
        kp = jax.vmap(lambda r, v, mu_i: kepler_propagate(r, v, mu_i, dt))
    r_new, v_new = kp(jac_pos[1:], jac_vel[1:], mu[1:])

    # reconstruct with slot 0 zeroed (a pure translation gauge), then
    # translate so the COM sits where its free drift puts it — the
    # exact linear inverse of the COM-anchored transform
    zero = jnp.zeros_like(jac_pos[:1])
    pos0, vel0 = from_jacobi(m, jnp.concatenate([zero, r_new], axis=0),
                             jnp.concatenate([zero, v_new], axis=0))
    dq = (com_q + com_v * dt) - jnp.sum(m[:, None] * pos0, axis=0) / M
    dv = com_v - jnp.sum(m[:, None] * vel0, axis=0) / M
    return state.replace(pos=pos0 + dq[None, :], vel=vel0 + dv[None, :])


def interaction_potential(pos, m, G, s2):
    """Wisdom–Holman interaction Hamiltonian in Jacobi splitting:

        V_int(q) = V_true(q) - V_kep(q)
        V_true   = -G sum_{i<j} m_i m_j / sqrt(r_ij^2 + s2)
        V_kep    = -G sum_{i>=1} m_i cum_{i-1} / sqrt(|jac_i|^2 + s2)

    The Kepler drift integrates H_kep exactly with mu_i = G cum_i
    (whfast_scheme.py:30), so kicking with -grad V_int closes the
    splitting H = H_kep + H_int.

    NOTE vs reference: the hand-rolled interaction acceleration there
    (whfast_scheme.py:39-69) is not the gradient of any splitting of H
    (its direct pair term enters with the repulsive sign), and is
    discarded anyway: the kick at whfast_scheme.py:88 calls
    ``sim._accel()`` which recomputes *full* direct gravity
    (simulation.py:539 never reads the ``_acc_cached`` flag), so the
    reference double-counts the central attraction and its planets
    spiral outward.  We derive the kick by ``jax.grad`` of V_int —
    correct by construction, and verified by long-run energy
    conservation tests.
    """
    n = pos.shape[0]
    diff = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(diff * diff, axis=-1) + s2
    eye = jnp.eye(n, dtype=bool)
    inv_r = jnp.where(~eye, 1.0 / jnp.sqrt(jnp.where(~eye, r2, 1.0)), 0.0)
    mprod = m[:, None] * m[None, :]
    V_true = -0.5 * G * jnp.sum(mprod * inv_r)

    jac_pos, _ = to_jacobi(m, pos, pos)
    cum = jnp.cumsum(m)
    cm_prev = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]])
    live = jnp.arange(n) >= 1
    jr2 = jnp.sum(jac_pos * jac_pos, axis=1) + s2
    # inner-safe select so reverse-mode AD never differentiates 1/0 on
    # the masked i = 0 lane
    jr = jnp.sqrt(jnp.where(live, jr2, 1.0))
    V_kep = -G * jnp.sum(jnp.where(live, m * cm_prev / jr, 0.0))
    return V_true - V_kep


def wh_interaction_accel_ad(state: SimState, dyn):
    """a_k = -(1/m_k) dV_int/dq_k via reverse-mode autodiff (the
    correctness reference for the analytic form below)."""
    m = state.mass
    grad = jax.grad(interaction_potential)(state.pos, m, dyn.G, state.step_s2)
    return -grad / m[:, None]


def wh_interaction_accel(state: SimState, dyn, cfg=None):
    """a_int = -grad V_int / m in closed form.

    -grad V_true / m is the standard softened direct acceleration (the
    shared force kernel).  For the Kepler part, with
    w_i = G m_i jac_i / (|jac_i|^2 + s2)^{3/2} (zero for i = 0):

        grad_k V_kep = Mprev_k w_k - m_k * sum_{i > k} w_i

    (the second term is the COM back-reaction of body k on every outer
    Jacobi radius; an exclusive suffix sum).  Same values as the
    autodiff of ``interaction_potential`` to rounding — tested — at a
    fraction of the HBM traffic: reverse-mode materialises the (N, N)
    backward intermediates twice, which dominated many-planet WHFast
    once the Jacobi transforms went closed-form."""
    m, q = state.mass, state.pos
    s2 = state.step_s2
    n = q.shape[0]
    # The large-N route assumes every slot is live (no mask support:
    # masked slots would feed their positions into the mesh bounds and
    # density deposit) and needs at least one planet pair for the
    # planet-planet mesh — with n < 3 the split degenerates (n = 1 has
    # an empty q[1:], whose bounding box is undefined), so small
    # systems stay on the exact direct path regardless of force_mode.
    if (cfg is not None and getattr(cfg, "force_mode", "direct") != "direct"
            and n >= 3):
        # many-planet route (VERDICT round-3 item 7): the direct part of
        # the interaction kick is the proven wall at large N (90% of the
        # N=4096 substep, at the VPU pair-sweep roofline —
        # data/profile_whfast.json), so share the large-N force engines
        # (tiled Pallas / P3M mesh) with the classical rollouts.  The
        # Kepler-part gradient below stays exact O(N).  P3M approximates
        # the direct force (smooth split, ~1e-3 p99 relative error);
        # the induced energy-drift budget vs the exact kick is measured
        # by tools/bench_whfast_largen.py and documented in
        # data/bench_whfast_largen.json.
        from .largen import make_force_fn

        if getattr(cfg, "force_mode", "direct") == "p3m":
            # the central mass through the mesh would put its
            # TSC-smeared near field (O(1) relative error at the inner
            # planets' radii) straight into the kick — and that term
            # mostly cancels against the analytic Kepler gradient
            # below, so the cancellation must be exact.  Split: body 0
            # (dominant mass, Jacobi order) gets the exact O(N) pair
            # force; the mesh sees only the planet-planet field, whose
            # scale IS the interaction force.
            force_fn = make_force_fn(cfg, n - 1, q.shape[-1],
                                     interpret=jax.default_backend()
                                     != "tpu")
            F_pp, _dropped = force_fn(q[1:], m[1:], jnp.sqrt(s2), dyn.G)
            d0 = q[1:] - q[0][None, :]
            r2_0 = jnp.sum(d0 * d0, axis=1) + s2
            r0 = jnp.sqrt(jnp.where(r2_0 > 0, r2_0, 1.0))
            w0 = jnp.where(r2_0 > 0,
                           dyn.G * m[0] * m[1:] / (r0 * r0 * r0), 0.0)
            F_sp = -w0[:, None] * d0          # pull toward the star
            F = jnp.concatenate([-jnp.sum(F_sp, axis=0, keepdims=True),
                                 F_pp + F_sp], axis=0)
        else:
            force_fn = make_force_fn(cfg, n, q.shape[-1],
                                     interpret=jax.default_backend()
                                     != "tpu")
            F, _dropped = force_fn(q, m, jnp.sqrt(s2), dyn.G)
    else:
        F = force_auto(q, m, jnp.sqrt(s2), dyn.G, state.mask, cfg)
    msafe = jnp.where(m > 0.0, m, 1.0)
    a_direct = F / msafe[:, None]

    jac_pos, _ = to_jacobi(m, q, q)
    cum = jnp.cumsum(m)
    Mprev = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]])
    live = (jnp.arange(n) >= 1) & (m > 0.0)
    jr2 = jnp.sum(jac_pos * jac_pos, axis=1) + s2
    jr = jnp.sqrt(jnp.where(live, jr2, 1.0))
    w = jnp.where(live, dyn.G * m / (jr * jr * jr), 0.0)[:, None] * jac_pos
    # S_k = sum_{i > k} w_i: total minus inclusive prefix
    cw = jnp.cumsum(w, axis=0)
    S = cw[-1][None, :] - cw
    a_kep_grad = (Mprev / msafe)[:, None] * w - S
    # a_int = a_direct + grad V_kep / m
    return jnp.where((m > 0.0)[:, None], a_direct + a_kep_grad, 0.0)


def whfast_substep(state: SimState, dyn, cfg, h) -> SimState:
    """Kepler half-drift, interaction kick, Kepler half-drift
    (whfast_scheme.py:71-93)."""
    dt2 = 0.5 * h
    iters = int(getattr(cfg, "whfast_kepler_iters", 8))
    state = wh_kepler_drift(state, dyn, dt2, kepler_iters=iters)
    acc = wh_interaction_accel(state, dyn, cfg)
    state = state.replace(vel=state.vel + h * acc)
    state = wh_kepler_drift(state, dyn, dt2, kepler_iters=iters)
    return state


def whfast_corrector(state: SimState, dyn, cfg, h_ref) -> SimState:
    """WHFast startup corrector: half-kick of the interaction
    acceleration (whfast_scheme.py:95-123)."""
    acc = wh_interaction_accel(state, dyn, cfg)
    return state.replace(vel=state.vel + 0.5 * h_ref * acc)
