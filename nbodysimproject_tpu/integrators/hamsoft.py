"""ham_soft: Strang-split integrator on the extended phase space
(q, p, eps, pi).

H_ext = T(p) + V_grav(q, eps) + S_bar(eps) + pi^2/(2 mu)
        + (k/2) (eps - eps*(q))^2          (proofs PDF section 1)

Strang step  S(h/2) . V(h/2) . T(h) . V(h/2) . S(h/2):

* S — exact spring rotation of (Delta = eps - eps*, pi) at frozen q by
  theta = omega h/2, with momentum impulse p += J grad eps*,
  J = k I_tau, I_tau = (Delta0/omega) sin + (pi/(mu omega^2))(1 - cos),
  J capped so the max per-particle |dp| <= j_max_cap * max |p|
  (hamsoft_flows.py:427-759, second definition — the one that wins).
* V — p += (h/2) F(q, eps) and pi -= (h/2)(dV/deps + dS_bar/deps)
  (hamsoft_stepper.py:543-663, hamsoft_flows.py:1102-1132).
* T — q += h p/m (hamsoft_stepper.py:242).

Barrier policies (HSI:447-484): "soft" (default: cfg.use_soft_barrier)
adds smooth wall kicks on pi; "reflection" folds (eps, pi) into
[eps_min, eps_max] around each flow (hamsoft_stepper.py:247-308).

Small-theta trig uses the reference's Taylor series switch at 1e-8
(hamsoft_flows.py:575-585) — load-bearing for the O(h^2) drift bound in
float64 without float128 (SURVEY.md section 7, hard part #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.state import SimState
from ..ops.forces import gravitational_force, dV_d_epsilon
from ..ops.barrier import barrier_force
from ..ops.reflection import reflect_if_needed
from ..ops import eps_model as epsmod
from ..ops import softening as legacy_soft


def policy_is_soft(cfg) -> bool:
    """barrier_policy resolution (HSI:447-474): "soft" iff
    cfg.use_soft_barrier and not cfg.disable_barrier."""
    return bool(cfg.use_soft_barrier) and not bool(cfg.disable_barrier)


def _barrier_on(cfg) -> bool:
    return policy_is_soft(cfg) and cfg.k_wall > 0.0 and cfg.barrier_exponent >= 2


def sin_cos_stable(theta):
    """Taylor-stabilised sin/cos for |theta| < 1e-8
    (hamsoft_flows.py:575-585)."""
    th2 = theta * theta
    th3 = th2 * theta
    th4 = th2 * th2
    th5 = th4 * theta
    s_ser = theta - th3 / 6.0 + th5 / 120.0
    c_ser = 1.0 - th2 / 2.0 + th4 / 24.0
    small = jnp.abs(theta) < 1.0e-8
    return (jnp.where(small, s_ser, jnp.sin(theta)),
            jnp.where(small, c_ser, jnp.cos(theta)))


def eps_target(state: SimState, dyn, cfg, q=None):
    """eps* honouring fixed/legacy/production mode selection
    (hamsoft_eps_model.py:78-91)."""
    q = state.pos if q is None else q
    if cfg.fixed_eps_star:
        v = cfg.eps_star_value
        if v is not None and v == v:
            return jnp.asarray(v, q.dtype)
        return dyn.s0
    if cfg.use_legacy_eps_star:
        return legacy_soft.eps_target(q, alpha=1.0, lam=cfg.lambda_softening,
                                      mask=state.mask)
    return epsmod.eps_target_production(
        q, state.mass, h0=state.eps, alpha=dyn.alpha_run,
        eps_min=dyn.min_softening, eps_max=dyn.max_softening, eta=cfg.eta,
        clamp=policy_is_soft(cfg), mask=state.mask)


@functools.lru_cache(maxsize=None)
def _esg_vmap_fn(eta: float, clamp: bool, use_fallback: bool,
                 lam_align: float):
    """(eps*, grad) as a ``custom_vmap`` function: the unbatched body is
    the XLA evaluation (ops/eps_model.py — unchanged semantics for the
    facade, CPU, and float64 paths), while a float32 accelerator vmap
    dispatches the whole batch to the fused VMEM kernel
    (ops/pallas_eps.py), collapsing the scan path's ~100 (B, N, N)
    HBM-materialised intermediates per substep into one kernel."""

    def _plain(q, m, h0, alpha, emin, emax, mask):
        return epsmod.eps_star_and_grad(
            q, m, h0=h0, alpha=alpha, eps_min=emin, eps_max=emax,
            eta=eta, clamp=clamp, mask=mask, lam_align=lam_align,
            use_fallback=use_fallback)

    f = jax.custom_batching.custom_vmap(_plain)

    @f.def_vmap
    def _rule(axis_size, in_batched, q, m, h0, alpha, emin, emax, mask):
        B = axis_size

        def lift(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (B,) + jnp.shape(x))

        q, m, h0, alpha, emin, emax, mask = (
            lift(a, b) for a, b in zip(
                (q, m, h0, alpha, emin, emax, mask), in_batched))

        n = q.shape[1]
        use_kernel = (q.dtype == jnp.float32 and q.ndim == 3
                      and n <= 16 and B % 1024 == 0
                      and jax.default_backend() != "cpu")
        if use_kernel:
            from ..ops.pallas_eps import eps_star_and_grad_fused

            es, grad = eps_star_and_grad_fused(
                q, m, h0, alpha, emin, emax, mask, eta=eta, clamp=clamp,
                use_fallback=use_fallback, lam_align=lam_align)
        else:
            es, grad = jax.vmap(_plain)(q, m, h0, alpha, emin, emax, mask)
        return (es, grad), (True, True)

    return f


def eps_star_and_grad(state: SimState, dyn, cfg, q=None):
    """(eps*, grad) for the spring flow.  NOTE: the reference's
    ``EpsilonModel.eps_star_and_grad`` (hamsoft_eps_model.py:94-234)
    uses the *production* target unconditionally here — fixed/legacy
    modes affect only ``eps_target`` — so we do the same."""
    q = state.pos if q is None else q
    kwargs = dict(eta=cfg.eta, clamp=policy_is_soft(cfg),
                  lam_align=cfg.lambda_softening,
                  use_fallback=(cfg.eps_grad_mode == "reference"))
    if cfg.fused_eps_grad:
        fn = _esg_vmap_fn(float(kwargs["eta"]), bool(kwargs["clamp"]),
                          bool(kwargs["use_fallback"]),
                          float(kwargs["lam_align"]))
        return fn(q, state.mass, state.eps, dyn.alpha_run,
                  dyn.min_softening, dyn.max_softening, state.mask)
    return epsmod.eps_star_and_grad(
        q, state.mass, h0=state.eps, alpha=dyn.alpha_run,
        eps_min=dyn.min_softening, eps_max=dyn.max_softening, **kwargs,
        mask=state.mask)


def grad_eps_target(state: SimState, dyn, cfg, q=None):
    """HSI._grad_eps_target (HSI:665-745): always the Omega-corrected
    SPH gradient, sign-aligned against the legacy gradient."""
    q = state.pos if q is None else q
    g = epsmod.production_grad_omega(
        q, state.mass, h0=state.eps, alpha=dyn.alpha_run,
        eps_min=dyn.min_softening, eps_max=dyn.max_softening, eta=cfg.eta,
        mask=state.mask)
    g_ref = legacy_soft.grad_eps_target(q, alpha=1.0,
                                        lam=cfg.lambda_softening,
                                        mask=state.mask)
    dot = jnp.sum(g * g_ref)
    return jnp.where(jnp.isfinite(dot) & (dot < 0.0), -g, g)


def _bar_force(cfg, dyn, eps):
    return barrier_force(eps, dyn.min_softening, dyn.max_softening,
                         k_wall=dyn.k_wall, n=cfg.barrier_exponent)


def _fold(cfg, dyn, eps, pi):
    """Reflection fold used around flows when policy == reflection
    (hamsoft_barrier_controller.py:27-69 with h = 0)."""
    return reflect_if_needed(eps, pi, dyn.min_softening, dyn.max_softening)


def _row_max_norm(x, mask=None):
    r2 = jnp.sum(x * x, axis=1)
    # derivative-safe |x|: sqrt at exactly 0 has an undefined AD
    # derivative (NaN through reverse mode — hit whenever the eps*
    # gradient degenerates to 0, e.g. a saturated SPH solve); take the
    # subgradient 0 there with the primal value unchanged
    pos = r2 > 0.0
    r = jnp.where(pos, jnp.sqrt(jnp.where(pos, r2, 1.0)), 0.0)
    if mask is not None:
        r = jnp.where(mask, r, 0.0)
    return jnp.max(r) if r.shape[0] else jnp.zeros((), x.dtype)


def spring_half(state: SimState, dyn, cfg, h, es_grad=None) -> SimState:
    """S(h/2): exact harmonic rotation + J-capped momentum impulse
    (hamsoft_flows.py:427-759 via hamsoft_stepper.py:47-133)."""
    out, _cache = spring_half_cached(state, dyn, cfg, h, es_grad)
    return out


def spring_half_cached(state: SimState, dyn, cfg, h, es_grad=None):
    """spring_half returning (state, (eps_star, grad)).

    The S-flow does not move q, so its (eps*, grad) evaluation stays
    valid for an immediately following S-flow at the same positions —
    the last S of Strang substep k and the first S of substep k+1.
    Passing ``es_grad`` skips the SPH solve + reverse sweep, the
    dominant per-substep cost; the decision is structural (not
    data-dependent), so the saving survives vmap.
    """
    soft = policy_is_soft(cfg)
    refl = not soft and not cfg.disable_barrier

    eps0 = state.eps
    pi0 = state.pi
    if refl:
        eps0, pi0 = _fold(cfg, dyn, eps0, pi0)  # s_half pre-fold (:107-117)

    if cfg.freeze_s_subsystem:
        out = state.replace(eps=eps0, pi=pi0, s=eps0, step_s2=eps0 * eps0)
        return out, es_grad

    dt_f = 0.5 * h
    m = state.mass
    p = state.momenta()

    if es_grad is None:
        eps_star, grad = eps_star_and_grad(state, dyn, cfg)
    else:
        eps_star, grad = es_grad

    mu = dyn.mu_soft
    mu = jnp.where(jnp.isfinite(mu) & (mu != 0.0), mu, 1.0)
    k_s = jnp.where(jnp.isfinite(dyn.k_soft), dyn.k_soft, 0.0)

    k_eff = k_s  # curvature branch is dead code in the reference
                 # (hamsoft_flows.py:537-567: k_eff = k_s on every path)
    has_spring = (k_eff > 0.0) & (mu > 0.0)
    omega = jnp.sqrt(jnp.where(has_spring, k_eff / mu, 0.0))
    theta = omega * dt_f
    sin_t, cos_t = sin_cos_stable(theta)

    if _barrier_on(cfg):
        pi_kick1 = 0.5 * dt_f * _bar_force(cfg, dyn, eps0)
    else:
        pi_kick1 = jnp.zeros_like(pi0)

    Delta0 = eps0 - eps_star
    pi_in = pi0 + pi_kick1

    rotating = has_spring & (omega != 0.0)
    om_safe = jnp.where(rotating, omega, 1.0)
    mu_omega = jnp.sqrt(mu * jnp.maximum(k_eff, 0.0))
    denom = jnp.where(rotating, mu * om_safe * om_safe, 1.0)

    delta_t = jnp.where(rotating,
                        Delta0 * cos_t + (pi_in / (mu * om_safe)) * sin_t,
                        Delta0)
    eta_t = jnp.where(rotating, pi_in * cos_t - mu_omega * Delta0 * sin_t, pi_in)
    I_tau = jnp.where(rotating,
                      (Delta0 / om_safe) * sin_t + (pi_in / denom) * (1.0 - cos_t),
                      0.0)

    eps_rot = eps_star + delta_t

    if _barrier_on(cfg):
        pi_kick2 = 0.5 * dt_f * _bar_force(cfg, dyn, eps_rot)
    else:
        pi_kick2 = jnp.zeros_like(pi0)
    pi_out = eta_t + pi_kick2

    # --- J-cap (hamsoft_flows.py:692-738) ---
    J = k_s * I_tau
    p_scale = jnp.maximum(_row_max_norm(p, state.mask), 1.0e-12)
    dp_inf = _row_max_norm(J * grad, state.mask)
    threshold = cfg.j_max_cap * p_scale
    scale = jnp.where(dp_inf > threshold,
                      threshold / jnp.maximum(dp_inf, 1e-300), 1.0)
    J_applied = J * scale
    p_new = p + J_applied * grad

    eps_fin, pi_fin = eps_rot, pi_out
    if refl:
        eps_fin, pi_fin = _fold(cfg, dyn, eps_fin, pi_fin)  # _sflow_half post-fold

    m_safe = jnp.where(state.mask, m, 1.0)
    vel = p_new / m_safe[:, None]
    vel = jnp.where(state.mask[:, None], vel, state.vel)
    out = state.replace(vel=vel, eps=eps_fin, pi=pi_fin,
                        s=eps_fin, step_s2=eps_fin * eps_fin)
    return out, (eps_star, grad)


def v_half_kick(state: SimState, dyn, cfg, h) -> SimState:
    """V(h/2): momentum kick at current eps plus the conjugate pi kick
    (hamsoft_stepper.py:543-663).

    The reference also evaluates eps*(q) here purely for probe output
    (its pi_half_kick ignores the spring term — the spring lives in S);
    we skip that dead evaluation, saving one SPH solve per kick.
    """
    h_half = 0.5 * h
    eps_used = state.eps
    F = gravitational_force(state.pos, state.mass, eps=eps_used, G=dyn.G,
                            mask=state.mask)
    m_safe = jnp.where(state.mask, state.mass, 1.0)
    vel = state.vel + h_half * F / m_safe[:, None]
    vel = jnp.where(state.mask[:, None], vel, state.vel)

    if cfg.freeze_s_subsystem:
        return state.replace(vel=vel)

    dU = dV_d_epsilon(state.pos, state.mass, eps_used, dyn.G, mask=state.mask)
    if _barrier_on(cfg):
        dUbar = -_bar_force(cfg, dyn, eps_used)
    else:
        dUbar = jnp.zeros_like(dU)
    pi_new = state.pi - (dU + dUbar) * h_half
    return state.replace(vel=vel, pi=pi_new)


def t_drift(state: SimState, dyn, cfg, h) -> SimState:
    """T(h): q += h v (hamsoft_stepper.py:242,
    integration_scheme_base.py:41-43)."""
    return state.replace(pos=state.pos + h * state.vel)


def strang_substep(state: SimState, dyn, cfg, h) -> SimState:
    """One full Strang substep (hamsoft_stepper.py:247-308)."""
    out, _cache = strang_substep_cached(state, dyn, cfg, h, None)
    return out


def strang_substep_cached(state: SimState, dyn, cfg, h, es_grad=None):
    """Strang substep threading the (eps*, grad) cache: the incoming
    cache (if any) feeds the leading S-flow; the trailing S-flow's
    evaluation is returned for the next substep (valid because only
    T moves q, and both flows around a substep boundary see the same
    positions)."""
    soft = policy_is_soft(cfg)
    refl = not soft and not cfg.disable_barrier

    if refl:
        e, p = _fold(cfg, dyn, state.eps, state.pi)
        state = state.replace(eps=e, pi=p, s=e, step_s2=e * e)

    if cfg._validate_S_only:
        state, es_grad = spring_half_cached(state, dyn, cfg, h, es_grad)
        state, es_grad = spring_half_cached(state, dyn, cfg, h, es_grad)
        if refl:
            e, p = _fold(cfg, dyn, state.eps, state.pi)
            state = state.replace(eps=e, pi=p, s=e, step_s2=e * e)
        return state, es_grad

    state, _eg = spring_half_cached(state, dyn, cfg, h, es_grad)
    state = v_half_kick(state, dyn, cfg, h)
    state = t_drift(state, dyn, cfg, h)
    state = v_half_kick(state, dyn, cfg, h)
    state, es_grad_out = spring_half_cached(state, dyn, cfg, h, None)

    if refl:
        e, p = _fold(cfg, dyn, state.eps, state.pi)
        state = state.replace(eps=e, pi=p, s=e, step_s2=e * e)
    return state, es_grad_out


def canonical_eom(state: SimState, dyn, cfg):
    """Exact canonical equations of motion for validation
    (HSI:897-982): returns (qdot, pdot, epsdot, pidot)."""
    m_safe = jnp.where(state.mask, state.mass, 1.0)
    p = state.momenta()
    qdot = p / m_safe[:, None]

    F_grav = gravitational_force(state.pos, state.mass, eps=state.eps,
                                 G=dyn.G, mask=state.mask)
    dVgrav = dV_d_epsilon(state.pos, state.mass, state.eps, dyn.G,
                          mask=state.mask)

    eps_star = eps_target(state, dyn, cfg)
    if cfg.eps_grad_mode == "reference":
        # HSI:942 uses _grad_eps_target — the sign-aligned Omega gradient
        grad = grad_eps_target(state, dyn, cfg)
    else:
        _es, grad = eps_star_and_grad(state, dyn, cfg)
    Delta = state.eps - eps_star
    pdot = F_grav + dyn.k_soft * Delta * grad

    epsdot = jnp.where(dyn.mu_soft != 0.0, state.pi / dyn.mu_soft, 0.0)

    if _barrier_on(cfg):
        dUbar = -_bar_force(cfg, dyn, state.eps)
    else:
        dUbar = jnp.zeros_like(dVgrav)
    pidot = -dVgrav - dyn.k_soft * Delta - dUbar
    return qdot, pdot, epsdot, pidot
