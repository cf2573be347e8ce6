"""Fused-kernel coverage of the non-default ham_soft variants
(VERDICT round-2 item 3): the reflection barrier policy and
``eps_grad_mode="reference"``, each checked against the XLA scan path
in interpret mode — including a clamp-saturated / unconverged-h_i
state (round-2 weak item 5: the 8-iteration SPH solve's truncation is
the model; both engines must agree where it does NOT converge).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.parallel.batch_engine import build_batch
from nbodysimproject_tpu.integrators.step import macro_step_dynamic
from nbodysimproject_tpu.ops.pallas_hamsoft import hamsoft_multistep


def _population(B, key=0, spread=0.01):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    base_q = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]], jnp.float32)
    base_v = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [-0.5, 0.0]], jnp.float32)
    pos = base_q[None] + spread * jax.random.normal(k1, (B, 3, 2),
                                                    jnp.float32)
    vel = base_v[None] + spread * jax.random.normal(k2, (B, 3, 2),
                                                    jnp.float32)
    mass = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.1], jnp.float32),
                            (B, 3))
    mask = jnp.ones((B, 3), bool)
    return mass, pos, vel, mask


def _saturated_population(B, key=5):
    """Sparse, widely-separated systems: the SPH update h_raw = eta
    sqrt(m/Sigma) exceeds eps_max on every lane, so the h_i clamp
    saturates and (in reference grad mode) the exact gradient
    degenerates to the fallback branch."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    base_q = jnp.asarray([[0.0, 0.0], [25.0, 0.0], [0.0, 40.0]],
                         jnp.float32)
    base_v = jnp.asarray([[0.0, 0.0], [0.0, 0.2], [-0.1, 0.0]], jnp.float32)
    pos = base_q[None] + 0.5 * jax.random.normal(k1, (B, 3, 2), jnp.float32)
    vel = base_v[None] + 0.02 * jax.random.normal(k2, (B, 3, 2),
                                                  jnp.float32)
    mass = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.1], jnp.float32),
                            (B, 3))
    mask = jnp.ones((B, 3), bool)
    return mass, pos, vel, mask


@functools.partial(jax.jit, static_argnames=("cfg", "T", "nsm"))
def _run_xla(states, dyns, cfg, dt, T, nsm):
    def body(s, _):
        step = lambda s1, d1: macro_step_dynamic(s1, d1, cfg, dt, nsm)
        return jax.vmap(step)(s, dyns), None

    out, _ = jax.lax.scan(body, states, None, length=T)
    return out


def _run_fused(states, dyns, cfg, T, nsm, DT):
    from nbodysimproject_tpu.analysis.fused import _kernel_policy

    n_sub = np.asarray(dyns.n_sub)
    h = DT / np.maximum(n_sub, 1).astype(np.float32)
    B = states.pos.shape[0]
    return hamsoft_multistep(
        states.pos, states.vel, states.mass, states.eps, states.pi,
        k_soft=dyns.k_soft, mu=dyns.mu_soft, alpha=dyns.alpha_run,
        eps_min=dyns.min_softening, eps_max=dyns.max_softening,
        h=jnp.asarray(h), n_sub=dyns.n_sub, n_steps=T, n_sub_max=nsm,
        G=1.0, k_wall=float(cfg.k_wall), eta=float(cfg.eta),
        jcap=float(cfg.j_max_cap), bexp=int(cfg.barrier_exponent),
        lanes=B // 8, interpret=True, policy=_kernel_policy(cfg),
        grad_mode=str(cfg.eps_grad_mode),
        lam_align=float(cfg.lambda_softening))


def _assert_parity(fused, out, pi_tol=1e-3):
    po, vo, eo, pio = fused
    np.testing.assert_allclose(np.asarray(po), np.asarray(out.pos),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(out.vel),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(eo), np.asarray(out.eps),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pio), np.asarray(out.pi),
                               rtol=pi_tol, atol=5e-5)


def test_reflection_policy_parity():
    """Reflection barrier: the fused kernel's closed-form folds
    reproduce the XLA refl branches, including actual wall crossings."""
    B, T, DT = 16, 3, 0.01
    cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True,
                       use_soft_barrier=False)
    mass, pos, vel, mask = _population(B)
    states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2, 0.0,
                               DT)
    # push (eps, pi) so the spring rotation actually crosses the walls
    # on a subset of lanes
    eps_hot = jnp.where(jnp.arange(B) % 2 == 0,
                        dyns.max_softening * 0.98, states.eps)
    pi_hot = jnp.where(jnp.arange(B) % 3 == 0,
                       jnp.asarray(0.5, jnp.float32), states.pi)
    states = states.replace(eps=eps_hot.astype(jnp.float32),
                            pi=pi_hot.astype(jnp.float32),
                            s=eps_hot.astype(jnp.float32),
                            step_s2=(eps_hot * eps_hot).astype(jnp.float32))
    nsm = int(np.asarray(dyns.n_sub).max())

    out = _run_xla(states, dyns, cfg, jnp.float32(DT), T, nsm)
    fused = _run_fused(states, dyns, cfg, T, nsm, DT)
    _assert_parity(fused, out)
    # the fold must actually have triggered (eps strictly inside walls)
    eo = np.asarray(fused[2])
    assert (eo <= np.asarray(dyns.max_softening) + 1e-6).all()
    assert (eo >= np.asarray(dyns.min_softening) - 1e-6).all()


def test_reference_grad_parity():
    """eps_grad_mode='reference' (bug-compatible fallback gradient):
    fused kernel vs XLA scan on a typical population."""
    B, T, DT = 16, 3, 0.01
    cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True,
                       eps_grad_mode="reference")
    mass, pos, vel, mask = _population(B, key=1)
    states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2, 0.0,
                               DT)
    nsm = int(np.asarray(dyns.n_sub).max())
    out = _run_xla(states, dyns, cfg, jnp.float32(DT), T, nsm)
    fused = _run_fused(states, dyns, cfg, T, nsm, DT)
    _assert_parity(fused, out)


@pytest.mark.parametrize("grad_mode", ["exact", "reference"])
@pytest.mark.parametrize("soft", [True, False])
def test_saturated_unconverged_state_parity(grad_mode, soft):
    """Clamp-saturated / unconverged-h_i states (round-2 weak item 5):
    sparse systems whose SPH solve pins at the cap.  In reference grad
    mode the degenerate-fallback branch actually fires; both engines
    must take the same branch and agree."""
    B, T, DT = 16, 2, 0.01
    cfg = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True,
                       eps_grad_mode=grad_mode, use_soft_barrier=soft)
    mass, pos, vel, mask = _saturated_population(B)
    states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2, 0.0,
                               DT)

    # confirm this state is what the test claims: the unclipped SPH
    # update leaves the clamp interval (saturation), checked through
    # the XLA model
    from nbodysimproject_tpu.ops import eps_model as em

    def h_raw_of(s, d):
        eps_floor = jnp.maximum(jnp.minimum(d.min_softening,
                                            d.max_softening), 1e-12)
        eps_cap = jnp.maximum(eps_floor, d.max_softening)
        h = em.solve_hi(s.pos, s.mass, h0=s.eps, eps_floor=eps_floor,
                        eps_cap=eps_cap, eta=cfg.eta, mask=s.mask)
        _, r2, pm = em._geometry(s.pos, s.mask)
        _, Sig, _ = em._kernel_at(r2, pm, s.mass, h)
        return cfg.eta * jnp.sqrt(s.mass / jnp.maximum(Sig, 1e-30)), \
            eps_cap

    h_raw, cap = jax.vmap(h_raw_of)(states, dyns)
    assert bool((np.asarray(h_raw) > np.asarray(cap)[:, None] + 1e-9).any())

    nsm = int(np.asarray(dyns.n_sub).max())
    out = _run_xla(states, dyns, cfg, jnp.float32(DT), T, nsm)
    fused = _run_fused(states, dyns, cfg, T, nsm, DT)
    _assert_parity(fused, out, pi_tol=2e-3)


def test_fused_gating_covers_variants():
    """fused_path_applicable admits the newly-covered variants and
    still rejects the genuinely-uncovered ones."""
    from nbodysimproject_tpu.analysis.fused import fused_path_applicable

    base = nb.SimConfig(integrator_mode="ham_soft", fast_float32=True,
                        use_fused_analysis=True)
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    B = 8 * 256
    got = fused_path_applicable(base.replace(use_soft_barrier=False),
                                "core", B, jnp.float32)
    assert got == on_tpu
    got = fused_path_applicable(base.replace(eps_grad_mode="reference"),
                                "core", B, jnp.float32)
    assert got == on_tpu
    assert not fused_path_applicable(
        base.replace(use_legacy_eps_star=True), "core", B, jnp.float32)
    assert not fused_path_applicable(
        base.replace(integrator_mode="verlet"), "core", B, jnp.float32)
    assert not fused_path_applicable(
        base.replace(integrator_mode="kepler_split"), "core", B,
        jnp.float32)
