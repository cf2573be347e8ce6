"""Fused (eps*, grad) kernel (ops/pallas_eps.py) vs the XLA evaluation
(ops/eps_model.py), interpret mode on CPU.

The kernel feeds the ham_soft scan path's spring flow
(integrators/hamsoft.eps_star_and_grad) through a custom_vmap rule, so
parity here covers every configuration axis that rule dispatches on:
clamp on/off (soft vs reflection policy), use_fallback on/off
(eps_grad_mode), masked slots, d = 2 and 3, and the two states the
round-2 VERDICT called out — clamp-saturated and AD-degenerate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysimproject_tpu.ops import eps_model as epsmod
from nbodysimproject_tpu.ops.pallas_eps import eps_star_and_grad_fused

F32 = jnp.float32


def _xla_batch(q, m, h0, alpha, emin, emax, mask, *, eta, clamp,
               use_fallback, lam_align=0.3):
    def one(qi, mi, h0i, ai, loi, hii, ki):
        return epsmod.eps_star_and_grad(
            qi, mi, h0=h0i, alpha=ai, eps_min=loi, eps_max=hii, eta=eta,
            clamp=clamp, mask=ki, lam_align=lam_align,
            use_fallback=use_fallback)

    return jax.vmap(one)(q, m, h0, alpha, emin, emax, mask)


def _random_population(key, B, n, dim, mask_some=True):
    kq, km, kk = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, n, dim), F32) * 2.0
    m = jax.random.uniform(km, (B, n), F32, 0.2, 2.0)
    mask = jnp.ones((B, n), bool)
    if mask_some and n > 3:
        # vary the valid count across the batch
        counts = 3 + (jnp.arange(B) % (n - 2))
        mask = jnp.arange(n)[None, :] < counts[:, None]
    h0 = jnp.full((B,), 0.05, F32)
    alpha = jnp.full((B,), 0.12, F32)
    emin = jnp.full((B,), 1e-3, F32)
    emax = jnp.full((B,), 0.5, F32)
    return q, m, h0, alpha, emin, emax, mask


def _compare(args, *, eta=1.35, clamp=False, use_fallback=True,
             rtol=3e-4, atol=5e-6):
    es_k, g_k = eps_star_and_grad_fused(
        *args, eta=eta, clamp=clamp, use_fallback=use_fallback,
        interpret=True)
    es_x, g_x = _xla_batch(*args, eta=eta, clamp=clamp,
                           use_fallback=use_fallback)
    np.testing.assert_allclose(np.asarray(es_k), np.asarray(es_x),
                               rtol=rtol, atol=atol)
    scale = max(1e-6, float(np.max(np.abs(np.asarray(g_x)))))
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=rtol, atol=atol * scale + atol)


@pytest.mark.parametrize("clamp", [False, True])
@pytest.mark.parametrize("use_fallback", [False, True])
def test_parity_random(clamp, use_fallback):
    args = _random_population(jax.random.PRNGKey(0), B=16, n=5, dim=2)
    _compare(args, clamp=clamp, use_fallback=use_fallback)


def test_parity_d3():
    args = _random_population(jax.random.PRNGKey(1), B=8, n=4, dim=3)
    _compare(args, clamp=True, use_fallback=True)


def test_parity_clamp_saturated():
    """eps_max far below the solved h_i: the value clamp saturates, the
    exact gradient gates to zero, and with use_fallback the Omega
    gradient takes over — the round-2 VERDICT weak-#5 state."""
    q, m, h0, alpha, _lo, _hi, mask = _random_population(
        jax.random.PRNGKey(2), B=8, n=4, dim=2, mask_some=False)
    q = q * 10.0  # sparse -> h_i at the cap
    emin = jnp.full((8,), 1e-4, F32)
    emax = jnp.full((8,), 2e-4, F32)  # cap far below sparse h_i
    args = (q, m, h0, alpha, emin, emax, mask)
    for fb in (False, True):
        _compare(args, clamp=True, use_fallback=fb)
    # the saturated exact gradient must be exactly zero, and eps*
    # lands on the LOWER bound: the softmin undershoots the capped
    # h_i = 2e-4 by alpha*ln(n) >> (b - a), so the clip floors it
    es_k, g_k = eps_star_and_grad_fused(*args, clamp=True,
                                        use_fallback=False, interpret=True)
    assert float(jnp.max(jnp.abs(g_k))) == 0.0
    np.testing.assert_allclose(np.asarray(es_k), 1e-4, rtol=1e-6)


def test_parity_degenerate_symmetric():
    """Symmetric square: the exact gradient's row norms vanish by
    symmetry, activating the reference fallback's degeneracy branch."""
    sq = jnp.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]],
                     F32)
    B = 8
    q = jnp.broadcast_to(sq[None], (B, 4, 2))
    m = jnp.ones((B, 4), F32)
    mask = jnp.ones((B, 4), bool)
    h0 = jnp.full((B,), 0.05, F32)
    alpha = jnp.full((B,), 0.1, F32)
    emin = jnp.full((B,), 1e-3, F32)
    emax = jnp.full((B,), 10.0, F32)  # wide: no clamp interference
    args = (q, m, h0, alpha, emin, emax, mask)
    _compare(args, clamp=True, use_fallback=True)


def test_custom_vmap_cpu_fallback_bitwise():
    """On CPU the custom_vmap rule must route to the XLA evaluation:
    fused_eps_grad=True and False give bit-identical spring flows."""
    from nbodysimproject_tpu.core.config import SimConfig
    from nbodysimproject_tpu.parallel.batch_engine import (build_batch,
                                                           step_batch)

    B, n = 4, 3
    key = jax.random.PRNGKey(3)
    kq, kv = jax.random.split(key)
    pos = jax.random.normal(kq, (B, n, 2)) * 1.5
    vel = 0.1 * jax.random.normal(kv, (B, n, 2))
    mass = jnp.ones((B, n))
    mask = jnp.ones((B, n), bool)

    outs = []
    for flag in (True, False):
        cfg = SimConfig(integrator_mode="ham_soft", fused_eps_grad=flag)
        states, dyns = build_batch(mass, pos, vel, mask, cfg, 1.0, 5e-2,
                                   0.0, 0.01)
        out = step_batch(states, dyns, cfg, 0.01, 4)
        outs.append(jax.device_get(out.pos))
    np.testing.assert_array_equal(outs[0], outs[1])
