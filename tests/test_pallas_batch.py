"""Fused multi-step batched Verlet kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb


def _batch(B=16, n=3, d=2, seed=0):
    import jax.numpy as jnp

    from nbodysimproject_tpu.parallel import build_batch

    cfg = nb.SimConfig(integrator_mode="verlet")
    rng = np.random.default_rng(seed)
    base_q = np.zeros((n, d))
    base_q[1, 0] = 1.0
    base_q[2, 1] = 2.0
    q = base_q[None] + 0.01 * rng.normal(size=(B, n, d))
    m = np.broadcast_to(np.linspace(1.0, 0.1, n), (B, n)).copy()
    v = rng.normal(size=(B, n, d)) * 0.3
    mask = np.ones((B, n), bool)
    return cfg, build_batch(jnp.asarray(m), jnp.asarray(q), jnp.asarray(v),
                            jnp.asarray(mask), cfg, 1.0, 1e-3, 0.0, 0.01)


def test_matches_xla_scan():
    import jax.numpy as jnp

    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep
    from nbodysimproject_tpu.parallel import integrate_batch

    cfg, (states, dyns) = _batch()
    ref = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 40, 1)
    po, vo = verlet_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=40,
                              lanes=2, interpret=True)
    np.testing.assert_allclose(np.asarray(po), np.asarray(ref.pos),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(ref.vel),
                               rtol=1e-7, atol=1e-8)


def test_momentum_conserved():
    from nbodysimproject_tpu.ops.pallas_batch import verlet_multistep

    cfg, (states, dyns) = _batch(B=8)
    p0 = np.asarray((states.mass[..., None] * states.vel).sum(axis=1))
    po, vo = verlet_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=100,
                              lanes=1, interpret=True)
    m = np.asarray(states.mass)
    p1 = (m[..., None] * np.asarray(vo)).sum(axis=1)
    assert np.abs(p1 - p0).max() < 1e-12
