"""Fused multi-step batched WHFast kernel (interpret mode on CPU).

Parity reference is the XLA scan path (integrators/whfast.py driven by
parallel/batch_engine.py), which is itself physics-tested against long
-run energy conservation in test_integrators_parity.py.
"""

import numpy as np
import pytest

import nbodysimproject_tpu as nb


def _planet_batch(B=16, n=3, d=2, seed=0, dtype=None):
    """Planetary hierarchy (Jacobi convention: dominant mass first)."""
    import jax.numpy as jnp

    from nbodysimproject_tpu.parallel import build_batch

    # whfast_kepler_iters=8: put the scan path on the same fixed-depth
    # Laguerre-Conway solver the kernel uses, so parity is solver-exact
    cfg = nb.SimConfig(integrator_mode="whfast", whfast_kepler_iters=8)
    rng = np.random.default_rng(seed)
    base_q = np.zeros((n, d))
    base_v = np.zeros((n, d))
    # circular-ish orbits at radii 1, 2, ... around the central mass
    for i in range(1, n):
        base_q[i, 0] = float(i)
        base_v[i, 1] = 1.0 / np.sqrt(float(i))
    m = np.concatenate([[1.0], np.full(n - 1, 1e-3)])
    q = base_q[None] + 0.005 * rng.normal(size=(B, n, d))
    v = base_v[None] + 0.005 * rng.normal(size=(B, n, d))
    mask = np.ones((B, n), bool)
    mb = np.broadcast_to(m, (B, n)).copy()
    return cfg, build_batch(jnp.asarray(mb), jnp.asarray(q),
                            jnp.asarray(v), jnp.asarray(mask), cfg, 1.0,
                            1e-3, 0.0, 0.01)


@pytest.mark.parametrize("d", [2, 3])
def test_matches_xla_scan(d):
    import jax.numpy as jnp

    from nbodysimproject_tpu.ops.pallas_whfast import whfast_multistep
    from nbodysimproject_tpu.parallel import integrate_batch

    cfg, (states, dyns) = _planet_batch(d=d)
    ref = integrate_batch(states, dyns, cfg, jnp.float64(0.01), 40, 1)
    po, vo = whfast_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=40,
                              lanes=2, interpret=True)
    # only rounding/convergence-level differences: the kernel fuses the
    # interior half-drift pairs D(h/2)D(h/2) -> D(h) and rounds the
    # Stumpff hyperbolic branch differently (exp-based); per-step
    # deviation is ~2e-10 (see test_single_step_matches_substep),
    # compounding roughly linearly on these near-integrable orbits
    np.testing.assert_allclose(np.asarray(po), np.asarray(ref.pos),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(ref.vel),
                               rtol=1e-5, atol=1e-7)


def test_single_step_matches_substep():
    """n_steps=1 reduces to exactly one D(h/2) K(h) D(h/2) substep —
    no cross-step drift fusion applies."""
    import jax
    import jax.numpy as jnp

    from nbodysimproject_tpu.integrators.whfast import whfast_substep
    from nbodysimproject_tpu.ops.pallas_whfast import whfast_multistep

    cfg, (states, dyns) = _planet_batch(B=8)
    ref = jax.vmap(lambda s, dy: whfast_substep(s, dy, cfg,
                                                jnp.float64(0.01)))(
        states, dyns)
    po, vo = whfast_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=1,
                              lanes=1, interpret=True)
    # agreement is solver-convergence-level, not ulp-level: the fixed
    # 8-iteration Laguerre-Conway chi oscillates at ~1e-12 rel once
    # converged, and the kernel's exp-based cosh/sinh rounds the last
    # iterations differently from the scan path's native cosh/sinh
    np.testing.assert_allclose(np.asarray(po), np.asarray(ref.pos),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(ref.vel),
                               rtol=1e-6, atol=1e-8)


def test_energy_error_bounded_not_secular():
    """Wisdom-Holman is symplectic: the splitting energy error
    oscillates at the interaction-Hamiltonian scale (~G m_p m_p / dr,
    ~1e-6 here) instead of growing secularly.  Asserted as a ratio:
    4x the integration time must not grow the error (measured:
    |dH(250)| = 2.9e-6, |dH(500)| = 1.0e-6 — oscillation, the total
    energy itself is near zero so a relative-drift test would be
    ill-conditioned)."""
    from nbodysimproject_tpu.diagnostics.energy import extended_hamiltonian
    from nbodysimproject_tpu.ops.pallas_whfast import whfast_multistep

    import jax

    cfg, (states, dyns) = _planet_batch(B=8)

    def dH_at(n_steps):
        po, vo = whfast_multistep(states.pos, states.vel, states.mass,
                                  states.step_s2, h=0.01, G=1.0,
                                  n_steps=n_steps, lanes=1, interpret=True)
        out = []
        for i in range(4):
            s0 = jax.tree_util.tree_map(lambda x: x[i], states)
            d0 = jax.tree_util.tree_map(lambda x: x[i], dyns)
            H0 = float(extended_hamiltonian(s0, d0, cfg))
            s1 = s0.replace(pos=po[i].astype(s0.pos.dtype),
                            vel=vo[i].astype(s0.vel.dtype))
            out.append(abs(float(extended_hamiltonian(s1, d0, cfg)) - H0))
        return np.asarray(out)

    short = dH_at(500)
    long = dH_at(2000)
    # bounded oscillation: no secular 4x growth, and absolute scale at
    # the planet-planet interaction energy (not the orbital energy)
    assert np.all(long < 5.0 * np.maximum(short, 1e-6))
    assert np.all(long < 5e-5)


def test_masked_slots_stay_inert():
    """Zero-mass padded slots neither move nor perturb live bodies."""
    import jax.numpy as jnp

    from nbodysimproject_tpu.ops.pallas_whfast import whfast_multistep

    cfg, (states, dyns) = _planet_batch(B=8, n=3)
    # same systems padded to 4 slots with a dead body at the origin
    pos4 = jnp.concatenate([states.pos,
                            jnp.zeros_like(states.pos[:, :1])], axis=1)
    vel4 = jnp.concatenate([states.vel,
                            jnp.zeros_like(states.vel[:, :1])], axis=1)
    mass4 = jnp.concatenate([states.mass,
                             jnp.zeros_like(states.mass[:, :1])], axis=1)
    p3, v3 = whfast_multistep(states.pos, states.vel, states.mass,
                              states.step_s2, h=0.01, G=1.0, n_steps=20,
                              lanes=1, interpret=True)
    p4, v4 = whfast_multistep(pos4, vel4, mass4, states.step_s2, h=0.01,
                              G=1.0, n_steps=20, lanes=1, interpret=True)
    np.testing.assert_allclose(np.asarray(p4[:, :3]), np.asarray(p3),
                               rtol=1e-12, atol=1e-12)
    assert np.all(np.isfinite(np.asarray(p4)))
