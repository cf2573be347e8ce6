"""Pallas tiled pairwise-force kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.ops.pallas_kernels import pairwise_force_pallas
from nbodysimproject_tpu.ops.forces import gravitational_force


@pytest.mark.parametrize("n", [17, 300, 700])
def test_matches_xla_dense(n, rng):
    import jax.numpy as jnp

    pos = jnp.asarray(rng.normal(size=(n, 2)) * 3)
    m = jnp.asarray(rng.uniform(0.1, 2.0, n))
    F_ref = gravitational_force(pos, m, eps=0.05, G=1.3)
    F_pal = pairwise_force_pallas(pos, m, 0.05, 1.3, ti=128, tj=256,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(F_pal), np.asarray(F_ref),
                               rtol=1e-10, atol=1e-11)


def test_momentum_conserving(rng):
    import jax.numpy as jnp

    n = 200
    pos = jnp.asarray(rng.normal(size=(n, 2)))
    m = jnp.asarray(rng.uniform(0.5, 1.5, n))
    F = np.asarray(pairwise_force_pallas(pos, m, 0.01, 1.0, ti=128, tj=256,
                                         interpret=True))
    assert np.abs(F.sum(axis=0)).max() < 1e-10 * np.abs(F).max()


def test_3d(rng):
    import jax.numpy as jnp

    n = 150
    pos = jnp.asarray(rng.normal(size=(n, 3)))
    m = jnp.asarray(rng.uniform(0.5, 1.5, n))
    F_ref = gravitational_force(pos, m, eps=0.05, G=1.0)
    F_pal = pairwise_force_pallas(pos, m, 0.05, 1.0, ti=128, tj=256,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(F_pal), np.asarray(F_ref),
                               rtol=1e-10, atol=1e-11)
