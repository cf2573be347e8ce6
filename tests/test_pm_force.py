"""P3M / PM large-N force tests (VERDICT round-1 item 10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysimproject_tpu.ops.forces import gravitational_force
from nbodysimproject_tpu.ops.pm_force import pm_force, p3m_force


def _cloud(N, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1.0, (N, 2)))
    m = jnp.asarray(np.abs(rng.normal(1, 0.3, N)))
    return q, m


class TestP3M:
    def test_matches_direct_force(self):
        """Plummer-softened forces to <2% at p99, <10% worst-case —
        tighter than a theta=0.5 Barnes-Hut (the approximation the
        reference's results PDF claims without shipping code)."""
        q, m = _cloud(2048)
        Ng = 256
        eps = float(q.max() - q.min()) * 1.02 / Ng  # ~1 cell
        Fd = gravitational_force(q, m, eps=eps, G=1.0)
        Fp, dropped = p3m_force(q, m, eps, 1.0, Ng=Ng, r_cut_cells=6.0)
        assert int(dropped) == 0
        rel = np.asarray(jnp.sqrt(jnp.sum((Fp - Fd) ** 2, 1))
                         / jnp.maximum(jnp.sqrt(jnp.sum(Fd ** 2, 1)),
                                       1e-30))
        assert np.median(rel) < 5e-3
        assert np.percentile(rel, 99) < 2e-2
        assert rel.max() < 1e-1

    def test_newtons_third_law_statistically(self):
        """The PP part is exactly antisymmetric and the mesh part is a
        convolution, so the net force sums to ~zero relative to the
        typical force scale."""
        q, m = _cloud(1024, seed=1)
        Ng = 256
        eps = float(q.max() - q.min()) / Ng
        Fp, _ = p3m_force(q, m, eps, 1.0, Ng=Ng, r_cut_cells=6.0)
        scale = float(jnp.sqrt(jnp.sum(Fp * Fp, 1)).mean())
        net = np.asarray(jnp.abs(jnp.sum(Fp, axis=0)))
        assert (net < 2e-2 * scale * np.sqrt(len(m))).all()

    def test_two_body_against_exact(self):
        q = jnp.asarray([[0.0, 0.0], [0.5, 0.0]])
        m = jnp.asarray([2.0, 1.0])
        eps = 0.05
        Fd = gravitational_force(q, m, eps=eps, G=1.0)
        Fp, _ = p3m_force(q, m, eps, 1.0, Ng=128, r_cut_cells=6.0,
                          bounds=((-1.0, -1.0), (1.0, 1.0)))
        # atol at the mesh-noise floor (~1e-4 of the force scale): the
        # exact y-component is 0 and picks up grid residue
        np.testing.assert_allclose(np.asarray(Fp), np.asarray(Fd),
                                   rtol=5e-3, atol=2e-3)

    def test_window_overflow_is_counted(self):
        """A deliberately tiny pp_window truncates pairs and reports
        them instead of silently mislabelling (no silent caps)."""
        q, m = _cloud(4096, seed=2)
        eps = 0.02
        _, dropped = p3m_force(q, m, eps, 1.0, Ng=256, r_cut_cells=6.0,
                               pp_window=512)
        assert int(dropped) > 0


class TestPMMeshOnly:
    def test_far_field_accuracy(self):
        """Pure PM (no PP pass) is accurate in the far field / large
        softening regime."""
        q, m = _cloud(1024, seed=3)
        Ng = 256
        cell = float(q.max() - q.min()) * 1.02 / Ng
        eps = 4.0 * cell
        Fd = gravitational_force(q, m, eps=eps, G=1.0)
        Fp = pm_force(q, m, eps, 1.0, Ng=Ng)
        rel = np.asarray(jnp.sqrt(jnp.sum((Fp - Fd) ** 2, 1))
                         / jnp.maximum(jnp.sqrt(jnp.sum(Fd ** 2, 1)),
                                       1e-30))
        assert np.median(rel) < 2e-2
