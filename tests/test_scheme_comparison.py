"""Integration-scheme quality ordering (resultsNbody.pdf section 6.3:
relative long-run |dH|: Verlet 1.0, Yoshida4 5e-2, ham_soft 1e-3..1e-4).

We assert the ordering and order-of-accuracy relations rather than the
PDF's exact ratios (those depend on its unspecified configs).
"""

import math

import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.diagnostics import Diagnostics


_VIN = math.sqrt(2.0)
TRIPLE = dict(
    masses=[1.0, 1.0, 0.5],
    positions=[[-0.5, 0.0], [0.5, 0.0], [10.0, 0.0]],
    velocities=[[0.0, -_VIN / 2], [0.0, _VIN / 2],
                [0.0, math.sqrt(0.25)]],
)


def _drift(mode, h, steps, cfg=None):
    sim = nb.NBodySimulation(config=cfg, integrator_mode=mode,
                             softening=0.05, **TRIPLE)
    d = Diagnostics(sim)
    H0 = d.compute_extended_hamiltonian()
    sim.run(h, steps)
    H1 = d.compute_extended_hamiltonian()
    return abs((H1 - H0) / H0)


def test_yoshida4_beats_verlet():
    """4th-order composition drifts far less than 2nd-order Verlet at
    the same step size."""
    dv = _drift("verlet", 0.02, 500)
    dy = _drift("yoshida4", 0.02, 500)
    assert dy < dv / 10


def test_verlet_second_order():
    d1 = _drift("verlet", 0.01, 400)
    d2 = _drift("verlet", 0.02, 200)
    # same horizon, double step: ~4x the drift
    assert 2.0 < d2 / d1 < 8.0


def test_yoshida4_fourth_order():
    d1 = _drift("yoshida4", 0.01, 400)
    d2 = _drift("yoshida4", 0.02, 200)
    # ~16x for a 4th-order scheme
    assert 6.0 < d2 / d1 < 40.0


def test_hamsoft_matches_verlet_scale_with_adaptive_eps():
    """ham_soft (exact-gradient mode) conserves its extended
    Hamiltonian at a level comparable to or better than Verlet at the
    same resolved step, while additionally adapting epsilon."""
    cfg = nb.SimConfig(disable_barrier=True)
    dh = _drift("ham_soft", 0.002, 500, cfg=cfg)
    dv = _drift("verlet", 0.002, 500)
    assert dh < max(10 * dv, 1e-5)
