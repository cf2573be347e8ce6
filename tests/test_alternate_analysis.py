"""Alternate core/full analysis paths (stability_analyzer.py:262-519)."""

import numpy as np
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.analysis import StabilityAnalyzer


def _sim():
    m, p, v = nb.SpecializedGenerators.generate_hierarchical_triple(
        separation_ratio=20.0)
    p = p - (m[:, None] * p).sum(0) / m.sum()
    return nb.NBodySimulation(masses=m, positions=p, velocities=v,
                              integrator_mode="verlet", softening=0.05)


def test_run_core_analysis_keys_and_horizon():
    an = StabilityAnalyzer(_sim(), n_steps=50, dt=0.01, mode="core")
    res = an._run_core_analysis()
    for k in ("energy_drift", "max_radial_distance", "virial_radius",
              "MEGNO", "lyapunov_time", "crossing_time", "is_stable",
              "n_steps", "total_time"):
        assert k in res, k
    # horizon extends to 10 crossing times (stability_analyzer.py:272-276)
    assert res["total_time"] >= 10 * res["crossing_time"] - 1e-9 or \
        res["n_steps"] == 50
    assert res["energy_drift"] < 1e-3
    assert res["max_radial_distance"] > 0


def test_run_full_analysis_features_and_escapes():
    an = StabilityAnalyzer(_sim(), n_steps=50, dt=0.01, mode="full")
    res = an._run_full_analysis()
    assert res["mode"] == "full"
    assert "total_mass" in res          # ML feature set merged in
    assert 0.0 <= res["escape_fraction"] <= 1.0


def test_energy_drift_tolerance_scaling():
    an = StabilityAnalyzer(_sim(), n_steps=10, dt=0.01)
    t1 = an._energy_drift_tolerance()
    an.dt = 0.02
    t2 = an._energy_drift_tolerance()
    assert t2 == pytest.approx(t1 * 2 ** 1.5)  # dt^1.5 law (:63-67)


def test_virial_radius_positive():
    an = StabilityAnalyzer(_sim(), n_steps=10, dt=0.01)
    assert an._quick_virial_radius() > 0
    assert an._compute_virial_radius() > 0
