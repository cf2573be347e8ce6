"""Pathological-energy forcing gets the label right for the right
reason (round-2 weak item 7).

The |drift| > 10 -> forced-unstable rule
(minbody/batch_stability_analyzer.py:41-47) exists to catch physical
energy blow-up in near-singular encounters.  These tests pin the
mechanism: the system starts finite, stays finite over a short
horizon, and the forced label appears only once the encounter actually
blows the integration up — not because NaNs propagated from step 0.
"""

import numpy as np
import jax.numpy as jnp

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.analysis.batch import analyze_population


def _near_singular_population():
    """Radial near-collision triples: tiny softening, head-on infall.
    The frozen schedule is set from INITIAL timescales, so the blow-up
    happens mid-run at a substep size that cannot resolve it — the
    exact failure mode the pathological flag is for."""
    B = 4
    rng = np.random.default_rng(11)
    mass = np.tile(np.array([1.0, 1.0, 0.5]), (B, 1))
    pos = np.tile(np.array([[-0.5, 0.0], [0.5, 0.0], [0.0, 3.0]]), (B, 1, 1))
    # head-on: the pair falls together radially, passing within ~eps
    vel = np.tile(np.array([[0.9, 0.0], [-0.9, 0.0], [0.0, 0.0]]),
                  (B, 1, 1))
    pos += rng.normal(0, 1e-6, pos.shape)
    mask = np.ones((B, 3), bool)
    return mass, pos, vel, mask


def test_blowup_is_temporal_not_nan_from_start():
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=16,
                       analysis_tail_policy="off")
    m, q, v, msk = _near_singular_population()
    kw = dict(G=1.0, softening=1e-3, dt=0.01, mode="core",
              show_progress=False)

    # short horizon: before closest approach, everything is finite and
    # well-conserved
    df_short = analyze_population(m, q, v, msk, cfg, n_steps=5, **kw)
    assert np.isfinite(df_short["energy_drift"].to_numpy(float)).all()
    assert not df_short["pathological_energy"].any()

    # long horizon: the unresolved encounter blows the energy up past
    # the forcing threshold; the flag and forced label appear
    df_long = analyze_population(m, q, v, msk, cfg, n_steps=400, **kw)
    drift = df_long["energy_drift"].to_numpy(float)
    patho = df_long["pathological_energy"].to_numpy(bool)
    assert patho.any()
    # the flag means a real super-threshold drift (or a genuine inf
    # from overflow), never a silently-NaN row that defaulted
    bad = (~np.isfinite(drift)) | (np.abs(drift) > 10.0)
    assert np.array_equal(patho, bad)
    assert (df_long["is_stable"].to_numpy(float)[patho] == 0.0).all()
    # non-pathological rows keep finite physics columns
    assert np.isfinite(drift[~patho]).all()


def test_pathological_forcing_overrides_verdict():
    """A row whose raw criteria would pass but whose drift exceeds the
    threshold is still forced unstable (parity with
    batch_stability_analyzer.py:41-47)."""
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=16,
                       analysis_tail_policy="off")
    m, q, v, msk = _near_singular_population()
    df = analyze_population(m, q, v, msk, cfg, G=1.0, softening=1e-3,
                            dt=0.01, n_steps=400, mode="core",
                            show_progress=False)
    patho = df["pathological_energy"].to_numpy(bool)
    assert (df["is_stable"].to_numpy(float)[patho] == 0.0).all()
