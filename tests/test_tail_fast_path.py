"""Tight-binary tail fast path (integrators/kepler_split.py).

The batched analysis re-schedules dominated high-n_sub systems onto an
exact-Kepler split integrator (VERDICT round-2 item 1).  Contract
under test:

* non-tail systems are BIT-IDENTICAL with the policy on vs off,
* the split map conserves its Hamiltonian / momentum / L to machine
  precision on genuinely-dominated systems (the physical validation
  that justifies trusting tail labels),
* stability labels on the tail agree with the slow Strang path,
* non-dominated (democratic) systems never enter the fast path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nbodysimproject_tpu as nb
from nbodysimproject_tpu.analysis.batch import analyze_population
from nbodysimproject_tpu.parallel.batch_engine import build_batch
from nbodysimproject_tpu.integrators.kepler_split import (
    pair_timescales_sq, kepler_split_substep, split_hamiltonian)
from nbodysimproject_tpu.integrators.step import macro_step_dynamic
import importlib

E = importlib.import_module("nbodysimproject_tpu.diagnostics.energy")


def hier_triple(a_in=0.01, a_out=20.0, m=(1.0, 0.8, 0.3), ecc_kick=0.0):
    """COM-centred hierarchical triple with a tight inner binary on a
    circular orbit and an outer companion on a circular orbit."""
    m1, m2, m3 = m
    mu = m1 + m2
    v_in = np.sqrt(mu / a_in) * (1.0 + ecc_kick)
    pos = np.array([[-m2 / mu * a_in, 0.0], [m1 / mu * a_in, 0.0],
                    [a_out, 0.0]])
    vel = np.array([[0.0, -m2 / mu * v_in], [0.0, m1 / mu * v_in],
                    [0.0, np.sqrt((mu + m3) / a_out)]])
    mass = np.array([m1, m2, m3])
    M = mass.sum()
    pos -= (mass[:, None] * pos).sum(0) / M
    vel -= (mass[:, None] * vel).sum(0) / M
    return mass, pos, vel


def _population(ics, cfg, dt=0.01):
    mass = np.stack([x[0] for x in ics])
    pos = np.stack([x[1] for x in ics])
    vel = np.stack([x[2] for x in ics])
    mask = np.ones(mass.shape, bool)
    return mass, pos, vel, mask


def test_pair_timescales_identifies_tight_pair():
    mass, pos, vel = hier_triple()
    ei, ej, t1, t2 = pair_timescales_sq(jnp.asarray(pos), jnp.asarray(mass),
                                        1.0, jnp.ones(3, bool))
    sel = {int(np.argmax(ei)), int(np.argmax(ej))}
    assert sel == {0, 1}
    # tau^2 = r^3/(G(m1+m2))
    r = float(np.linalg.norm(pos[0] - pos[1]))
    assert np.isclose(float(t1), r ** 3 / 1.8, rtol=1e-12)
    assert float(t2) > 9.0 * float(t1)


def test_pair_timescales_two_body_second_is_inf():
    q = jnp.asarray([[0.0, 0.0], [0.01, 0.0], [0.0, 0.0]])
    m = jnp.asarray([1.0, 1.0, 0.0])
    mask = jnp.asarray([True, True, False])
    _ei, _ej, t1, t2 = pair_timescales_sq(q, m, 1.0, mask)
    assert np.isfinite(float(t1))
    assert np.isinf(float(t2))


def test_split_map_conservation():
    """Kepler-split conserves H_fast, P, L to near machine precision on
    a dominated triple — the physical validation of tail labels."""
    cfg_h = nb.SimConfig(integrator_mode="ham_soft")
    mass, pos, vel = hier_triple()
    m, q, v, msk = _population([(mass, pos, vel)], cfg_h)
    states, dyns = build_batch(jnp.asarray(m), jnp.asarray(q), jnp.asarray(v),
                               jnp.asarray(msk), cfg_h, 1.0, 0.05, 0.0, 0.01)
    st = jax.tree_util.tree_map(lambda x: x[0], states)
    dy = jax.tree_util.tree_map(lambda x: x[0], dyns)
    cfg = cfg_h.replace(integrator_mode="kepler_split")
    dy = dy.replace(n_sub=jnp.asarray(1, jnp.int32))

    H0 = float(split_hamiltonian(st, dy, cfg))
    P0 = np.asarray(E.linear_momentum(st))
    L0 = float(E.angular_momentum_z(st))

    @jax.jit
    def run(st):
        def body(s, _):
            return macro_step_dynamic(s, dy, cfg, jnp.asarray(0.01, s.pos.dtype),
                                      1), None
        s, _ = jax.lax.scan(body, st, None, length=500)
        return s

    st1 = run(st)
    H1 = float(split_hamiltonian(st1, dy, cfg))
    P1 = np.asarray(E.linear_momentum(st1))
    L1 = float(E.angular_momentum_z(st1))

    assert abs((H1 - H0) / H0) < 1e-8
    assert np.max(np.abs(P1 - P0)) < 1e-12
    assert abs((L1 - L0) / L0) < 1e-12
    # eps / pi frozen on this path
    assert float(st1.eps) == float(st.eps)
    assert float(st1.pi) == float(st.pi)


def _mixed_population():
    ics = []
    rng = np.random.default_rng(7)
    for k in range(4):  # tail: tight inner binaries
        ics.append(hier_triple(a_in=0.01 * (1 + 0.1 * k)))
    for k in range(4):  # non-tail: wide triples
        ics.append(hier_triple(a_in=1.0 + 0.1 * k, a_out=12.0))
    out = []
    for mass, pos, vel in ics:
        out.append((mass, pos + rng.normal(0, 1e-5, pos.shape), vel))
    return _population(out, None)


def test_non_tail_rows_identical_and_tail_labels_agree():
    m, q, v, msk = _mixed_population()
    cfg_on = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=64,
                          analysis_tail_policy="kepler", tail_min_n_sub=16)
    cfg_off = cfg_on.replace(analysis_tail_policy="off")
    kw = dict(G=1.0, softening=0.05, dt=0.01, n_steps=60, mode="core",
              show_progress=False)
    df_on = analyze_population(m, q, v, msk, cfg_on, **kw)
    df_off = analyze_population(m, q, v, msk, cfg_off, **kw)

    tail = df_on["tail_fast_path"].values
    assert tail[:4].all() and not tail[4:].any()
    assert "tail_fast_path" not in df_off.columns

    for c in ("is_stable", "energy_drift", "angular_momentum_drift",
              "com_drift_mean", "MEGNO", "n_sub", "n_sub_capped"):
        a = np.asarray(df_on[c].values[~tail], float)
        b = np.asarray(df_off[c].values[~tail], float)
        assert np.array_equal(a, b, equal_nan=True), c

    # tail labels agree with the slow path; both stable here, and the
    # exact-Kepler drift is far below the slow path's
    assert np.array_equal(df_on["is_stable"].values[tail],
                          df_off["is_stable"].values[tail])
    assert (df_on["is_stable"].values[tail] == 1.0).all()
    assert (df_on["energy_drift"].values[tail] < 1e-6).all()


def test_democratic_system_not_eligible():
    """All pair timescales comparable -> dominance margin fails."""
    # tight equilateral triangle: every pair identical
    a = 0.01
    q = a * np.array([[0.0, 0.0], [1.0, 0.0], [0.5, np.sqrt(3) / 2]])
    q -= q.mean(0)
    m = np.ones(3)
    v = np.zeros((3, 2))
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=64,
                       analysis_tail_policy="kepler", tail_min_n_sub=4)
    df = analyze_population(m[None], q[None], v[None],
                            np.ones((1, 3), bool), cfg, G=1.0,
                            softening=0.05, dt=0.01, n_steps=5,
                            mode="minimal", show_progress=False)
    assert not df["tail_fast_path"].values[0]


def test_two_body_takes_fast_path():
    """A 2-body tight binary IS a Kepler problem: n_sub collapses to 1
    and the label is stable with ~machine drift."""
    a = 0.005
    m = np.array([1.0, 0.5])
    mu = m.sum()
    pos = np.array([[-m[1] / mu * a, 0.0], [m[0] / mu * a, 0.0]])
    vv = np.sqrt(mu / a)
    vel = np.array([[0.0, -m[1] / mu * vv], [0.0, m[0] / mu * vv]])
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=64,
                       analysis_tail_policy="kepler", tail_min_n_sub=16)
    df = analyze_population(m[None], pos[None], vel[None],
                            np.ones((1, 2), bool), cfg, G=1.0,
                            softening=0.05, dt=0.01, n_steps=50,
                            mode="core", show_progress=False)
    assert df["tail_fast_path"].values[0]
    assert df["is_stable"].values[0] == 1.0
    assert df["energy_drift"].values[0] < 1e-9


def test_full_mode_megno_on_tail():
    """Full mode runs MEGNO through the kepler_split stepper without
    NaNs and keeps the schema."""
    ics = [hier_triple(a_in=0.01), hier_triple(a_in=1.2, a_out=12.0)]
    m, q, v, msk = _population(ics, None)
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=64,
                       analysis_tail_policy="kepler", tail_min_n_sub=16)
    df = analyze_population(m, q, v, msk, cfg, G=1.0, softening=0.05,
                            dt=0.01, n_steps=40, mode="full",
                            show_progress=False)
    assert df["tail_fast_path"].values[0]
    assert not df["tail_fast_path"].values[1]
    assert np.isfinite(df["MEGNO"].values).all()
    assert np.isfinite(df["energy_drift"].values).all()
    for c in ("initial_total_mass", "lyapunov_time", "megno_slope_med"):
        assert c in df.columns


def test_f32_tail_drift_within_verdict_margin():
    """The pipeline runs float32; the split map must stay far below
    the 1e-2 stability threshold there."""
    ics = [hier_triple(a_in=0.01)]
    m, q, v, msk = _population(ics, None)
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=64,
                       analysis_tail_policy="kepler", tail_min_n_sub=16,
                       fast_float32=True)
    df = analyze_population(m, q, v, msk, cfg, G=1.0, softening=0.05,
                            dt=0.01, n_steps=60, mode="core",
                            show_progress=False)
    assert df["tail_fast_path"].values[0]
    assert df["energy_drift"].values[0] < 1e-3
    assert df["is_stable"].values[0] == 1.0


def test_eccentric_multiperiod_kepler_accuracy():
    """The fixed-depth LC-8 drift (tail default) must hold H_fast on a
    highly-eccentric tight binary across many periods per macro step —
    the regime where a fixed-iteration solver could silently diverge
    from the adaptive one."""
    a = 0.004
    m = np.array([1.0, 0.4])
    mu = m.sum()
    # apoapsis start, e = 0.9: v_apo = sqrt(mu (1-e) / (a (1+e)))
    e = 0.9
    r_apo = a * (1 + e)
    v_apo = np.sqrt(mu * (1 - e) / (a * (1 + e)))
    pos = np.array([[-m[1] / mu * r_apo, 0.0], [m[0] / mu * r_apo, 0.0]])
    vel = np.array([[0.0, -m[1] / mu * v_apo], [0.0, m[0] / mu * v_apo]])
    cfg = nb.SimConfig(integrator_mode="ham_soft", analysis_n_sub_cap=64,
                       analysis_tail_policy="kepler", tail_min_n_sub=16)
    df = analyze_population(m[None], pos[None], vel[None],
                            np.ones((1, 2), bool), cfg, G=1.0,
                            softening=0.05, dt=0.01, n_steps=100,
                            mode="core", show_progress=False)
    assert df["tail_fast_path"].values[0]
    assert df["energy_drift"].values[0] < 1e-8
    assert df["is_stable"].values[0] == 1.0
