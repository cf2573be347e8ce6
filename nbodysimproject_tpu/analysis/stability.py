"""Stability analysis — the reference's per-system pipeline as one
jitted, vmappable scan.

Parity: ``minbody/stability_analyzer.py`` —
``run_stability_analysis`` (:69-259) with modes minimal/core/full,
sampled step metrics (~100 points), the stability verdict
(drift < 1%, L-drift < 1%, COM < 1, MEGNO < 10, :226-231), the
'initial_*' feature columns in full mode (:254-258), and
``serialize_to_dict`` (:521-561).

TPU-first: the reference integrates each system in a Python loop and
appends metric samples to lists; here the whole analysis (integration,
metric running-moments, MEGNO continuation) is a single compiled
program per (cfg, n_steps) — ``jax.vmap`` over the leading axis turns
it into the batched analyzer that replaces
batch_stability_analyzer.py's serial loop (SURVEY.md section 2,
"Batch first").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import importlib

from ..core.state import SimState
from ..integrators.step import macro_step_dynamic
from ..diagnostics.metrics import step_metrics
from ..diagnostics.megno import megno_scan
from ..diagnostics import features as F

# resolve the energy submodule explicitly (the diagnostics __init__
# re-binds the name ``energy`` to the function)
E = importlib.import_module("nbodysimproject_tpu.diagnostics.energy")


def _running_update(acc, x):
    """(count, sum, sumsq, max, min) running-moment update."""
    cnt, s, s2, mx, mn = acc
    return (cnt + 1.0, s + x, s2 + x * x, jnp.maximum(mx, x),
            jnp.minimum(mn, x))


def _running_init(dtype):
    z = jnp.zeros((), dtype)
    return (z, z, z, jnp.full((), -jnp.inf, dtype), jnp.full((), jnp.inf, dtype))


def _mean(acc):
    cnt = jnp.maximum(acc[0], 1.0)
    return acc[1] / cnt


def _std(acc):
    cnt = jnp.maximum(acc[0], 1.0)
    m = acc[1] / cnt
    return jnp.sqrt(jnp.maximum(acc[2] / cnt - m * m, 0.0))


def _rel_drift(x1, x0):
    """abs((x1-x0)/x0) with the reference's fallbacks
    (stability_analyzer.py:147-175)."""
    ok_rel = jnp.isfinite(x0) & (jnp.abs(x0) > 0.0) & jnp.isfinite(x1)
    ok_abs = jnp.isfinite(x0) & jnp.isfinite(x1)
    return jnp.where(ok_rel, jnp.abs((x1 - x0) / jnp.where(x0 != 0, x0, 1.0)),
                     jnp.where(ok_abs, jnp.abs(x1 - x0), jnp.inf))


def analyze_system(state: SimState, dyn, cfg, key, *, n_steps: int, dt,
                   mode: str, n_sub_max: int, megno_steps: int = 0):
    """Analyse one system; returns (result_dict, final_state).

    ``mode``: 'minimal' | 'core' | 'full' (static).  ``megno_steps`` is
    the static MEGNO step count for full mode (reference:
    min(100, min(50, n_steps // 2)), stability_analyzer.py:133-143).
    """
    dtype = state.pos.dtype
    dt = jnp.asarray(dt, dtype)
    H0 = E.extended_hamiltonian(state, dyn, cfg)

    if mode == "minimal":
        def body(s, _):
            return macro_step_dynamic(s, dyn, cfg, dt, n_sub_max), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        H1 = E.extended_hamiltonian(state, dyn, cfg)
        drift = _rel_drift(H1, H0)
        return {
            "is_stable": (drift < 0.01).astype(dtype),
            "energy_drift": drift,
        }, state

    d = state.pos.shape[-1]
    if d == 2:
        L0 = E.angular_momentum_z(state)
    else:
        L0 = E.angular_momentum_vector(state)
    sample_interval = max(1, n_steps // 100)

    accs = {k: _running_init(dtype) for k in
            ("com_drift", "J_eps", "theta_eps", "cos_theta", "var_L",
             "tr_hessian")}

    def body(carry, i):
        s, accs = carry
        s = macro_step_dynamic(s, dyn, cfg, dt, n_sub_max)
        met = step_metrics(s, dyn, cfg, L0=L0)
        do_sample = (i % sample_interval) == 0

        def upd(acc, x):
            new = _running_update(acc, x)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_sample, a, b), new, acc)

        accs = {k: upd(accs[k], met[k]) for k in accs}
        return (s, accs), None

    (state, accs), _ = jax.lax.scan(body, (state, accs),
                                    jnp.arange(n_steps))

    H1 = E.extended_hamiltonian(state, dyn, cfg)
    energy_drift = _rel_drift(H1, H0)
    if d == 2:
        L1 = E.angular_momentum_z(state)
        ang_mom_drift = _rel_drift(L1, L0)
    else:
        L1 = E.angular_momentum_vector(state)
        ang_mom_drift = _rel_drift(jnp.sqrt(jnp.sum(L1 * L1)),
                                   jnp.sqrt(jnp.sum(L0 * L0)))

    if mode == "full" and megno_steps > 0:
        state, megno, lyap, slope_med = megno_scan(
            state, dyn, cfg, key, megno_steps, dt, n_sub_max=n_sub_max)
    else:
        megno = jnp.asarray(2.0, dtype)
        lyap = jnp.asarray(jnp.inf, dtype)
        slope_med = jnp.zeros((), dtype)  # slope of the constant Y=2

    com_mean = _mean(accs["com_drift"])
    is_stable = ((energy_drift < 0.01) & (ang_mom_drift < 0.01)
                 & (com_mean < 1.0) & (megno < 10.0))

    result = {
        "is_stable": is_stable.astype(dtype),
        "energy_drift": energy_drift,
        "angular_momentum_drift": ang_mom_drift,
        "com_drift_mean": com_mean,
        "com_drift_max": accs["com_drift"][3],
        "j_eps_mean": _mean(accs["J_eps"]),
        "j_eps_std": _std(accs["J_eps"]),
        "theta_eps_mean": _mean(accs["theta_eps"]),
        "theta_eps_std": _std(accs["theta_eps"]),
        "cos_theta_mean": _mean(accs["cos_theta"]),
        "cos_theta_min": accs["cos_theta"][4],
        "ang_mom_var_mean": _mean(accs["var_L"]),
        "ang_mom_var_max": accs["var_L"][3],
        "tidal_trace_mean": _mean(accs["tr_hessian"]),
        "tidal_trace_max": accs["tr_hessian"][3],
        "MEGNO": megno,
        "lyapunov_time": lyap,
        "megno_slope_med": slope_med,
    }
    return result, state


@partial(jax.jit, static_argnames=("cfg", "n_steps", "n_sub_max"))
def _track_max_radius_jit(state, dyn, cfg, dt, n_steps, n_sub_max):
    """Integrate n_steps tracking max_i |q_i| over the run
    (stability_analyzer.py:279-285)."""
    def body(carry, _):
        s, mx = carry
        s = macro_step_dynamic(s, dyn, cfg, dt, n_sub_max)
        r = jnp.sqrt(jnp.sum(s.pos * s.pos, axis=1))
        r = jnp.where(s.mask, r, 0.0)
        return (s, jnp.maximum(mx, jnp.max(r))), None

    (state, max_r), _ = jax.lax.scan(
        body, (state, jnp.zeros((), state.pos.dtype)), None, length=n_steps)
    return state, max_r


@partial(jax.jit, static_argnames=("cfg", "n_steps", "mode", "n_sub_max",
                                   "megno_steps"))
def analyze_system_jit(state, dyn, cfg, key, n_steps, dt, mode, n_sub_max,
                       megno_steps):
    return analyze_system(state, dyn, cfg, key, n_steps=n_steps, dt=dt,
                          mode=mode, n_sub_max=n_sub_max,
                          megno_steps=megno_steps)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "mode", "n_sub_max",
                                   "megno_steps"))
def analyze_batch_jit(states, dyns, cfg, keys, n_steps, dt, mode, n_sub_max,
                      megno_steps):
    """vmapped batch analysis: states/dyns are stacked PyTrees with a
    leading batch axis; the replacement for the reference's serial
    Python loop (batch_stability_analyzer.py:62-77)."""
    fn = lambda s, d, k: analyze_system(
        s, d, cfg, k, n_steps=n_steps, dt=dt, mode=mode,
        n_sub_max=n_sub_max, megno_steps=megno_steps)
    return jax.vmap(fn)(states, dyns, keys)


class StabilityAnalyzer:
    """OO parity wrapper (stability_analyzer.py:33)."""

    def __init__(self, sim, n_steps: int = 1000, dt: float = 0.01,
                 mode: str = "core", seed: int = 0):
        self.sim = sim
        self.n_steps = max(1, int(n_steps))
        self.dt = float(dt)
        self.mode = mode
        self._initial_mass = sim._mass.copy()
        self._initial_pos = sim._pos.copy()
        self._initial_vel = sim._vel.copy()
        self._key = jax.random.PRNGKey(seed)

    def _megno_steps(self) -> int:
        n_samp = min(50, self.n_steps // 2)
        return min(100, n_samp) if n_samp > 0 else 0

    def run_stability_analysis(self) -> dict:
        # work on a copy (stability_analyzer.py:70)
        sim_copy = self.sim.copy()
        n_sub = sim_copy._n_sub_for(self.dt)
        res, _state = analyze_system_jit(
            sim_copy._state, sim_copy._dyn.replace(
                n_sub=jnp.asarray(n_sub, jnp.int32)),
            sim_copy.cfg, self._key, self.n_steps,
            sim_copy._as_dtype(self.dt), self.mode, n_sub,
            self._megno_steps() if self.mode == "full" else 0)
        out = {k: float(v) for k, v in res.items()}
        out["mode"] = self.mode
        if self.mode == "full":
            initial = F.extract_all(self.sim._state, self.sim._dyn,
                                    self.sim.cfg)
            for k, v in initial.items():
                out[f"initial_{k}"] = float(v)
        return out

    # ------------------------------------------------------------------
    # alternate analysis paths (stability_analyzer.py:262-519): virial
    # radius, crossing time, 10*T_cr horizon, escape counting,
    # Lyapunov/T_cr >= 50 criterion
    # ------------------------------------------------------------------

    def _energy_drift_tolerance(self) -> float:
        """stability_analyzer.py:63-67."""
        tol_base = 3e-4
        dt_factor = (self.dt / 0.01) ** 1.5
        soft_factor = (self.sim.softening / 0.05) ** 0.5
        return tol_base * dt_factor * soft_factor

    def _quick_virial_radius(self) -> float:
        """stability_analyzer.py:49-61 (pair-distance form with the
        +1e-12 regulariser)."""
        m = self.sim._mass
        pos = self.sim._pos
        G = self.sim.G
        U = 0.0
        for i in range(len(m) - 1):
            for j in range(i + 1, len(m)):
                r = np.linalg.norm(pos[j] - pos[i]) + 1e-12
                U -= G * m[i] * m[j] / r
        tot = float(m.sum())
        return abs(-G * tot ** 2 / (2 * U)) if U else 1.0

    def _compute_virial_radius(self) -> float:
        """stability_analyzer.py:361-379 (softened-potential form with
        mean-distance fallback)."""
        from ..diagnostics.metrics import Diagnostics

        PE = Diagnostics(self.sim).potential_energy()
        total_mass = float(np.sum(self.sim._mass))
        if PE != 0:
            return abs(-self.sim.G * total_mass ** 2 / (2 * PE))
        pos = self.sim._pos
        n = self.sim.n_bodies
        dists = [np.linalg.norm(pos[j] - pos[i])
                 for i in range(n) for j in range(i + 1, n)]
        return float(np.mean(dists)) if dists else 1.0

    def _crossing_time(self) -> float:
        R_vir = self._compute_virial_radius()
        v_rms = float(np.sqrt(np.mean(np.sum(self._initial_vel ** 2, axis=1))))
        return R_vir / v_rms if v_rms > 0 else float("inf")

    def _determine_stability(self, energy_drift, max_radius, R_vir,
                             lyapunov_time, T_cr) -> bool:
        """stability_analyzer.py:386-392."""
        rate = energy_drift / (self.n_steps * self.dt)
        good_energy = rate < 1.2 * self._energy_drift_tolerance()
        good_escape = max_radius <= 10.0 * R_vir
        good_chaos = lyapunov_time >= 50.0 * T_cr
        return bool(good_energy and good_escape and good_chaos)

    def _run_core_analysis(self) -> dict:
        """stability_analyzer.py:262-312: integrate to 10 crossing
        times tracking the maximum radial excursion, then MEGNO."""
        import jax

        from ..diagnostics.megno import megno_jit
        from . import stability as _self_mod

        sim = self.sim.copy()
        R_vir = self._compute_virial_radius()
        T_cr = self._crossing_time()
        t_target = 10.0 * T_cr if np.isfinite(T_cr) and T_cr > 0 \
            else self.n_steps * self.dt
        n_iter = max(self.n_steps, int(np.ceil(t_target / self.dt)))
        n_sub = sim._n_sub_for(self.dt)

        from ..diagnostics.energy import extended_hamiltonian
        from ..diagnostics.metrics import Diagnostics

        E0 = Diagnostics(sim).energy()
        st, max_r = _track_max_radius_jit(sim._state, sim._dyn, sim.cfg,
                                          sim._as_dtype(self.dt), n_iter,
                                          n_sub)
        sim._state = st
        E1 = Diagnostics(sim).energy()
        energy_drift = abs((E1 - E0) / E0) if E0 != 0 else 0.0

        self._key, sub = jax.random.split(self._key)
        st, megno, lyap, _slope = megno_jit(sim._state, sim._dyn, sim.cfg,
                                            sub, 100,
                                            sim._as_dtype(self.dt), n_sub)
        sim._state = st
        old_n = self.n_steps
        self.n_steps = n_iter
        is_stable = self._determine_stability(energy_drift, float(max_r),
                                              R_vir, float(lyap), T_cr)
        self.n_steps = old_n
        return {
            "mode": "core",
            "energy_drift": energy_drift,
            "max_radial_distance": float(max_r),
            "virial_radius": R_vir,
            "MEGNO": float(megno),
            "lyapunov_time": float(lyap),
            "crossing_time": T_cr,
            "is_stable": float(is_stable),
            "n_steps": float(n_iter),
            "dt": self.dt,
            "total_time": n_iter * self.dt,
        }

    def _run_full_analysis(self) -> dict:
        """stability_analyzer.py:314-346: core horizon plus escape
        fraction and the ML feature set."""
        res = self._run_core_analysis()
        sim = self.sim.copy()
        n_iter = int(res["n_steps"])
        n_sub = sim._n_sub_for(self.dt)
        st, _mr = _track_max_radius_jit(sim._state, sim._dyn, sim.cfg,
                                        sim._as_dtype(self.dt), n_iter, n_sub)
        sim._state = st
        final_r = np.sqrt((np.asarray(st.pos)[: sim.n_bodies] ** 2).sum(1))
        escaped = int(np.sum(final_r > 5 * res["virial_radius"]))
        feats = F.extract_all(self.sim._state, self.sim._dyn, self.sim.cfg)
        out = dict(res)
        out["mode"] = "full"
        out["escaped_bodies"] = float(escaped)
        out["escape_fraction"] = escaped / sim.n_bodies
        for k, v in feats.items():
            out[k] = float(v)
        return out

    def serialize_to_dict(self, diagnostics: dict, max_bodies=None) -> dict:
        """Flatten per-body ICs into columns
        (stability_analyzer.py:521-561)."""
        sim = self.sim
        data = {
            "n_bodies": sim.n_bodies,
            "G": sim.G,
            "softening": sim.softening,
            "min_softening": sim._min_softening,
            "adaptive": float(sim._adaptive),
            "integrator_mode": sim._integrator_mode,
        }
        m, p, v = self._initial_mass, self._initial_pos, self._initial_vel
        if max_bodies is not None and sim.n_bodies > max_bodies:
            for name, arr in (("mass", m), ("x", p[:, 0]), ("y", p[:, 1]),
                              ("vx", v[:, 0]), ("vy", v[:, 1])):
                data[f"{name}_min"] = float(np.min(arr))
                data[f"{name}_max"] = float(np.max(arr))
                data[f"{name}_mean"] = float(np.mean(arr))
                data[f"{name}_std"] = float(np.std(arr))
        else:
            for i, mass in enumerate(m):
                data[f"mass_{i}"] = float(mass)
            for i in range(len(p)):
                data[f"x_{i}"] = float(p[i, 0])
                data[f"y_{i}"] = float(p[i, 1])
            for i in range(len(v)):
                data[f"vx_{i}"] = float(v[i, 0])
                data[f"vy_{i}"] = float(v[i, 1])
        data.update(diagnostics)
        return data

    def save_to_csv(self, filename: str, diagnostics: dict = None):
        import pandas as pd

        if diagnostics is None:
            diagnostics = self.run_stability_analysis()
        pd.DataFrame([self.serialize_to_dict(diagnostics)]).to_csv(
            filename, index=False)
