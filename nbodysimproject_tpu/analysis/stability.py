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

    L0 = E.angular_momentum_z(state)
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
    L1 = E.angular_momentum_z(state)
    energy_drift = _rel_drift(H1, H0)
    ang_mom_drift = _rel_drift(L1, L0)

    if mode == "full" and megno_steps > 0:
        state, megno, lyap = megno_scan(state, dyn, cfg, key, megno_steps,
                                        dt, n_sub_max=n_sub_max)
    else:
        megno = jnp.asarray(2.0, dtype)
        lyap = jnp.asarray(jnp.inf, dtype)

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
    }
    return result, state


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
