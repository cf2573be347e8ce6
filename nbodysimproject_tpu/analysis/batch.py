"""Batched stability analysis over a system population.

Parity: ``minbody/batch_stability_analyzer.py:30-102``
(BatchStabilityAnalyzer: analyze_simulation / analyze_batch /
save_batch_results / get_feature_matrix, pathological-energy flag,
softening-policy tag).

TPU-first: the reference's "batching" is a serial Python for loop
(:66-77).  Here the whole population is stacked into `(B, N, d)`
PyTrees (ragged body counts padded + masked) and analysed by ONE
compiled ``vmap`` program — the design that makes the 1e4-systems
north-star throughput possible (SURVEY.md section 2 parallelism
table).  Systems are grouped by static analysis signature (cfg, mode)
so each group is a single compile.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, DynParams
from .stability import analyze_batch_jit, StabilityAnalyzer


def stack_sims(sims, dyns_list=None):
    """Stack facade simulations into batched (states, dyns) PyTrees,
    padding body counts to the max N in the group."""
    n_slots = max(s._state.n_slots for s in sims)

    def pad_state(st: SimState) -> SimState:
        k = n_slots - st.n_slots
        if k == 0:
            return st
        return st.replace(
            mass=jnp.pad(st.mass, (0, k)),
            pos=jnp.pad(st.pos, ((0, k), (0, 0))),
            vel=jnp.pad(st.vel, ((0, k), (0, 0))),
            mask=jnp.pad(st.mask, (0, k)),
        )

    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[pad_state(s._state) for s in sims])
    if dyns_list is None:
        dyns_list = [s._dyn for s in sims]
    dyns = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *dyns_list)
    return states, dyns


def _scheduled_dyn(sim, dt: float) -> DynParams:
    """The sim's DynParams with the pi-budget mu raise and (if dt is
    not within 1% of the frozen dt) a refrozen schedule — pure, no
    mutation of the facade sim."""
    from ..integrators import calibration as calib
    from ..parallel.batch_engine import refreeze_jit

    dyn = sim._dyn
    if sim._integrator_mode != "ham_soft":
        import math

        h_sub = float(dyn.h_sub_ref)
        if not (math.isfinite(h_sub) and h_sub > 0.0):
            h_sub = abs(dt)
        n = int(max(1, min(sim.cfg.split_n_max,
                           math.ceil(abs(dt) / h_sub))))
        return dyn.replace(n_sub=jnp.asarray(n, jnp.int32))

    mu_new = calib.calibrate_mu_from_pi_budget(
        dyn.mu_soft, dyn.k_soft, sim._as_dtype(abs(dt)),
        sim._as_dtype(sim.cfg.theta_imp))
    dyn = dyn.replace(mu_soft=mu_new)
    prev = getattr(sim, "_frozen_dt", None)
    if prev is None or prev <= 0.0 or abs(abs(dt) - prev) / prev > 0.01:
        dyn = refreeze_jit(sim._state, dyn, sim.cfg, sim._as_dtype(dt))
    return dyn


@partial(jax.jit, static_argnames=("cfg",))
def _features_batch_jit(states, dyns, cfg):
    from ..diagnostics import features as F

    return jax.vmap(lambda s, d: F.extract_all(s, d, cfg))(states, dyns)


class BatchStabilityAnalyzer:
    def __init__(self, n_steps: int = 1000, dt: float = 0.01,
                 mode: str = "core", seed: int = 0) -> None:
        self.n_steps = int(n_steps)
        self.dt = float(dt)
        self.mode = mode
        self.seed = int(seed)
        self.results: list = []

    def analyze_simulation(self, sim) -> dict:
        """Single-system path (batch_stability_analyzer.py:37-58)."""
        analyzer = StabilityAnalyzer(sim, self.n_steps, self.dt,
                                     mode=self.mode)
        result = analyzer.run_stability_analysis() or {}
        self._postprocess(result, sim)
        return result

    @staticmethod
    def _postprocess(result: dict, sim) -> None:
        if "energy_drift" in result:
            if abs(result["energy_drift"]) > 10 or not np.isfinite(
                    result["energy_drift"]):
                result["is_stable"] = 0.0
                result["pathological_energy"] = True
            else:
                result["pathological_energy"] = False
        else:
            result["pathological_energy"] = False
        if sim._integrator_mode == "ham_soft":
            result["softening_policy"] = "adaptive-ham"
        elif sim._adaptive_softening:
            result["softening_policy"] = "adaptive-classic"
        else:
            result["softening_policy"] = "static"

    def analyze_batch(self, simulations, show_progress: bool = True):
        """One compiled vmap per (cfg, mode, N-slots) group."""
        import pandas as pd

        self.results = [None] * len(simulations)
        if show_progress:
            print(f"Analyzing {len(simulations)} simulations...")

        groups = defaultdict(list)
        for i, sim in enumerate(simulations):
            groups[(sim.cfg, self.mode)].append(i)

        megno_steps = 0
        if self.mode == "full":
            n_samp = min(50, self.n_steps // 2)
            megno_steps = min(100, n_samp) if n_samp > 0 else 0

        key0 = jax.random.PRNGKey(self.seed)
        for (cfg, mode), idxs in groups.items():
            sims = [simulations[i] for i in idxs]
            # schedule for this dt without mutating the caller's sims
            # (strang_substeps' pi-budget raise, HSI:800)
            dyns_list = [_scheduled_dyn(s, self.dt) for s in sims]
            n_subs = np.asarray(jax.device_get(
                jnp.stack([d.n_sub for d in dyns_list])))
            n_sub_max = int(n_subs.max())
            states, dyns = stack_sims(sims, dyns_list)
            keys = jax.random.split(jax.random.fold_in(key0, idxs[0]),
                                    len(idxs))
            res, _ = analyze_batch_jit(
                states, dyns, cfg, keys, self.n_steps,
                jnp.asarray(self.dt, states.pos.dtype), mode, n_sub_max,
                megno_steps)
            if self.mode == "full":
                from ..diagnostics import features as F

                feats = _features_batch_jit(states, dyns, cfg)
                res = dict(res)
                for k, v in feats.items():
                    res[f"initial_{k}"] = v
            res_np = {k: np.asarray(v) for k, v in res.items()}
            for j, i in enumerate(idxs):
                row = {k: float(v[j]) for k, v in res_np.items()}
                row["mode"] = self.mode
                self._postprocess(row, simulations[i])
                row["simulation_id"] = i
                self.results[i] = row

        if show_progress:
            print(f"Completed: {len(self.results)} simulations analyzed")
        return pd.DataFrame(self.results)

    def save_batch_results(self, filename: str) -> None:
        import pandas as pd

        if not self.results:
            print("[error] No results to save. Run analyze_batch first.")
            return
        df = pd.DataFrame(self.results)
        df.to_csv(filename, index=False)
        print(f"Saved {len(df)} results to {filename}")

    def get_feature_matrix(self) -> np.ndarray:
        import pandas as pd

        if not self.results:
            print("[error] No results available. Run analyze_batch first.")
            return np.array([])
        return pd.DataFrame(self.results).values
