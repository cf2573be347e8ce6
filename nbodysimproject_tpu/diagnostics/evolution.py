"""Evolution features: MEGNO + Lyapunov time + current energy.

Parity: ``minbody/evolution_features.py:26-87`` (EvolutionFeatures).
The OO wrapper drives the fused jitted MEGNO scan in ``megno.py``.
"""

from __future__ import annotations

import math

import jax
import numpy as np

from .features import DynamicalFeatures
from .metrics import Diagnostics
from .megno import megno_jit


class EvolutionFeatures:
    def __init__(self, sim, n_samples: int = 20, dt: float = 0.01, seed: int = 0):
        self.sim = sim
        self.n_samples = int(n_samples)
        self.dt = float(dt)
        self.diagnostics = Diagnostics(sim)
        self._key = jax.random.PRNGKey(seed)

    def compute_megno(self, n_steps: int, dt: float):
        """(Y, lyapunov_time); advances the underlying simulation like
        the reference (evolution_features.py:47-66 calls sim.step)."""
        sim = self.sim
        if sim._integrator_mode == "ham_soft":
            n_sub = sim._hamsoft_schedule(dt)
        else:
            h_sub = float(sim._dyn.h_sub_ref)
            if not (math.isfinite(h_sub) and h_sub > 0.0):
                h_sub = abs(dt)
            n_sub = int(max(1, min(sim.cfg.split_n_max,
                                   math.ceil(abs(dt) / h_sub))))
        self._key, sub = jax.random.split(self._key)
        st, Y, lyap, slope_med = megno_jit(sim._state, sim._dyn, sim.cfg, sub,
                                           int(n_steps), sim._as_dtype(dt),
                                           n_sub)
        sim._state = st
        sim._has_integrated = True
        self.last_megno_slope_med = float(slope_med)
        return float(Y), float(lyap)

    def extract_evolution_features(self) -> dict:
        feats = self.extract_all()
        return {k: feats[k] for k in
                ("MEGNO", "lyapunov_time", "current_total_energy")}

    def extract_all(self) -> dict:
        features = DynamicalFeatures(self.sim).extract_all()
        megno, lyap = self.compute_megno(self.n_samples, self.dt)
        E = self.diagnostics.energy()
        features.update({
            "MEGNO": megno,
            "lyapunov_time": lyap,
            "current_total_energy": E,
        })
        return features
