"""Static dynamical features for ML (vectorised).

Parity: ``minbody/dynamical_features.py:27-155`` — the ~25 features
(mass stats, pairwise-distance stats, velocity stats, energy/virial,
angular momentum stats, softening-history mean/std), computed here
from the state PyTree with masked reductions so the whole extractor
vmaps over a system batch.  Feature names and semantics match the
reference columns exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

import importlib

from ..core.state import SimState
from ..ops.geometry import pair_mask

# resolve the submodule explicitly (the package __init__ re-binds the
# name ``energy`` to the function)
E = importlib.import_module(__package__ + ".energy")


def _masked_mean(x, m):
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.where(m > 0, x, 0.0)) / cnt


def _masked_var(x, m):
    mu = _masked_mean(x, m)
    return _masked_mean((x - mu) ** 2, m)


def extract_all(state: SimState, dyn, cfg) -> dict:
    m = state.mass
    q = state.pos
    v = state.vel
    msk = state.mask.astype(m.dtype)
    n = q.shape[0]
    nb = jnp.maximum(jnp.sum(msk), 1.0)

    # --- mass features (:37-48) -------------------------------------
    big = jnp.asarray(jnp.finfo(m.dtype).max, m.dtype)
    m_min = jnp.min(jnp.where(state.mask, m, big))
    m_max = jnp.max(jnp.where(state.mask, m, 0.0))
    total_mass = jnp.sum(jnp.where(state.mask, m, 0.0))
    mass_ratio_max = jnp.where(m_min > 0.0, m_max / jnp.maximum(m_min, 1e-300), 1.0)
    com_pos, _com_vel = E.center_of_mass(state)
    feats = {
        "total_mass": total_mass,
        "mass_variance": _masked_var(m, msk),
        "mass_ratio_max": mass_ratio_max,
        "mass_center_offset": jnp.sqrt(jnp.sum(com_pos * com_pos)),
    }

    # --- distance features (:50-79) ----------------------------------
    diff = q[:, None, :] - q[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pm = pair_mask(n, state.mask)
    iu = jnp.triu_indices(n, 1)
    pv = pm[iu].astype(m.dtype)
    rv = r[iu]
    npairs = jnp.maximum(jnp.sum(pv), 1.0)
    mean_d = jnp.sum(rv * pv) / npairs
    var_d = jnp.sum(((rv - mean_d) ** 2) * pv) / npairs
    min_d = jnp.min(jnp.where(pv > 0, rv, big))
    max_d = jnp.max(jnp.where(pv > 0, rv, 0.0))
    has_pairs = jnp.sum(pv) > 0
    min_d = jnp.where(has_pairs, min_d, 0.0)
    feats.update({
        "mean_separation": jnp.where(has_pairs, mean_d, 0.0),
        "std_separation": jnp.where(has_pairs, jnp.sqrt(var_d), 0.0),
        "min_separation": min_d,
        "max_separation": max_d,
        "separation_ratio": jnp.where(min_d > 0, max_d / jnp.maximum(min_d, 1e-300), 1.0),
    })

    # --- velocity features (:81-105) ----------------------------------
    speeds = jnp.sqrt(jnp.sum(v * v, axis=1))
    dvel = v[:, None, :] - v[None, :, :]
    dv = jnp.sqrt(jnp.sum(dvel * dvel, axis=-1))[iu]
    mean_rel = jnp.sum(dv * pv) / npairs
    feats.update({
        "mean_speed": _masked_mean(speeds, msk),
        "std_speed": jnp.sqrt(_masked_var(speeds, msk)),
        "max_speed": jnp.max(jnp.where(state.mask, speeds, 0.0)),
        "mean_relative_velocity": jnp.where(has_pairs, mean_rel, 0.0),
        "max_relative_velocity": jnp.max(jnp.where(pv > 0, dv, 0.0)),
    })

    # --- energy features (:107-122) ------------------------------------
    KE = E.kinetic_energy(state)
    PE = E.potential_energy(state, dyn)
    E_tot = KE + PE
    feats.update({
        "kinetic_energy": KE,
        "potential_energy": PE,
        "total_energy": E_tot,
        "virial_ratio": jnp.where(PE != 0.0, 2.0 * KE / jnp.abs(PE), 0.0),
        "energy_per_mass": E_tot / jnp.maximum(total_mass, 1e-300),
        "is_bound": (E_tot < 0).astype(m.dtype),
    })

    # --- angular features (:124-137) -----------------------------------
    L_tot = E.angular_momentum_z(state)
    li_spec = jnp.abs(q[:, 0] * v[:, 1] - q[:, 1] * v[:, 0])
    feats.update({
        "total_angular_momentum": jnp.abs(L_tot),
        "mean_specific_angular_momentum": _masked_mean(li_spec, msk),
        "angular_momentum_variance": _masked_var(li_spec, msk),
    })

    # --- softening features (:143-155) via running history moments -----
    cnt = jnp.maximum(state.hist_count, 1.0)
    smean = state.hist_sum / cnt
    svar = jnp.maximum(state.hist_sumsq / cnt - smean * smean, 0.0)
    feats.update({
        "softening_mean": smean,
        "softening_std": jnp.sqrt(svar),
    })
    return feats


FEATURE_NAMES = [
    "total_mass", "mass_variance", "mass_ratio_max", "mass_center_offset",
    "mean_separation", "std_separation", "min_separation", "max_separation",
    "separation_ratio",
    "mean_speed", "std_speed", "max_speed", "mean_relative_velocity",
    "max_relative_velocity",
    "kinetic_energy", "potential_energy", "total_energy", "virial_ratio",
    "energy_per_mass", "is_bound",
    "total_angular_momentum", "mean_specific_angular_momentum",
    "angular_momentum_variance",
    "softening_mean", "softening_std",
]


class DynamicalFeatures:
    """OO parity wrapper (dynamical_features.py:22)."""

    def __init__(self, sim):
        self.sim = sim

    def extract_all(self) -> dict:
        d = extract_all(self.sim._state, self.sim._dyn, self.sim.cfg)
        return {k: float(v) for k, v in d.items()}
