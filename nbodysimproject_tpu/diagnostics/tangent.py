"""Variational (tangent-map) acceleration for chaos indicators.

Parity: ``minbody/tangent_map.py:21-59`` —
delta_a_i = G sum_j m_j [ d_diff / r^3 - 3 (diff . d_diff) diff / r^5 ]
with softened r^2 = |q_j - q_i|^2 + s2.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import SimState
from ..ops.geometry import pair_mask


def variational_accel(pos, mass, delta_r, G, s2, mask=None):
    n = pos.shape[0]
    diff = pos[None, :, :] - pos[:, None, :]      # diff[i, j] = q_j - q_i
    r2 = jnp.sum(diff * diff, axis=-1) + s2
    pm = pair_mask(n, mask)
    r2s = jnp.where(pm, r2, jnp.inf)
    inv_r2 = 1.0 / r2s
    inv_r3 = inv_r2 * jnp.sqrt(inv_r2)

    d_diff = delta_r[None, :, :] - delta_r[:, None, :]
    dot = jnp.sum(diff * d_diff, axis=-1)
    coeff = 3.0 * dot * inv_r2 * inv_r3
    term = d_diff * inv_r3[..., None] - coeff[..., None] * diff
    return G * jnp.sum(mass[None, :, None] * term, axis=1)


def variational_accel_state(state: SimState, dyn, cfg, delta_r):
    """s2 policy mirrors sim.manager.step_s2 usage
    (tangent_map.py:32)."""
    return variational_accel(state.pos, state.mass, delta_r, dyn.G,
                             state.step_s2, mask=state.mask)


class TangentMap:
    """OO parity wrapper (tangent_map.py:16)."""

    def __init__(self, sim):
        self.sim = sim

    def variational_accel(self, delta_r):
        import numpy as np

        st = self.sim._state
        d = jnp.asarray(np.asarray(delta_r, dtype=np.float64), st.pos.dtype)
        full = jnp.zeros_like(st.pos).at[: d.shape[0]].set(d)
        out = variational_accel_state(st, self.sim._dyn, self.sim.cfg, full)
        return np.asarray(out)[: self.sim.n_bodies]
