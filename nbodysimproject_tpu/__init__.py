"""nbodysimproject_tpu — a TPU-native N-body stability framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability
surface of the reference ``minbody`` package (softened-gravity few-body
simulation, Verlet / Yoshida4 / WHFast / ham_soft integrators, chaos
diagnostics, batched stability analysis, data generation, and ML
stability prediction), built batch-first for TPU meshes.

Precision: the physics core is float64-first like the reference
(simulation_state.py:27-31); importing this package enables JAX x64.
Use ``SimConfig(fast_float32=True)`` for the TPU fast path.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .core import SimConfig, SimState, DynParams, build_state
from .facade import NBodySimulation, Body, BodyView
from .ops import (
    pairwise_geometry, gravitational_force, pairwise_force, softened_forces,
    dV_d_epsilon, dU_depsilon_plummer, softened_potential, dU_d_eps,
    barrier_energy, barrier_force, barrier_curvature,
    eps_target, grad_eps_target,
    reflect_if_needed, symplectic_bounce, symplectic_reflect_eps,
    reflect_eps_symplectic, reflect_and_limit_eps,
    UniversalVariableKeplerSolver,
)
from .utils import set_global_seed

__version__ = "0.1.0"

__all__ = [
    "SimConfig", "SimState", "DynParams", "build_state",
    "NBodySimulation", "Body", "BodyView",
    "pairwise_geometry", "gravitational_force", "pairwise_force",
    "softened_forces", "dV_d_epsilon", "dU_depsilon_plummer",
    "softened_potential", "dU_d_eps",
    "barrier_energy", "barrier_force", "barrier_curvature",
    "eps_target", "grad_eps_target",
    "reflect_if_needed", "symplectic_bounce", "symplectic_reflect_eps",
    "reflect_eps_symplectic", "reflect_and_limit_eps",
    "UniversalVariableKeplerSolver",
    "set_global_seed",
]
