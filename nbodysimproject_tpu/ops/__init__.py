from .geometry import pairwise_geometry, pairwise_r2, min_separation, pair_mask
from .forces import (gravitational_force, pairwise_force, softened_forces,
                     dV_d_epsilon, dU_depsilon_plummer)
from .potential import softened_potential, dU_d_eps
from .barrier import barrier_energy, barrier_force, barrier_curvature
from .softening import eps_target, grad_eps_target
from .reflection import (reflect_if_needed, symplectic_bounce,
                         symplectic_reflect_eps, reflect_eps_symplectic,
                         reflect_and_limit_eps)
from .kepler import UniversalVariableKeplerSolver, kepler_propagate, stumpff

__all__ = [
    "pairwise_geometry", "pairwise_r2", "min_separation", "pair_mask",
    "gravitational_force", "pairwise_force", "softened_forces",
    "dV_d_epsilon", "dU_depsilon_plummer",
    "softened_potential", "dU_d_eps",
    "barrier_energy", "barrier_force", "barrier_curvature",
    "eps_target", "grad_eps_target",
    "reflect_if_needed", "symplectic_bounce", "symplectic_reflect_eps",
    "reflect_eps_symplectic", "reflect_and_limit_eps",
    "UniversalVariableKeplerSolver", "kepler_propagate", "stumpff",
]
