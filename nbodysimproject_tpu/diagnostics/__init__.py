from .energy import (kinetic_energy, potential_energy, energy,
                     energy_breakdown, extended_hamiltonian,
                     angular_momentum_z, linear_momentum, center_of_mass)
from .metrics import Diagnostics, step_metrics
from .tangent import TangentMap, variational_accel, variational_accel_state
from .megno import megno_scan, megno_jit, init_tangent
from .features import DynamicalFeatures, extract_all, FEATURE_NAMES
from .evolution import EvolutionFeatures
from .validation import validate_ham_soft

__all__ = [
    "kinetic_energy", "potential_energy", "energy", "energy_breakdown",
    "extended_hamiltonian", "angular_momentum_z", "linear_momentum",
    "center_of_mass",
    "Diagnostics", "step_metrics",
    "TangentMap", "variational_accel", "variational_accel_state",
    "megno_scan", "megno_jit", "init_tangent",
    "DynamicalFeatures", "extract_all", "FEATURE_NAMES",
    "EvolutionFeatures", "validate_ham_soft",
]
