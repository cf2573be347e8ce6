from .config import SimConfig, _ALLOWED_MODES
from .state import (SimState, DynParams, build_state, n_bodies,
                    remove_center_of_mass_velocity)

__all__ = ["SimConfig", "_ALLOWED_MODES", "SimState", "DynParams",
           "build_state", "n_bodies", "remove_center_of_mass_velocity"]
