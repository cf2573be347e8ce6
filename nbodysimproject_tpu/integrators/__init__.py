from .step import (macro_step, macro_step_dynamic, integrate,
                   integrate_dynamic, begin_step, finish_step, substep_fn)
from .classical import verlet_kernel, yoshida4_kernel, apply_corrector
from .whfast import whfast_substep, to_jacobi, from_jacobi
from .hamsoft import strang_substep, spring_half, v_half_kick, t_drift, canonical_eom

__all__ = [
    "macro_step", "macro_step_dynamic", "integrate", "integrate_dynamic",
    "begin_step", "finish_step", "substep_fn",
    "verlet_kernel", "yoshida4_kernel", "apply_corrector",
    "whfast_substep", "to_jacobi", "from_jacobi",
    "strang_substep", "spring_half", "v_half_kick", "t_drift", "canonical_eom",
]
