"""nbodysimproject_tpu — a TPU-native N-body stability framework.

A from-scratch JAX/XLA re-design with the full capability surface of
the reference ``minbody`` package (softened-gravity few-body
simulation; Verlet / Yoshida4 / WHFast / ham_soft integrators; chaos
diagnostics; batched stability analysis; data generation; ML stability
prediction), built batch-first for TPU meshes.

The public namespace mirrors the reference's flat re-exports
(minbody/__init__.py:15-129) so reference call sites work unchanged,
plus the TPU-native core (SimState/DynParams/SimConfig, the parallel
batch engine, mesh helpers).

Precision: the physics core is float64-first like the reference
(simulation_state.py:27-31); importing this package enables JAX x64.
Pass float32 arrays (``SimConfig(fast_float32=True)`` in the facade)
for the TPU fast path — computations follow the array dtype.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    The batched-analysis pipeline compiles one program per (n_sub
    bucket, engine) — ~100 s each on a small host, ~35 min for the
    full ladder — and every fresh process repays it.  The persistent
    cache makes that a once-per-machine cost (measured through the
    remote-TPU tunnel: 0.79 s -> 0.028 s for a cached program; the
    cache is keyed on jax/XLA versions, flags and device kind, so
    hits are exact).  Opt out with NB_COMPILE_CACHE=0; pick the
    location with NB_COMPILE_CACHE_DIR.  A user-set
    JAX_COMPILATION_CACHE_DIR (or explicit jax.config) always wins.
    """
    import os

    if os.environ.get("NB_COMPILE_CACHE", "1") == "0":
        return
    if (os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _jax.config.jax_compilation_cache_dir):
        return
    # CPU-first processes run uncached: XLA:CPU AOT executables embed
    # compile-host machine features and reloading them cross-process
    # logs feature-mismatch errors with a SIGILL caveat.  The cache's
    # payoff is the TPU analysis ladder anyway.
    platforms = str(_jax.config.jax_platforms
                    or os.environ.get("JAX_PLATFORMS", ""))
    if platforms.split(",")[0].strip().lower() == "cpu":
        return
    path = os.environ.get("NB_COMPILE_CACHE_DIR")
    if not path:
        # repo-checkout layout: cache beside the package (gitignored);
        # fall back to ~/.cache for installed trees
        parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = (os.path.join(parent, ".jax_compile_cache")
                if os.access(parent, os.W_OK)
                else os.path.expanduser("~/.cache/nbodysimproject_tpu/jax"))
    try:
        os.makedirs(path, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", path)
    except OSError:  # unwritable target: run uncached
        pass


_enable_compile_cache()

# --- core (TPU-native surface) -----------------------------------------
from .core import SimConfig, SimState, DynParams, build_state
from .core.validation import SimulationValidator
from .core.constants import LAMBDA_SOFTENING, CHI_EPS, LAMBDA_SIGMA_STAR

# --- facade (reference API surface) -------------------------------------
from .facade import NBodySimulation, Body, BodyView
from .facade.simulation import (Integrator, HamiltonianSofteningIntegrator,
                                SofteningManager)

# --- numeric kernels ------------------------------------------------------
from .ops import (
    pairwise_geometry, gravitational_force, pairwise_force, softened_forces,
    dV_d_epsilon, dU_depsilon_plummer, softened_potential, dU_d_eps,
    barrier_energy, barrier_force, barrier_curvature,
    eps_target, grad_eps_target,
    reflect_if_needed, symplectic_bounce, symplectic_reflect_eps,
    reflect_eps_symplectic, reflect_and_limit_eps,
    UniversalVariableKeplerSolver,
)
from .ops.geometry import geometry_buffers

# --- flow maps / extended Hamiltonian -------------------------------------
from .integrators.flows_api import (PhaseState, spring_oscillation,
                                    strang_softening_step,
                                    extended_hamiltonian)

# --- diagnostics -----------------------------------------------------------
from .diagnostics import (Diagnostics, TangentMap, DynamicalFeatures,
                          EvolutionFeatures, validate_ham_soft)

# --- analysis ---------------------------------------------------------------
from .analysis import StabilityAnalyzer, BatchStabilityAnalyzer

# --- generators --------------------------------------------------------------
from .generators import (InitialConditionGenerator, GeneratorConfig,
                         SpecializedGenerators, MLTrainingPipeline)

# --- ML ------------------------------------------------------------------------
from .ml import (MLP, make_mlp, StabilityDataset, DataUtils, ScalerUtils,
                 MLPTrainer)
from .ml import train_lightgbm_main

# --- component name-parity views -------------------------------------------
from .facade.compat import (SimulationState, IntegratorConstants,
                            TimestepManager, HamSoftParams, HamSoftBarrier,
                            HamSoftStepper)
from .utils.accumulator import EnergyAccumulator

# --- utils -----------------------------------------------------------------------
from .utils import set_global_seed, save_checkpoint, load_checkpoint

__version__ = "0.1.0"

__all__ = [
    # reference __all__ parity (minbody/__init__.py:81-129)
    "set_global_seed",
    "SimConfig",
    "SimulationValidator",
    "SofteningManager",
    "grad_eps_target",
    "Body",
    "BodyView",
    "NBodySimulation",
    "Integrator",
    "HamiltonianSofteningIntegrator",
    "UniversalVariableKeplerSolver",
    "gravitational_force",
    "dV_d_epsilon",
    "geometry_buffers",
    "barrier_force",
    "barrier_energy",
    "barrier_curvature",
    "symplectic_bounce",
    "symplectic_reflect_eps",
    "reflect_if_needed",
    "reflect_eps_symplectic",
    "reflect_and_limit_eps",
    "dU_depsilon_plummer",
    "PhaseState",
    "spring_oscillation",
    "strang_softening_step",
    "extended_hamiltonian",
    "LAMBDA_SOFTENING",
    "CHI_EPS",
    "TangentMap",
    "Diagnostics",
    "validate_ham_soft",
    "DynamicalFeatures",
    "EvolutionFeatures",
    "StabilityAnalyzer",
    "BatchStabilityAnalyzer",
    "DataUtils",
    "ScalerUtils",
    "StabilityDataset",
    "InitialConditionGenerator",
    "GeneratorConfig",
    "SpecializedGenerators",
    "MLTrainingPipeline",
    "MLP",
    "make_mlp",
    "MLPTrainer",
    "train_lightgbm_main",
    # component name-parity views (SURVEY.md section 2 inventory)
    "SimulationState",
    "IntegratorConstants",
    "TimestepManager",
    "HamSoftParams",
    "HamSoftBarrier",
    "HamSoftStepper",
    "EnergyAccumulator",
    # TPU-native additions
    "SimState",
    "DynParams",
    "build_state",
    "save_checkpoint",
    "load_checkpoint",
    "LAMBDA_SIGMA_STAR",
    "pairwise_geometry",
    "pairwise_force",
    "softened_forces",
    "softened_potential",
    "dU_d_eps",
    "eps_target",
]
