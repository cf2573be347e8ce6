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
