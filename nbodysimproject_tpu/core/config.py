"""Static simulation configuration.

Parity: ``minbody/sim_config.py:27`` (SimConfig dataclass) plus every
"shadow" knob the reference reads via ``getattr(cfg, name, default)``
without declaring it (SURVEY.md section 5: j_max_cap, chi_pi,
fixed_eps_star, eps_star_value, use_legacy_eps_star, lambda_softening,
include_barrier_curvature_in_S, theta_imp, diag_prints, ...).

TPU-first: the config is frozen + hashable so it can be a jit-static
argument; every field that participates in traced computation as a
*value* (floats) is read out into dynamic ``DynParams`` at init, while
booleans / mode strings steer Python-level structure of the compiled
program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

_ALLOWED_MODES = {"verlet", "yoshida4", "whfast", "ham_soft"}


@dataclass(frozen=True)
class SimConfig:
    # --- declared reference fields (sim_config.py:28-57) ---------------
    safety_factor: float = 0.20
    theta_cap: float = 0.1
    theta_imp: float = 0.5
    k_soft: float = 1.0e3
    enable_runtime_guard: bool = False
    split_n_max: int = 50
    fast_float32: bool = False
    adaptive_timestep: bool = False
    adaptive_softening: bool = False
    softening_scale: float = 1.0
    integrator_mode: str = "ham_soft"
    use_energy_spring: bool = True
    use_soft_barrier: bool = True
    initial_dt: float = 0.01
    max_fraction_of_dt: float = 0.1
    corrector_order: int = 5
    disable_barrier: bool = False
    barrier_exponent: int = 5
    k_wall: float = 1.0e9
    n_wall: int = 4
    alpha: float = 0.1
    eta: float = 1.35
    guard_dt_ref: float = 1e-3
    energy_drift_abort_threshold: float = 1e-6
    ang_mom_drift_abort_threshold: float = 1e-5
    abort_on_violation: bool = True
    fixed_substeps: bool = True
    invariant_check_interval: int = 2000
    energy_tol_pref: float = 1e-8
    freeze_s_subsystem: bool = False

    # --- shadow flags read via getattr in the reference ----------------
    j_max_cap: float = 0.02              # hamsoft_stepper.py:33-45
    chi_pi: float = 0.2                  # hamiltonian_softening_integrator.py:216-221
    fixed_eps_star: bool = False         # hamsoft_eps_model.py:82
    # None (not NaN!) when unset — the config is a jit-static argument
    # and a NaN field would break its own equality, defeating the jit
    # cache (every step would recompile)
    eps_star_value: float | None = None  # hamsoft_eps_model.py:83
    use_legacy_eps_star: bool = False    # hamsoft_eps_model.py:87
    lambda_softening: float = 0.3        # hamsoft_constants.py:35 (env LAMBDA_SOFTENING)
    include_barrier_curvature_in_S: bool = False  # hamsoft_stepper.py:167
    diag_prints: bool = True             # diagnostics.py:395
    diag_print_limit: int = 3
    diag_print_interval: int = 1000
    _validate_S_only: bool = False       # hamiltonian_softening_integrator.py:804
    _allow_v_eps_override: bool = False  # hamsoft_stepper.py:554

    # --- TPU-build extensions ------------------------------------------
    dim: int = 2                         # reference hard-codes 2; we parameterise
    # Gradient of eps*(q) used by the ham_soft spring impulse:
    #  "exact"     — reverse-mode gradient of the actual (clamped)
    #                eps_target_production.  The dynamics is then the
    #                exact Hamiltonian flow of H_ext: momentum exact,
    #                |dH_mod| = O(h^2) per the proofs PDF.  (default)
    #  "reference" — bug-compatible: when the exact gradient degenerates
    #                (clamp saturation in sparse systems) substitute the
    #                Omega-corrected SPH gradient sign-aligned against
    #                the legacy one (hamsoft_eps_model.py:203-228).
    #                That vector is NOT the gradient of eps*, so H_ext
    #                drifts secularly — reproduces reference
    #                trajectories, not its claimed invariants.
    eps_grad_mode: str = "exact"
    # Use the Pallas tiled pairwise-force kernel instead of the dense
    # XLA einsum when a system has at least `pallas_force_min_n`
    # bodies.  Off by default: the few-body regime (the reference's
    # entire domain) is faster on the dense path, and the kernel
    # requires fully-valid (unpadded) systems.
    use_pallas_forces: bool = False
    pallas_force_min_n: int = 1024
    # Evaluate the spring flow's (eps*, grad) through the fused Pallas
    # kernel (ops/pallas_eps.py) when a vmapped ham_soft scan runs on
    # an accelerator in float32 — the scan path's dominant HBM cost.
    # Semantics-parity with the XLA evaluation is kernel-tested; CPU,
    # float64, and non-vmapped paths always use the XLA evaluation.
    # Measured on v5e (tools/bench_eps_kernel.py): 4.9x the macro scan
    # (1.79e7 -> 8.76e7 sys-steps/s at B=2^17) with BITWISE-identical
    # trajectories over 100 macro steps.
    fused_eps_grad: bool = True
    # Pad body slots up to a multiple of this bucket (masked padding is
    # exactly trajectory-neutral).  Populations with mixed body counts
    # then share one compiled program per bucket instead of one per N.
    slot_bucket: int = 1
    # Batched-analysis cap on ham_soft's frozen substep count.  The
    # reference runs the full n_pred (HSI:504-551) — unbounded cost on
    # near-singular systems (measured p99.9 ~ 9e3 substeps/step on the
    # diverse mixture).  0 = fall back to split_n_max (round-1
    # behaviour).  Under-integrating a tight binary inflates its energy
    # drift and can flip a would-be-stable label, so dataset pipelines
    # raise this (256 covers ~98% of systems exactly at ~2x the
    # capped-50 cost); the frame records n_sub/n_sub_capped for
    # transparency.
    analysis_n_sub_cap: int = 0
    # Early-exit probe for the batched analysis (0 = off).  High-n_sub
    # buckets dominate wall clock and are mostly pathological systems
    # that blow past the |drift| > 10 threshold almost immediately;
    # with probe > 0, buckets with n_sub >= early_exit_min_n_sub first
    # run ceil(probe * n_steps) steps in core mode, and only the
    # survivors run the full horizon (from scratch — their columns are
    # bit-identical to a non-early-exit run).  Aborted rows keep the
    # probe's (already super-threshold) drift, NaN chaos columns, the
    # forced-unstable label, and an `early_exit` marker column.
    early_exit_probe: float = 0.0
    early_exit_min_n_sub: int = 8
    # Tight-binary tail fast path for the batched analysis
    # (integrators/kepler_split.py; VERDICT round-2 item 1).  Systems
    # whose frozen schedule demands >= tail_min_n_sub substeps AND
    # whose tightest pair dominates every other pair timescale by
    # tail_dominance_margin are re-scheduled onto the "kepler_split"
    # integrator: exact universal-variable Kepler drift for the pair,
    # perturbation kicks at the outer timescale — n_sub collapses from
    # O(hundreds) to O(1-4).  Labels on non-tail systems are untouched
    # (they never enter this path); tail labels measure drift of the
    # split Hamiltonian.  "kepler" = on, "off" = round-2 behaviour.
    analysis_tail_policy: str = "kepler"
    tail_min_n_sub: int = 64
    tail_dominance_margin: float = 3.0
    tail_min_gain: int = 8
    # Canonical dispatch width for batched-analysis groups.  0 = pad
    # each (bucket, tail) group to its own power of two (fast
    # interactive default).  > 0 = run every group in fixed chunks of
    # exactly this many lanes: the compiled program SHAPE — hence XLA's
    # fusion/FMA choices, hence per-lane f32 rounding — no longer
    # depends on how the population was sharded across hosts, so a
    # process-sharded dataset (parallel/distributed.py) is
    # BIT-reproducible against the single-process run even for chaotic
    # systems that amplify 1-ulp differences.  Lanes are independent
    # (no cross-lane control flow in either engine), so chunk
    # membership cannot leak between systems.  Dataset pipelines set
    # 1024 (= the fused engine's 8x128 block, so small groups ride the
    # fused path too); costs one padded dispatch per partial chunk.
    analysis_group_quantum: int = 0
    # Cost-aware bucket packing (quantum > 0 paths): merge a small
    # n_sub bucket into the next larger one when that strictly reduces
    # total sequential kernel trips (n_sub_max * ceil(n/quantum) per
    # group).  Scheduling-only: per-lane results are bucket-value
    # independent (masked trips), parity-tested.
    analysis_bucket_packing: bool = True
    # Kepler solver depth on the tail fast path: > 0 = fixed-iteration
    # Laguerre-Conway (no cross-lane control flow — the adaptive
    # while_loop's worst-lane gating dominated the tail bucket inside
    # long analysis scans); 0 = adaptive 64-cap solver.
    tail_kepler_iters: int = 8
    # Use the fused multi-step Pallas kernel inside batched analysis
    # (analysis/fused.py).  Opt-in: the kernel beats the XLA scan
    # 2.4-2.7x on pure integration (bench.py), but at the pipeline's
    # 8-slot config the metric-interleaved analysis measured slightly
    # SLOWER fused (322 vs 352 systems/s at B=16k) — per-chunk layout
    # folding and the rematerialised eps* backward (scoped-VMEM limit)
    # eat the residency win.
    use_fused_analysis: bool = False
    # MEGNO continuation inside the fused analysis: kernel (True) vs
    # vmapped XLA megno_scan (False).  Only read on the fused path.
    use_fused_megno: bool = True
    # Metric sampling inside the fused analysis: True = one kernel call
    # per horizon with the running moments accumulated in-register
    # (ops/pallas_hamsoft.py::hamsoft_analysis_multistep); False = the
    # round-3 form (~100 alternations of multistep kernel + XLA
    # step_metrics, whose per-call launch overhead dominated low-n_sub
    # chunks).  Only read on the fused path; sampled values agree to
    # f32 reduction-order noise (parity-tested).
    use_fused_metrics: bool = True
    # Large-N force engine for verlet-mode rollouts through the facade
    # and `integrators.largen.largen_rollout`:
    #  "direct"        — the few-body dense-einsum / pallas-tiled path
    #                    (exact; O(N^2))
    #  "p3m"           — smooth-split FFT mesh + banded short-range
    #                    pass (ops/pm_force.py; d=2, ~0.1% p99 force
    #                    error, 12x direct at N=1e6)
    #  "direct_pallas" — force the tiled Pallas direct kernel
    #  "auto"          — p3m when N >= pm_auto_min_n and d == 2, else
    #                    tiled direct
    force_mode: str = "direct"
    # Newton depth of the WHFast Kepler drifts:
    #  0   — the adaptive worst-lane-gated while_loop (64-iter cap,
    #        reference kepler_solver.py:66 parity).  DEFAULT: measured
    #        fastest on both bench shapes (batched 3-body 7.8e7
    #        sys-steps/s vs 6.1e7 fixed-8; N = 4096 parity) — the
    #        round-2 "worst-lane Newton gating" hypothesis was wrong,
    #        the many-planet cost was the dense interaction force (now
    #        Pallas-tiled via use_pallas_forces).
    #  > 0 — fixed-iteration Laguerre-Conway solver (ops/kepler.py
    #        kepler_propagate_fixed): no cross-lane control flow, so
    #        an adversarial batch with one slow-converging lane cannot
    #        gate the whole vmap at the 64-iter cap.  8 gives
    #        machine-precision chi on every tested orbit; 4 is NOT
    #        enough (39/500 energy violations on extreme drifts).
    whfast_kepler_iters: int = 0
    pm_grid: int = 256                   # P3M mesh cells per side
    pm_r_cut_cells: float = 4.0          # short-range split radius
    pm_auto_min_n: int = 32768           # "auto" crossover (bench-measured)

    def copy(self) -> "SimConfig":
        """Shallow copy, API parity with sim_config.py:59-62."""
        return dataclasses.replace(self)

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
