"""ML dataset orchestration.

Capability parity: ``minbody/ml_training_pipeline.py:30-235``
(MLTrainingPipeline) — the four-cohort diverse mixture (40% random with
alternating log-mass, 30% hierarchical triples with velocity noise,
20% rotating polygons, remainder close encounters), the focused
boundary/stable/unstable datasets, and ``quick_test_pipeline``.

TPU-first: the whole population is drawn device-side by ONE jitted
program per cohort (``diverse_population``) from a single jax PRNG key,
then analysed by the batched analyzer — no per-system host work.  The
reference's per-system generator loop (ml_training_pipeline.py:44-122)
survives only as the thin sim-list view ``generate_diverse_dataset``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ic_generator import (InitialConditionGenerator, GeneratorConfig,
                           generate_population, sample_body_counts)
from .specialized import (SpecializedGenerators, hierarchical_triple_batch,
                          polygon_batch)
from ..analysis.stability import StabilityAnalyzer
from ..analysis.batch import BatchStabilityAnalyzer
from ..core.config import SimConfig
from ..facade.simulation import NBodySimulation as _NBodySimulation
from ..utils.seeding import set_global_seed

# All pipeline systems share one config with body slots bucketed to 8
# (n in [3, 7] then compiles ONE program per analysis group instead of
# one per body count; masked padding is trajectory-neutral) and the
# float32 fast path (float64 is software-emulated on TPU; the
# stability verdict thresholds are at the 1e-2 level, far above f32
# noise).
_PIPE_CFG = SimConfig(slot_bucket=8, fast_float32=True,
                      analysis_n_sub_cap=256,
                      # fused multi-step kernel between metric samples:
                      # 496 vs 408 systems/s warm at B=16k full mode
                      # (bench 2026-08; compile is ~2x the scan path,
                      # amortised at dataset batch sizes)
                      use_fused_analysis=True,
                      # canonical 1024-lane dispatches: dataset rows are
                      # bit-reproducible across shard topologies (see
                      # core/config.py), and small groups ride the fused
                      # engine's 8x128 block instead of a tiny scan
                      analysis_group_quantum=1024)
# early_exit_probe stays OFF for the diverse mixture: measured warm
# 354.7 vs 446 systems/s WITH the probe at B=16k — the high-n_sub tail
# here is dominated by legitimately-tight *stable* binaries (the frozen
# schedule is set from initial timescales, so late blow-ups land in the
# low buckets), and the probe is pure overhead.  The knob pays off on
# close-encounter-heavy populations where the tail does blow up early.
NBodySimulation = functools.partial(_NBodySimulation, config=_PIPE_CFG)

#: cohort mixture of the reference pipeline (ml_training_pipeline.py:39-135)
COHORT_FRACTIONS = {"random": 0.4, "hierarchical": 0.3, "polygon": 0.2}


def cohort_sizes(n_systems: int) -> dict:
    n_random = int(COHORT_FRACTIONS["random"] * n_systems)
    n_hier = int(COHORT_FRACTIONS["hierarchical"] * n_systems)
    n_poly = int(COHORT_FRACTIONS["polygon"] * n_systems)
    return {"random": n_random, "hierarchical": n_hier, "polygon": n_poly,
            "close_encounter": n_systems - n_random - n_hier - n_poly}


def diverse_population(key, n_systems: int, *, n_slots: int = 8,
                       dtype=jnp.float32, dim: int = 2):
    """Draw the four-cohort diverse population as (B, N, d) arrays.

    Returns (mass, pos, vel, mask, softening, types): padded+masked
    arrays, the per-system force softening, and the cohort tag list.
    Hyperparameter distributions follow the reference mixture:

    * random (40%): n in [3,5], log-mass on alternating systems,
      position scale U(0.5,2), virial fraction U(0.8,1.2),
      perturbation U(0.05,0.2), softening U(0.001,0.1);
    * hierarchical (30%): mass ratios U(0.1,1) / U(0.1,2), separation
      U(3,50), Gaussian velocity noise 0.05, softening 0.01;
    * polygon (20%): n in [3,7], radius U(0.5,3), rotation U(0,1),
      softening 0.05;
    * close encounter (rest): n in [3,4], scale 0.1, virial 1.5,
      perturbation 0.3, softening 0.001.

    ``dim=3`` (the reference is d=2-only, simulation_state.py:29-31;
    the BASELINE north star says (batch, N, 3)) draws the random and
    close-encounter cohorts with isotropic 3-D positions/velocities,
    gives hierarchical triples an isotropic mutual inclination
    (cos i ~ U(-1, 1) — the Kozai-Lidov-active regime included), and
    embeds polygons with a random tilt.
    """
    sizes = cohort_sizes(n_systems)
    k_rand, k_hier, k_poly, k_close = jax.random.split(key, 4)
    parts = []

    # -- random cohort --------------------------------------------------
    B = sizes["random"]
    if B:
        k_n, k_hp, k_gen = jax.random.split(k_rand, 3)
        hp = jax.random.uniform(k_hp, (4, B), dtype)
        soft = 0.001 + hp[3] * (0.1 - 0.001)
        m, q, v, mask = generate_population(
            k_gen, sample_body_counts(k_n, B, (3, 5)), n_slots=n_slots,
            dim=dim, log_mass=(jnp.arange(B) % 2 == 0),
            position_scale=0.5 + hp[0] * 1.5,
            virial_fraction=0.8 + hp[1] * 0.4,
            perturbation=0.05 + hp[2] * 0.15,
            softening=soft, dtype=dtype)
        parts.append((m, q, v, mask, soft, "random"))

    # -- hierarchical cohort --------------------------------------------
    B = sizes["hierarchical"]
    if B:
        k_hp, k_noise = jax.random.split(k_hier)
        hp = jax.random.uniform(k_hp, (3, B), dtype)
        inc = None
        if dim == 3:
            # extra key drawn only on the 3-D path so the 2-D stream
            # stays bit-identical to the round-2 datasets
            cos_i = jax.random.uniform(jax.random.fold_in(k_hier, 3),
                                       (B,), dtype, -1.0, 1.0)
            inc = jnp.arccos(cos_i)
        m, q, v, mask = hierarchical_triple_batch(
            0.1 + hp[0] * 0.9, 0.1 + hp[1] * 1.9, 3.0 + hp[2] * 47.0,
            n_slots=n_slots, dtype=dtype, inclination=inc)
        v = v + jax.random.normal(k_noise, v.shape, dtype) * 0.05
        v = jnp.where(mask[..., None], v, 0.0)
        parts.append((m, q, v, mask, jnp.full((B,), 0.01, dtype),
                      "hierarchical"))

    # -- polygon cohort ---------------------------------------------------
    B = sizes["polygon"]
    if B:
        k_n, k_hp = jax.random.split(k_poly)
        hp = jax.random.uniform(k_hp, (2, B), dtype)
        tilt = None
        if dim == 3:
            tilt = jax.random.uniform(jax.random.fold_in(k_poly, 3),
                                      (B,), dtype) * jnp.pi
        m, q, v, mask = polygon_batch(
            jax.random.randint(k_n, (B,), 3, 8), 0.5 + hp[0] * 2.5,
            hp[1], n_slots=n_slots, dtype=dtype, tilt=tilt)
        parts.append((m, q, v, mask, jnp.full((B,), 0.05, dtype), "polygon"))

    # -- close-encounter cohort -------------------------------------------
    B = sizes["close_encounter"]
    if B:
        k_n, k_gen = jax.random.split(k_close)
        m, q, v, mask = generate_population(
            k_gen, sample_body_counts(k_n, B, (3, 4)), n_slots=n_slots,
            dim=dim, position_scale=0.1, virial_fraction=1.5,
            perturbation=0.3, softening=0.001, dtype=dtype)
        parts.append((m, q, v, mask, jnp.full((B,), 0.001, dtype),
                      "close_encounter"))

    mass = jnp.concatenate([p[0] for p in parts])
    pos = jnp.concatenate([p[1] for p in parts])
    vel = jnp.concatenate([p[2] for p in parts])
    mask = jnp.concatenate([p[3] for p in parts])
    soft = jnp.concatenate([p[4] for p in parts])
    types = sum(([p[5]] * p[0].shape[0] for p in parts), [])
    return mass, pos, vel, mask, soft, types


def boundary_hier_population(key, n_systems: int, *, n_slots: int = 8,
                             dtype=jnp.float32,
                             sep_range=(2.0, 10.0),
                             noise_range=(0.05, 0.3)):
    """Hierarchical triples straddling the stability edge.

    The diverse mixture's hierarchical cohort (separation U(3,50),
    floored at 5) is 93.7% stable, so a classifier can score well there
    by reading the prior alone (within-cohort AUROC 0.55 on the 131k
    eval).  This cohort samples separation U(2, 10) with velocity noise
    U(0.05, 0.3), crossing the Mardling–Aarseth edge, so hierarchical
    stability actually varies and must be predicted from the ICs.

    Returns (mass, pos, vel, mask, softening, types) like
    ``diverse_population``.
    """
    s_lo, s_hi = float(sep_range[0]), float(sep_range[1])
    a_lo, a_hi = float(noise_range[0]), float(noise_range[1])
    k_hp, k_noise, k_amp = jax.random.split(key, 3)
    hp = jax.random.uniform(k_hp, (3, n_systems), dtype)
    m, q, v, mask = hierarchical_triple_batch(
        0.1 + hp[0] * 0.9, 0.1 + hp[1] * 1.9,
        s_lo + hp[2] * (s_hi - s_lo),
        n_slots=n_slots, dtype=dtype, min_separation=s_lo)
    amp = jax.random.uniform(k_amp, (n_systems, 1, 1), dtype,
                             minval=a_lo, maxval=a_hi)
    v = v + jax.random.normal(k_noise, v.shape, dtype) * amp
    v = jnp.where(mask[..., None], v, 0.0)
    soft = jnp.full((n_systems,), 0.01, dtype)
    return m, q, v, mask, soft, ["hierarchical_boundary"] * n_systems


def boundary_close_population(key, n_systems: int, *, n_slots: int = 8,
                              dtype=jnp.float32, dim: int = 2):
    """Close encounters straddling the stability edge.

    The diverse mixture's close-encounter cohort (scale 0.1, virial
    1.5, softening 1e-3) is 99.5% unstable — prior-degenerate like the
    hierarchical slice (per_cohort_metrics_1M.json: TPR 0.0 at the
    global threshold).  This cohort varies the virial fraction
    U(0.6, 1.4), scale U(0.1, 0.5), perturbation U(0.05, 0.3) and
    softening logU(1e-3, 3e-2) so close-encounter stability actually
    varies and the operating point is learnable.
    """
    k_n, k_hp, k_gen = jax.random.split(key, 3)
    hp = jax.random.uniform(k_hp, (4, n_systems), dtype)
    soft = jnp.exp(jnp.log(1e-3) + hp[3] * (jnp.log(3e-2) - jnp.log(1e-3)))
    m, q, v, mask = generate_population(
        k_gen, sample_body_counts(k_n, n_systems, (3, 4)), n_slots=n_slots,
        dim=dim, position_scale=0.1 + hp[0] * 0.4,
        virial_fraction=0.6 + hp[1] * 0.8,
        perturbation=0.05 + hp[2] * 0.25,
        softening=soft, dtype=dtype)
    return m, q, v, mask, soft, ["close_encounter_boundary"] * n_systems


#: headline v3 mixture (VERDICT round-2 item 2): the four reference
#: cohorts plus the two stability-edge slices as first-class members,
#: so the hierarchical and close-encounter populations carry label
#: variance a classifier must actually predict.
HEADLINE_V3_FRACTIONS = {"random": 0.35, "hierarchical": 0.15,
                         "hierarchical_boundary": 0.15, "polygon": 0.15,
                         "close_encounter": 0.10}


def headline_population(key, n_systems: int, *, n_slots: int = 8,
                        dtype=jnp.float32, dim: int = 2):
    """The round-3 headline mixture: diverse cohorts + boundary slices.

    Returns (mass, pos, vel, mask, softening, types).  Slices:
    random 35%, hierarchical 15%, hierarchical_boundary 15% (separation
    U(1.5, 5) x velocity noise U(0.1, 0.5) — across the
    Mardling-Aarseth edge), polygon 15%, close_encounter 10%,
    close_encounter_boundary (rest ~10%).
    """
    fr = HEADLINE_V3_FRACTIONS
    n_r = int(fr["random"] * n_systems)
    n_h = int(fr["hierarchical"] * n_systems)
    n_hb = int(fr["hierarchical_boundary"] * n_systems)
    n_p = int(fr["polygon"] * n_systems)
    n_c = int(fr["close_encounter"] * n_systems)
    n_cb = n_systems - n_r - n_h - n_hb - n_p - n_c

    k_div, k_hb, k_cb = jax.random.split(key, 3)
    # the four standard cohorts reuse diverse_population's draws at
    # scaled sizes (keeps each slice's hyperparameter distributions
    # identical to the reference mixture)
    n_div = n_r + n_h + n_p + n_c
    # diverse_population's internal fractions are 0.4/0.3/0.2/rest; we
    # re-derive a size whose splits approximate ours, then trim
    m, q, v, mask, soft, types = diverse_population(
        k_div, n_div, n_slots=n_slots, dtype=dtype, dim=dim)
    t = np.asarray(types)
    keep = []
    budget = {"random": n_r, "hierarchical": n_h, "polygon": n_p,
              "close_encounter": n_c}
    for i, ty in enumerate(t):
        if budget.get(ty, 0) > 0:
            keep.append(i)
            budget[ty] -= 1
    short = {k: vv for k, vv in budget.items() if vv > 0}
    if short:
        # top up underfilled slices with a second draw
        m2, q2, v2, mask2, soft2, types2 = diverse_population(
            jax.random.fold_in(k_div, 1), n_div, n_slots=n_slots,
            dtype=dtype, dim=dim)
        t2 = np.asarray(types2)
        extra = []
        for i, ty in enumerate(t2):
            if short.get(ty, 0) > 0:
                extra.append(i)
                short[ty] -= 1
        keep_idx = np.asarray(keep, np.int64)
        extra_idx = np.asarray(extra, np.int64)
        m = jnp.concatenate([m[keep_idx], m2[extra_idx]])
        q = jnp.concatenate([q[keep_idx], q2[extra_idx]])
        v = jnp.concatenate([v[keep_idx], v2[extra_idx]])
        mask = jnp.concatenate([mask[keep_idx], mask2[extra_idx]])
        soft = jnp.concatenate([soft[keep_idx], soft2[extra_idx]])
        types = [types[i] for i in keep] + [types2[i] for i in extra]
    else:
        keep_idx = np.asarray(keep, np.int64)
        m, q, v = m[keep_idx], q[keep_idx], v[keep_idx]
        mask, soft = mask[keep_idx], soft[keep_idx]
        types = [types[i] for i in keep]

    parts = [(m, q, v, mask, soft, types)]
    if n_hb:
        hb = boundary_hier_population(k_hb, n_hb, n_slots=n_slots,
                                      dtype=dtype, sep_range=(1.5, 5.0),
                                      noise_range=(0.1, 0.5))
        if dim == 3:
            # embed the planar boundary triples in 3-D (z = 0): the
            # dynamics is planar but the schema matches the batch
            pad = lambda a: jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (1,), a.dtype)], -1)
            hb = (hb[0], pad(hb[1]), pad(hb[2]), hb[3], hb[4],
                  ["hierarchical_boundary"] * n_hb)
        else:
            hb = hb[:5] + (["hierarchical_boundary"] * n_hb,)
        parts.append(hb)
    if n_cb:
        parts.append(boundary_close_population(k_cb, n_cb,
                                               n_slots=n_slots,
                                               dtype=dtype, dim=dim))

    mass = jnp.concatenate([p[0] for p in parts])
    pos = jnp.concatenate([p[1] for p in parts])
    vel = jnp.concatenate([p[2] for p in parts])
    msk = jnp.concatenate([p[3] for p in parts])
    sft = jnp.concatenate([p[4] for p in parts])
    tys = sum((list(p[5]) for p in parts), [])
    return mass, pos, vel, msk, sft, tys


class MLTrainingPipeline:
    def __init__(self, n_systems: int = 1000, n_steps: int = 1000,
                 dt: float = 0.01, seed: int = 0):
        self.n_systems = n_systems
        self.n_steps = max(500, min(2000, n_steps))
        self.dt = dt
        self.seed = int(seed)
        self.ic_generator = InitialConditionGenerator(sim_config=_PIPE_CFG)
        self.batch_analyzer = BatchStabilityAnalyzer(
            n_steps=self.n_steps, dt=self.dt, mode="full")

    def _population(self, dtype=jnp.float32):
        return diverse_population(jax.random.PRNGKey(self.seed),
                                  self.n_systems, n_slots=8, dtype=dtype)

    def generate_diverse_dataset(self):
        """Sim-list view of the diverse mixture: the same device-drawn
        population, analysed through the facade batch analyzer
        (reference surface, ml_training_pipeline.py:39-135)."""
        sizes = cohort_sizes(self.n_systems)
        print(f"Generating {self.n_systems} diverse N-body systems "
              f"({', '.join(f'{v} {k}' for k, v in sizes.items())})...")
        mass, pos, vel, mask, soft, types = self._population()
        mass, pos, vel = np.asarray(mass), np.asarray(pos), np.asarray(vel)
        counts = np.asarray(mask.sum(1))
        soft = np.asarray(soft)

        simulations = [
            NBodySimulation(masses=mass[i, :n], positions=pos[i, :n],
                            velocities=vel[i, :n], G=1.0,
                            softening=float(soft[i]))
            for i, n in enumerate(counts)]

        print(f"\nAnalyzing {len(simulations)} systems...")
        results_df = self.batch_analyzer.analyze_batch(simulations,
                                                       show_progress=True)
        results_df["system_type"] = types
        return results_df

    def generate_diverse_dataset_batched(self):
        """The same four cohorts produced as (B, N, d) arrays and
        analysed by ONE batched construction + analysis program
        (``analyze_population``) — the path for 1e5-scale sweeps
        (BASELINE config #5)."""
        from ..analysis.batch import analyze_population

        print(f"Generating {self.n_systems} diverse N-body systems "
              f"(batched)...")
        mass, pos, vel, mask, soft, types = self._population()
        df = analyze_population(
            mass, pos, vel, mask, _PIPE_CFG, G=1.0,
            softening=np.asarray(soft), min_softening=0.0, dt=self.dt,
            n_steps=self.n_steps, mode="full", seed=self.seed)
        df["system_type"] = types
        return df

    def generate_focused_dataset(self, focus: str = "boundary"):
        print(f"Generating {self.n_systems} systems focused on {focus} cases...")
        simulations = []
        if focus == "boundary":
            for i in range(self.n_systems):
                if i % 3 == 0:
                    m, p, v = SpecializedGenerators.generate_hierarchical_triple(
                        separation_ratio=np.random.uniform(5, 15))
                    sim = NBodySimulation(masses=m, positions=p, velocities=v)
                elif i % 3 == 1:
                    config = GeneratorConfig(
                        velocity_virial_fraction=1.0,
                        velocity_perturbation=np.random.uniform(0.1, 0.3))
                    sim = InitialConditionGenerator(config, sim_config=_PIPE_CFG).create_simulation(
                        np.random.randint(3, 5))
                else:
                    m, p, v = SpecializedGenerators.generate_equal_mass_polygon(
                        np.random.randint(4, 7),
                        rotation_fraction=np.random.uniform(0.3, 0.7))
                    sim = NBodySimulation(masses=m, positions=p, velocities=v)
                simulations.append(sim)
        elif focus == "stable":
            for _ in range(self.n_systems):
                m, p, v = SpecializedGenerators.generate_hierarchical_triple(
                    separation_ratio=np.random.uniform(20, 100))
                v = v + np.random.randn(*v.shape) * 0.01
                simulations.append(NBodySimulation(
                    masses=m, positions=p, velocities=v, softening=0.01))
        else:
            for _ in range(self.n_systems):
                config = GeneratorConfig(
                    position_scale=0.1,
                    velocity_virial_fraction=np.random.uniform(1.5, 2.0),
                    velocity_perturbation=0.5,
                    softening=0.001)
                simulations.append(InitialConditionGenerator(config, sim_config=_PIPE_CFG)
                                   .create_simulation(np.random.randint(3, 6)))

        results_df = self.batch_analyzer.analyze_batch(simulations)
        results_df["dataset_focus"] = focus
        return results_df

    def quick_test_pipeline(self):
        import pandas as pd

        set_global_seed(42)
        print("Running quick test with 10 systems...")
        generator = InitialConditionGenerator()
        test_sims = [generator.create_simulation(3 + (i % 3))
                     for i in range(10)]

        print("\nTesting unified analyzer in core mode...")
        results = []
        for i, sim in enumerate(test_sims):
            analyzer = StabilityAnalyzer(sim, n_steps=100, dt=0.01, mode="core")
            result = analyzer.run_stability_analysis()
            result["system_id"] = i
            results.append(result)
            status = "STABLE" if result["is_stable"] else "UNSTABLE"
            print(f"System {i}: {status} (E_drift={result['energy_drift']:.2e})")

        test_df = pd.DataFrame(results)
        n_stable = int(sum(test_df["is_stable"]))
        print(f"\nTest complete. {n_stable} stable, "
              f"{len(test_df) - n_stable} unstable")
        return test_df
