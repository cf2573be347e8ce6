"""ML dataset orchestration.

Parity: ``minbody/ml_training_pipeline.py:30-235`` (MLTrainingPipeline):
the four diverse cohorts with the reference's exact mixture (40% random
— alternating log-mass, 30% hierarchical triples with velocity noise,
20% rotating polygons, remainder close encounters), the focused
boundary/stable/unstable datasets, and ``quick_test_pipeline``.

The systems are generated host-side (cheap) and analysed by the
batched TPU analyzer, replacing the reference's serial loop.
"""

from __future__ import annotations

import functools

import numpy as np

from .ic_generator import InitialConditionGenerator, GeneratorConfig
from .specialized import SpecializedGenerators
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
_PIPE_CFG = SimConfig(slot_bucket=8, fast_float32=True)
NBodySimulation = functools.partial(_NBodySimulation, config=_PIPE_CFG)


class MLTrainingPipeline:
    def __init__(self, n_systems: int = 1000, n_steps: int = 1000,
                 dt: float = 0.01):
        self.n_systems = n_systems
        self.n_steps = max(500, min(2000, n_steps))
        self.dt = dt
        self.ic_generator = InitialConditionGenerator(sim_config=_PIPE_CFG)
        self.batch_analyzer = BatchStabilityAnalyzer(
            n_steps=self.n_steps, dt=self.dt, mode="full")

    def generate_diverse_dataset(self):
        print(f"Generating {self.n_systems} diverse N-body systems...")
        simulations = []

        n_random = int(0.4 * self.n_systems)
        print(f"\n1. Generating {n_random} random systems...")
        for i in range(n_random):
            n_bodies = np.random.randint(3, 6)
            config = GeneratorConfig(
                mass_range=(0.1, 10.0),
                use_log_mass=(i % 2 == 0),
                position_scale=np.random.uniform(0.5, 2.0),
                velocity_virial_fraction=np.random.uniform(0.8, 1.2),
                velocity_perturbation=np.random.uniform(0.05, 0.2),
                softening=np.random.uniform(0.001, 0.1),
            )
            simulations.append(
                InitialConditionGenerator(config, sim_config=_PIPE_CFG).create_simulation(n_bodies))

        n_hier = int(0.3 * self.n_systems)
        print(f"2. Generating {n_hier} hierarchical systems...")
        for _ in range(n_hier):
            masses, positions, velocities = (
                SpecializedGenerators.generate_hierarchical_triple(
                    np.random.uniform(0.1, 1.0), np.random.uniform(0.1, 2.0),
                    np.random.uniform(3, 50)))
            velocities = velocities + np.random.randn(*velocities.shape) * 0.05
            simulations.append(NBodySimulation(
                masses=masses, positions=positions, velocities=velocities,
                G=1.0, softening=0.01))

        n_poly = int(0.2 * self.n_systems)
        print(f"3. Generating {n_poly} polygon configurations...")
        for _ in range(n_poly):
            masses, positions, velocities = (
                SpecializedGenerators.generate_equal_mass_polygon(
                    np.random.randint(3, 8), np.random.uniform(0.5, 3.0),
                    np.random.uniform(0, 1.0)))
            simulations.append(NBodySimulation(
                masses=masses, positions=positions, velocities=velocities,
                G=1.0, softening=0.05))

        n_close = self.n_systems - n_random - n_hier - n_poly
        print(f"4. Generating {n_close} close encounter systems...")
        for _ in range(n_close):
            config = GeneratorConfig(position_scale=0.1,
                                     velocity_virial_fraction=1.5,
                                     velocity_perturbation=0.3,
                                     softening=0.001)
            simulations.append(InitialConditionGenerator(config, sim_config=_PIPE_CFG)
                               .create_simulation(np.random.randint(3, 5)))

        print(f"\nAnalyzing {len(simulations)} systems...")
        results_df = self.batch_analyzer.analyze_batch(simulations,
                                                       show_progress=True)
        results_df["system_type"] = (
            ["random"] * n_random + ["hierarchical"] * n_hier
            + ["polygon"] * n_poly + ["close_encounter"] * n_close)
        return results_df

    def generate_diverse_dataset_batched(self):
        """The same four cohorts as ``generate_diverse_dataset`` but
        produced as (B, N, d) arrays and analysed by ONE batched
        construction + analysis program (``analyze_population``) — the
        path for 1e5-scale sweeps (BASELINE config #5)."""
        from ..analysis.batch import analyze_population

        print(f"Generating {self.n_systems} diverse N-body systems "
              f"(batched)...")
        N_SLOTS = 8
        rows_m, rows_q, rows_v, softs, types = [], [], [], [], []

        def add(m, q, v, soft, tag):
            n = len(m)
            mm = np.zeros(N_SLOTS)
            qq = np.zeros((N_SLOTS, 2))
            vv = np.zeros((N_SLOTS, 2))
            mm[:n] = m
            qq[:n] = q
            vv[:n] = v
            rows_m.append(mm)
            rows_q.append(qq)
            rows_v.append(vv)
            softs.append(soft)
            types.append(tag)

        n_random = int(0.4 * self.n_systems)
        for i in range(n_random):
            n_bodies = np.random.randint(3, 6)
            config = GeneratorConfig(
                mass_range=(0.1, 10.0), use_log_mass=(i % 2 == 0),
                position_scale=np.random.uniform(0.5, 2.0),
                velocity_virial_fraction=np.random.uniform(0.8, 1.2),
                velocity_perturbation=np.random.uniform(0.05, 0.2),
                softening=np.random.uniform(0.001, 0.1))
            m, q, v = InitialConditionGenerator(config).generate_single(n_bodies)
            add(m, q, v, config.softening, "random")

        n_hier = int(0.3 * self.n_systems)
        for _ in range(n_hier):
            m, q, v = SpecializedGenerators.generate_hierarchical_triple(
                np.random.uniform(0.1, 1.0), np.random.uniform(0.1, 2.0),
                np.random.uniform(3, 50))
            v = v + np.random.randn(*v.shape) * 0.05
            add(m, q, v, 0.01, "hierarchical")

        n_poly = int(0.2 * self.n_systems)
        for _ in range(n_poly):
            m, q, v = SpecializedGenerators.generate_equal_mass_polygon(
                np.random.randint(3, 8), np.random.uniform(0.5, 3.0),
                np.random.uniform(0, 1.0))
            add(m, q, v, 0.05, "polygon")

        n_close = self.n_systems - n_random - n_hier - n_poly
        for _ in range(n_close):
            config = GeneratorConfig(position_scale=0.1,
                                     velocity_virial_fraction=1.5,
                                     velocity_perturbation=0.3,
                                     softening=0.001)
            m, q, v = InitialConditionGenerator(config).generate_single(
                np.random.randint(3, 5))
            add(m, q, v, 0.001, "close_encounter")

        mass = np.stack(rows_m)
        pos = np.stack(rows_q)
        vel = np.stack(rows_v)
        mask = mass > 0

        df = analyze_population(
            mass, pos, vel, mask, _PIPE_CFG, G=1.0,
            softening=np.asarray(softs), min_softening=0.0, dt=self.dt,
            n_steps=self.n_steps, mode="full")
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
