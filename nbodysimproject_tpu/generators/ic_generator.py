"""Random initial-condition generation.

Parity: ``minbody/initial_condition_generator.py`` — ``GeneratorConfig``
(:29-38), ``InitialConditionGenerator`` (:41-169): uniform / log-uniform
masses, Gaussian positions, virial-scaled velocities with perturbation
and double COM removal, batch generation over random body counts, and
``validate_system``.

Host-side numpy with the reference's ``np.random`` semantics (the
generators are cheap; the expensive part — analysis — runs batched on
the TPU).  ``generate_batch_arrays`` additionally returns padded+masked
arrays ready for the batched engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..facade.simulation import NBodySimulation


@dataclass
class GeneratorConfig:
    mass_range: Tuple[float, float] = (0.1, 10.0)
    use_log_mass: bool = False
    position_scale: float = 1.0
    velocity_virial_fraction: float = 1.0
    velocity_perturbation: float = 0.1
    softening: float = 0.05
    G: float = 1.0
    seed: Optional[int] = None


class InitialConditionGenerator:
    def __init__(self, config: GeneratorConfig | None = None,
                 sim_config=None):
        self.config = config or GeneratorConfig()
        # optional shared SimConfig for the constructed simulations
        # (the pipeline passes one with slot bucketing)
        self.sim_config = sim_config
        if self.config.seed is not None:
            np.random.seed(self.config.seed)

    def _generate_masses(self, n: int) -> np.ndarray:
        lo, hi = self.config.mass_range
        if self.config.use_log_mass:
            return np.exp(np.random.uniform(np.log(lo), np.log(hi), n))
        return np.random.uniform(lo, hi, n)

    def _generate_positions(self, n: int) -> np.ndarray:
        return np.random.randn(n, 2) * self.config.position_scale

    def _compute_mean_separation(self, positions: np.ndarray) -> float:
        n = len(positions)
        if n < 2:
            return 1.0
        dx = positions[:, None, :] - positions[None, :, :]
        dist = np.sqrt((dx ** 2).sum(axis=-1))
        iu = np.triu_indices(n, 1)
        return float(np.mean(dist[iu])) if iu[0].size else 1.0

    def _compute_potential_energy(self, m, pos) -> float:
        """NOTE: the generator's potential uses r + eps (not Plummer),
        matching initial_condition_generator.py:70-78."""
        G, eps = self.config.G, self.config.softening
        n = len(m)
        dx = pos[:, None, :] - pos[None, :, :]
        r = np.sqrt((dx ** 2).sum(-1)) + eps
        iu = np.triu_indices(n, 1)
        return float(-G * np.sum((m[:, None] * m[None, :])[iu] / r[iu]))

    def _generate_velocities(self, m, pos) -> np.ndarray:
        n, G = len(m), self.config.G
        U = self._compute_potential_energy(m, pos)
        K_target = -U / 2.0 * self.config.velocity_virial_fraction
        if K_target <= 0.0:
            v_char = np.sqrt(G * m.sum() / self._compute_mean_separation(pos))
        else:
            v_char = np.sqrt(2.0 * K_target / m.sum())

        vel = np.random.randn(n, 2)
        speed = np.linalg.norm(vel, axis=1, keepdims=True)
        vel = np.where(speed > 0, vel / speed * v_char, vel)
        vel = _remove_com_velocity(m, vel)
        vel += np.random.randn(n, 2) * v_char * self.config.velocity_perturbation
        vel = _remove_com_velocity(m, vel)
        return vel

    def generate_single(self, n_bodies: int):
        m = self._generate_masses(n_bodies)
        p = self._generate_positions(n_bodies)
        v = self._generate_velocities(m, p)
        return m, p, v

    def generate_batch(self, n_systems: int,
                       n_bodies_range: Tuple[int, int] = (3, 5)) -> List:
        out = []
        for _ in range(n_systems):
            n = np.random.randint(n_bodies_range[0], n_bodies_range[1] + 1)
            out.append(self.generate_single(n))
        return out

    def create_simulation(self, n_bodies: int, *, integrator_mode=None,
                          adaptive_softening=None) -> NBodySimulation:
        m, p, v = self.generate_single(n_bodies)
        kwargs: Dict = dict(masses=m, positions=p, velocities=v,
                            G=self.config.G, softening=self.config.softening)
        if self.sim_config is not None:
            kwargs["config"] = self.sim_config
        if integrator_mode is not None:
            kwargs["integrator_mode"] = integrator_mode
        if adaptive_softening is not None:
            kwargs["adaptive_softening"] = adaptive_softening
        return NBodySimulation(**kwargs)

    def validate_system(self, masses, positions, velocities) -> Dict[str, float]:
        from ..diagnostics.metrics import Diagnostics

        sim = NBodySimulation(masses=masses, positions=positions,
                              velocities=velocities, G=self.config.G,
                              softening=self.config.softening)
        diag = Diagnostics(sim)
        KE = diag.kinetic_energy()
        PE = diag.potential_energy()
        E_tot = KE + PE
        virial = 2 * KE / abs(PE) if PE else np.inf
        L = diag.angular_momentum()
        com_pos, com_vel = diag.center_of_mass()
        return {
            "kinetic_energy": KE,
            "potential_energy": PE,
            "total_energy": E_tot,
            "virial_ratio": virial,
            "angular_momentum": L,
            "com_position": float(np.linalg.norm(com_pos)),
            "com_velocity": float(np.linalg.norm(com_vel)),
            "is_bound": bool(E_tot < 0),
        }


def _remove_com_velocity(m, vel):
    M = m.sum()
    if M <= 0:
        return vel
    return vel - (m[:, None] * vel).sum(0) / M
