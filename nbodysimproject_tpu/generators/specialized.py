"""Specialized deterministic configurations.

Capability parity: ``minbody/specialized_generators.py`` —
``generate_hierarchical_triple`` (:22-64) and
``generate_equal_mass_polygon`` (:66-94).  The closed-form
constructions are the spec; in addition to the reference-shaped
per-system staticmethods, batch-first jitted builders produce whole
``(B, N, d)`` cohorts from ``(B,)`` parameter arrays for the dataset
pipeline (SURVEY.md section 7.5).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ic_generator import com_momentum_projection, com_recenter


# ----------------------------------------------------------------------
# batch-first builders
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_slots", "dtype", "min_separation"))
def hierarchical_triple_batch(mass_ratio1, mass_ratio2, separation_ratio,
                              *, G=1.0, n_slots: int = 3,
                              dtype=jnp.float64,
                              min_separation: float = 5.0,
                              inclination=None):
    """(B,) parameter arrays -> (mass, pos, vel, mask) for a batch of
    hierarchical triples: an inner circular binary of unit semi-major
    axis plus an outer body at max(separation, min_separation) on a
    circular orbit around the total mass, COM momentum projected out.

    ``min_separation`` defaults to the reference's floor of 5
    (specialized_generators.py:22-64); the boundary-hardening cohort
    lowers it to reach the Mardling–Aarseth stability edge
    (a_outer/a_inner ~ 2.8 for coplanar prograde triples)."""
    r1 = jnp.asarray(mass_ratio1, dtype)
    r2 = jnp.asarray(mass_ratio2, dtype)
    sep = jnp.asarray(separation_ratio, dtype)
    B = r1.shape[0]
    Gb = jnp.broadcast_to(jnp.asarray(G, dtype), (B,))

    m1 = jnp.ones((B,), dtype)
    m2, m3 = r1, r2
    m12 = m1 + m2
    a_outer = jnp.maximum(sep, min_separation)

    x1 = -m2 / m12
    x2 = m1 / m12
    v_inner = jnp.sqrt(Gb * m12)
    vy1 = -m2 * v_inner / m12
    vy2 = m1 * v_inner / m12
    v_outer = jnp.sqrt(Gb * (m12 + m3) / a_outer)

    zeros = jnp.zeros((B,), dtype)
    mass = jnp.stack([m1, m2, m3], axis=1)
    pos = jnp.stack([jnp.stack([x1, zeros], 1), jnp.stack([x2, zeros], 1),
                     jnp.stack([a_outer, zeros], 1)], axis=1)
    vel = jnp.stack([jnp.stack([zeros, vy1], 1), jnp.stack([zeros, vy2], 1),
                     jnp.stack([zeros, v_outer], 1)], axis=1)

    pad = n_slots - 3
    if inclination is not None:
        # d = 3: inner binary stays in the xy-plane; the outer orbit is
        # inclined by rotating its velocity about the x-axis (its
        # position (a_outer, 0, 0) lies on the rotation axis).  High
        # mutual inclinations give genuinely three-dimensional secular
        # dynamics (Kozai-Lidov cycles) the 2-D reference cannot
        # express — the BASELINE north star's (batch, N, 3) axis.
        inc = jnp.asarray(inclination, dtype)
        z3 = jnp.zeros((B, 3, 1), dtype)
        pos = jnp.concatenate([pos, z3], axis=-1)
        vy = vel[..., 1]
        vz_out = jnp.stack([zeros, zeros, v_outer * jnp.sin(inc)], 1)
        vy_new = vy * jnp.stack([jnp.ones_like(inc), jnp.ones_like(inc),
                                 jnp.cos(inc)], 1)
        vel = jnp.stack([vel[..., 0], vy_new, vz_out], axis=-1)
    if pad > 0:
        mass = jnp.pad(mass, ((0, 0), (0, pad)))
        pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)))
        vel = jnp.pad(vel, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.arange(n_slots)[None, :] < 3
    mask = jnp.broadcast_to(mask, (B, n_slots))
    vel = jax.vmap(com_momentum_projection)(mass, vel, mask)
    pos = jax.vmap(com_recenter)(mass, pos, mask)
    return mass, pos, vel, mask


@partial(jax.jit, static_argnames=("n_slots", "dtype"))
def polygon_batch(n_bodies, radius, rotation_fraction, *, G=1.0,
                  n_slots: int = 8, dtype=jnp.float64, tilt=None):
    """(B,) parameter arrays -> (mass, pos, vel, mask) for rotating
    equal-mass polygons with per-system body counts (masked slots).

    ``tilt`` (a (B,) angle array) embeds the ring in d = 3, rotated
    about the x-axis — the dynamics is the planar ring's (an isolated
    system is rotation-covariant) but the dataset's coordinate columns
    exercise the full 3-D schema."""
    n = jnp.asarray(n_bodies, jnp.int32)
    R = jnp.asarray(radius, dtype)
    rot = jnp.asarray(rotation_fraction, dtype)
    B = n.shape[0]
    Gb = jnp.broadcast_to(jnp.asarray(G, dtype), (B,))

    k = jnp.arange(n_slots, dtype=dtype)[None, :]
    nf = n.astype(dtype)[:, None]
    mask = jnp.arange(n_slots)[None, :] < n[:, None]
    theta = 2.0 * jnp.pi * k / jnp.maximum(nf, 1.0)

    mass = jnp.where(mask, jnp.ones((), dtype), 0.0)
    pos = jnp.stack([R[:, None] * jnp.cos(theta),
                     R[:, None] * jnp.sin(theta)], axis=-1)
    v_scale = jnp.sqrt(Gb * nf[:, 0] / R) * rot
    vel = jnp.stack([-v_scale[:, None] * jnp.sin(theta),
                     v_scale[:, None] * jnp.cos(theta)], axis=-1)
    if tilt is not None:
        t = jnp.asarray(tilt, dtype)[:, None]
        ct, st = jnp.cos(t), jnp.sin(t)

        def rot_x(arr):
            x, y = arr[..., 0], arr[..., 1]
            return jnp.stack([x, y * ct, y * st], axis=-1)

        pos = rot_x(pos)
        vel = rot_x(vel)
    pos = jnp.where(mask[..., None], pos, 0.0)
    vel = jnp.where(mask[..., None], vel, 0.0)
    vel = jax.vmap(com_momentum_projection)(mass, vel, mask)
    return mass, pos, vel, mask


# ----------------------------------------------------------------------
# reference-shaped per-system surface
# ----------------------------------------------------------------------

class SpecializedGenerators:
    @staticmethod
    def generate_hierarchical_triple(
        mass_ratio1: float = 1.0,
        mass_ratio2: float = 0.5,
        separation_ratio: float = 10.0,
        G: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        m, q, v, _ = hierarchical_triple_batch(
            jnp.asarray([mass_ratio1]), jnp.asarray([mass_ratio2]),
            jnp.asarray([separation_ratio]), G=G, n_slots=3)
        return np.asarray(m[0]), np.asarray(q[0]), np.asarray(v[0])

    @staticmethod
    def generate_equal_mass_polygon(
        n_bodies: int,
        radius: float = 1.0,
        rotation_fraction: float = 0.5,
        G: float = 1.0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        m, q, v, _ = polygon_batch(
            jnp.asarray([n_bodies]), jnp.asarray([radius]),
            jnp.asarray([rotation_fraction]), G=G, n_slots=int(n_bodies))
        return np.asarray(m[0]), np.asarray(q[0]), np.asarray(v[0])
