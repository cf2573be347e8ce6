"""Standalone fused (eps*, d eps*/dq) kernel for the ham_soft XLA
scan path.

The non-fused macro scan (integrators/step.py: the fallback every
configuration the full multi-step kernel doesn't cover lands on)
spends most of its per-substep HBM traffic inside
``ops.eps_model.eps_star_and_grad``: value_and_grad through the
8-iteration truncated SPH solve materialises ~100 (B, N, N)-sized
intermediates per call (forward iterates + reverse-sweep residuals +
the reference-fallback machinery).  This kernel evaluates the whole
thing VMEM-resident per batch tile — reads (pos, mass, mask, h0,
alpha, eps bounds), writes (eps*, grad) — reusing the exact in-kernel
closures of the fused integrator (``pallas_hamsoft._build_physics``),
so the two cannot drift apart.

Semantics contract: bit-for-bit the same MATH as
``eps_model.eps_star_and_grad(q, m, h0=..., alpha=..., eps_min=...,
eps_max=..., eta=..., clamp=..., mask=..., lam_align=...,
use_fallback=...)`` including

* the truncated-map AD gradient (reverse sweep through all 8
  iterations with the clip gating, ops/eps_model.py:176-203),
* the soft-policy value clamp and its gradient gate
  (eps_target_production's ``clamp``, ops/eps_model.py:233-235),
* the "reference" degeneracy fallback: Omega-corrected SPH gradient
  sign-aligned against the legacy gradient, selected where the exact
  gradient's max row norm degenerates (ops/eps_model.py:308-358),

with the documented fused-kernel deviation that the h_i convergence
freeze is dropped (all 8 iterations always run; perturbation below
float32 resolution — pallas_hamsoft.py module docstring).

Reference counterpart: minbody/hamsoft_eps_model.py:94-234 (the
central-difference + fallback gradient), whose 2*N*d eps* evaluations
per sub-flow are the reference's dominant ham_soft cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_hamsoft import _build_physics, _fold, _SUB


def _eps_grad_kernel(pos_ref, mass_ref, h0_ref, alpha_ref, emin_ref,
                     emax_ref, out_es_ref, out_grad_ref, *, n: int,
                     dim: int, eta: float, clamp: bool,
                     use_fallback: bool, lam_align: float):
    nd = n * dim
    pos = [pos_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    mass = [mass_ref[i * _SUB:(i + 1) * _SUB, :] for i in range(n)]
    # masked slots carry mass 0 at the call boundary (see
    # eps_star_and_grad_fused), so validity folds into the mass test
    valid = [m > 0.0 for m in mass]
    inv_m = [jnp.where(v, 1.0 / jnp.maximum(m, 1e-30), 0.0)
             for m, v in zip(mass, valid)]
    h0 = h0_ref[...]
    alpha = alpha_ref[...]
    emin = emin_ref[...]
    emax = emax_ref[...]

    # bound resolution exactly as eps_target_production
    # (ops/eps_model.py:227-232)
    a = jnp.minimum(emin, emax)
    b = jnp.maximum(emin, emax)
    flo = jnp.maximum(a, 1e-12)
    cap = jnp.maximum(flo, b)

    one = jnp.ones_like(h0)
    ops = _build_physics(
        n, dim, mass, valid, inv_m, one, one, alpha, flo, cap, h0,
        G=1.0, k_wall=0.0, eta=eta, jcap=0.02, bexp=5, policy="soft",
        grad_mode=("reference" if use_fallback else "exact"),
        lam_align=lam_align, clamp_bounds=((a, b) if clamp else None))

    es, g_q = ops.eps_star_and_grad(pos)
    out_es_ref[...] = es
    for k in range(nd):
        out_grad_ref[k * _SUB:(k + 1) * _SUB, :] = g_q[k]


def eps_star_and_grad_fused(q, m, h0, alpha, eps_min, eps_max, mask, *,
                            eta: float = 1.35, clamp: bool = False,
                            use_fallback: bool = True,
                            lam_align: float = 0.3, lanes: int = 0,
                            interpret: bool = False):
    """Batched (eps*, grad) on a (B, N, d) float32 population.

    Per-system arrays: h0 (the SPH seed — the XLA path passes
    state.eps), alpha, eps_min, eps_max, all (B,); mask (B, N) bool.
    B must be a multiple of 8; lanes (0 = auto) must divide B // 8.
    Returns (es (B,), grad (B, N, d)).
    """
    B, n, dim = q.shape
    nd = n * dim
    f32 = jnp.float32
    L = B // _SUB
    if lanes <= 0:
        lanes = 512
        while lanes > 1 and L % lanes:
            lanes //= 2

    def run():
        maskf = mask.astype(f32)
        m_eff = jnp.asarray(m, f32) * maskf  # invalid slots -> mass 0
        pos_c = jnp.concatenate(
            [_fold(jnp.asarray(q[:, i, a_], f32))
             for i in range(n) for a_ in range(dim)], 0)
        mass_c = jnp.concatenate([_fold(m_eff[:, i]) for i in range(n)], 0)
        scalars = [jnp.asarray(x, f32) * jnp.ones((B,), f32)
                   for x in (h0, alpha, eps_min, eps_max)]
        folded = [_fold(s) for s in scalars]

        kernel = functools.partial(
            _eps_grad_kernel, n=n, dim=dim, eta=float(eta),
            clamp=bool(clamp), use_fallback=bool(use_fallback),
            lam_align=float(lam_align))
        grid = (L // lanes,)
        bs = lambda rows: pl.BlockSpec((rows, lanes), lambda i: (0, i))
        es_blk, grad_blk = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(nd * _SUB), bs(n * _SUB)] + [bs(_SUB)] * 4,
            out_specs=(bs(_SUB), bs(nd * _SUB)),
            out_shape=(jax.ShapeDtypeStruct((_SUB, L), f32),
                       jax.ShapeDtypeStruct((nd * _SUB, L), f32)),
            interpret=interpret,
        )(pos_c, mass_c, *folded)

        coords = [grad_blk[k * _SUB:(k + 1) * _SUB, :].reshape(B)
                  for k in range(nd)]
        grad = jnp.stack(coords, axis=1).reshape(B, n, dim)
        # the XLA path multiplies the final gradient by the mask
        # (eps_model.py:330-331); in-kernel validity already zeroes
        # invalid rows, but keep the boundary explicit
        grad = grad * maskf[:, :, None]
        return es_blk.reshape(B), grad

    if interpret:
        return run()
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        return run()
