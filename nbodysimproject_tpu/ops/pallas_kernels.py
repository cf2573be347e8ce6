"""Pallas TPU kernels for the O(N^2) pairwise hot path at large N.

For few-body systems (N <= ~64, the reference's entire regime) the
dense XLA einsum path in ``ops/forces.py`` is optimal — the batch axis
provides the parallelism. For large N (the Barnes–Hut-scale runs the
reference's results PDF mentions but ships no code for,
SURVEY.md section 5 "long-context"), this module provides an
Aarseth-style i x j tiled force kernel that keeps tiles resident in
VMEM — the flash-attention-like tiling of the pairwise interaction.

Layout: positions are transposed to coordinate planes (d, N) so the
j axis (lanes) is the 128-wide vector axis; each (TI, TJ) interaction
tile is a perfectly-shaped VPU workload. The j-loop is a
``fori_loop`` over VMEM slices of the full coordinate planes (which
fit comfortably: N = 2^17 float32 is 0.5 MB per plane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _force_kernel(n_actual_ref, pos_i_ref, pos_all_ref, mass_all_ref,
                  scalars_ref, out_ref, *, dim: int, ti: int, tj: int,
                  n_pad: int):
    """One i-tile of F_i = -G m_i sum_j m_j (q_i - q_j) / (r^2+eps^2)^1.5.

    The m_i factor is applied by the caller (so the kernel output is
    acceleration * m_i-free accumulation, letting the caller fuse
    F -> a = F/m_i without a second pass).
    """
    # NOTES for this Mosaic toolchain: (a) every intermediate is kept
    # rank-2 — dynamic slices of rank-1 VMEM refs crash the compiler;
    # (b) index arithmetic is pinned to int32 — under jax x64, python
    # ints would promote program_id products to int64, which Mosaic
    # cannot lower (it loops in its convert lowering).
    import numpy as np

    i0 = pl.program_id(0) * np.int32(ti)
    n_actual = n_actual_ref[0]
    eps = scalars_ref[0]   # SMEM float scalars: (eps, G)
    G = scalars_ref[1]

    ii = i0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)

    def body(jt, acc):
        j0 = jt * np.int32(tj)
        xj = pos_all_ref[:, pl.ds(j0, tj)]        # (dim, tj)
        mj = mass_all_ref[:, pl.ds(j0, tj)]       # (1, tj)
        d2 = None
        dxs = []
        for d in range(dim):
            dx = pos_i_ref[d:d + 1, :].T - xj[d:d + 1, :]  # (ti, tj)
            dxs.append(dx)
            d2 = dx * dx if d2 is None else d2 + dx * dx
        r2 = d2 + eps * eps
        jj = j0 + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
        valid = (ii != jj) & (jj < n_actual) & (ii < n_actual) & (r2 > 0.0)
        inv_r = jax.lax.rsqrt(jnp.where(valid, r2, 1.0))
        w = jnp.where(valid, mj * inv_r * inv_r * inv_r, 0.0)
        contribs = [jnp.sum(w * dx, axis=1, keepdims=True) for dx in dxs]
        return acc - jnp.concatenate(contribs, axis=1)  # (ti, dim)

    acc0 = jnp.zeros((ti, dim), out_ref.dtype)
    # int32 loop bounds: under jax x64, python-int bounds would make
    # the induction variable int64 (unlowerable here)
    acc = jax.lax.fori_loop(np.int32(0), np.int32(n_pad // tj), body, acc0)
    out_ref[...] = (G * acc).T


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("ti", "tj", "interpret"))
def pairwise_force_pallas(pos, mass, eps, G, *, ti: int = 256,
                          tj: int = 512, interpret: bool = False):
    """F (N, d) for one large-N system via the tiled Pallas kernel.

    float32 path (the TPU fast path; float64 is x64-emulated and should
    use the XLA kernel).  ``interpret=True`` runs the kernel in
    interpreter mode (CPU tests).

    The kernel is traced under an x64-disabled scope: with global x64
    on, weak python literals trace as f64/i64 constants whose
    (no-op or narrowing) converts this Mosaic toolchain cannot lower.
    """
    if interpret:
        # CPU interpreter handles any dtype; keep full precision for
        # the float64 parity tests
        return _pairwise_force_pallas_impl(pos, mass, eps, G, ti=ti, tj=tj,
                                           interpret=True)

    # Compiled TPU path is float32 (float64 is x64-emulated — use the
    # XLA kernel for that).  The kernel must be traced with x64
    # disabled: even with int32 index arithmetic and strong-typed
    # literals in the body, global x64 leaks x64-promoted converts into
    # the pallas jaxpr that this Mosaic toolchain cannot lower.
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        out = _pairwise_force_pallas_impl(
            pos.astype(jnp.float32), mass.astype(jnp.float32),
            jnp.float32(eps), jnp.float32(G), ti=ti, tj=tj, interpret=False)
    return out.astype(pos.dtype)


def _pairwise_force_pallas_impl(pos, mass, eps, G, *, ti, tj, interpret):
    n, dim = pos.shape
    dtype = pos.dtype
    n_pad = _round_up(max(n, max(ti, tj)), max(ti, tj))

    pos_t = jnp.zeros((dim, n_pad), dtype).at[:, :n].set(pos.T)
    mass_p = jnp.zeros((1, n_pad), dtype).at[0, :n].set(mass)

    kernel = functools.partial(_force_kernel, dim=dim, ti=ti, tj=tj,
                               n_pad=n_pad)
    grid = (n_pad // ti,)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # n_actual
            grid=grid,
            in_specs=[
                pl.BlockSpec((dim, ti), lambda i, *_: (0, i)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((dim, ti), lambda i, *_: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((dim, n_pad), dtype),
        interpret=interpret,
    )(jnp.asarray([n], jnp.int32), pos_t, pos_t, mass_p,
      jnp.asarray([eps, G], dtype))

    acc = out.T[:n]  # (N, d): sum_j G m_j d_ij inv_r3 with sign folded
    return acc * mass[:, None]
