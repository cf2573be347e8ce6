"""Fused multi-step batched integrator kernel.

The headline workload (BASELINE config #1: 1e4+ few-body systems,
1e3+ steps) is bandwidth/latency-bound under an XLA scan: every step
round-trips the state through HBM.  This kernel keeps a tile of the
batch resident in VMEM and advances it T steps in-register.

Layout: the batch axis is folded to a full (8, B/8) VPU tile per
coordinate — each per-coordinate operand is an (8, L) block (L = B/8
lanes), so every vector op uses all 8 sublanes x 128 lanes.  Body and
coordinate axes (tiny for few-body) are unrolled Python loops over
whole blocks.

Few-body only by construction (N*d blocks must fit VMEM); the large-N
regime uses ``ops/pallas_kernels``.  Mosaic toolchain rules (see
ops/pallas_kernels.py): rank-2 everything, int32 indices, trace under
x64-disabled scope, float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


_SUB = 8  # VPU sublanes


#: symplectic composition stages as (drift_coef, kick_coef) pairs, in
#: units of h, for the fused kick-drift loop body (see
#: _composition_multistep_kernel).  Yoshida's 4th-order triple jump
#: (yoshida4_scheme.py:18-25): w1 = 1/(2 - 2^{1/3}), w2 = -2^{1/3} w1;
#: V(w1 h) V(w2 h) V(w1 h) in kick-drift-kick form, with the adjacent
#: half-kicks inside the step AND across consecutive steps fused.
_W1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
_W2 = -(2.0 ** (1.0 / 3.0)) * _W1
_SCHEME_STAGES = {
    "verlet": ((1.0, 1.0),),
    "yoshida4": ((_W1, 0.5 * (_W1 + _W2)),
                 (_W2, 0.5 * (_W1 + _W2)),
                 (_W1, _W1)),
}


def _composition_multistep_kernel(pos_ref, vel_ref, mass_ref, eps2_ref,
                                  out_pos_ref, out_vel_ref, *, n: int,
                                  dim: int, n_steps: int, h: float, G: float,
                                  stages, unroll: int = 1):
    nd = n * dim
    # per-coordinate (8, L) blocks
    pos = [pos_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    vel = [vel_ref[k * _SUB:(k + 1) * _SUB, :] for k in range(nd)]
    eps2 = eps2_ref[...]

    # stage coefficients in time units (d0 is also the prologue /
    # epilogue half-kick size: the loop keeps v at the d0/2 half-step)
    dh = [np.float32(d * h) for d, _ in stages]
    kh = [np.float32(k * h) for _, k in stages]
    k_half = np.float32(0.5 * stages[0][0] * h)
    # G folded into the masses: one fewer multiply per pair
    gmass = [np.float32(G) * mass_ref[i * _SUB:(i + 1) * _SUB, :]
             for i in range(n)]

    def accel(pos):
        acc = [jnp.zeros_like(pos[0]) for _ in range(nd)]
        for i in range(n):
            for j in range(i + 1, n):
                r2 = eps2
                dxs = []
                for a in range(dim):
                    dx = pos[i * dim + a] - pos[j * dim + a]
                    dxs.append(dx)
                    r2 = r2 + dx * dx
                inv_r = jax.lax.rsqrt(r2)
                w = inv_r * inv_r * inv_r
                wi = gmass[j] * w
                wj = gmass[i] * w
                for a in range(dim):
                    acc[i * dim + a] = acc[i * dim + a] - wi * dxs[a]
                    acc[j * dim + a] = acc[j * dim + a] + wj * dxs[a]
        return acc

    # kick-drift form: the two adjacent half-kicks of consecutive
    # stages (and of consecutive steps) fuse into one full kick (v
    # lives at the first stage's half-step inside the loop; half-kicks
    # only at the two ends) — same trajectory as the kick-drift-kick
    # composition, one fewer kick per stage
    def one(pos, velh, acc):
        for s in range(len(stages)):
            pos = [p + dh[s] * v for p, v in zip(pos, velh)]
            acc = accel(pos)
            velh = [v + kh[s] * a for v, a in zip(velh, acc)]
        return pos, velh, acc

    def body(_, carry):
        pos = list(carry[:nd])
        velh = list(carry[nd:2 * nd])
        acc = list(carry[2 * nd:])
        for _u in range(unroll):
            pos, velh, acc = one(pos, velh, acc)
        return tuple(pos) + tuple(velh) + tuple(acc)

    assert n_steps % unroll == 0
    acc0 = accel(pos)
    velh = [v + k_half * a for v, a in zip(vel, acc0)]
    out = jax.lax.fori_loop(np.int32(0), np.int32(n_steps // unroll), body,
                            tuple(pos) + tuple(velh) + tuple(acc0))
    for k in range(nd):
        out_pos_ref[k * _SUB:(k + 1) * _SUB, :] = out[k]
        # close the trailing half-step: v_T = v_{T+1/2} - (d0 h/2) a_T
        out_vel_ref[k * _SUB:(k + 1) * _SUB, :] = (
            out[nd + k] - k_half * out[2 * nd + k])


def _fold(x):  # (B,) -> (8, B/8)
    B = x.shape[0]
    return x.reshape(_SUB, B // _SUB)


def composition_multistep(pos, vel, mass, eps2, *, h: float, G: float,
                          n_steps: int, lanes: int = 512, unroll: int = 1,
                          scheme: str = "verlet", interpret: bool = False):
    """Advance a (B, N, d) float32 batch n_steps composition-scheme
    steps (verlet / yoshida4) entirely in VMEM.  eps2: (B,) squared
    softening per system.  B must be a multiple of 8 * lanes.
    Returns (pos, vel)."""
    B, n, dim = pos.shape
    nd = n * dim
    stages = _SCHEME_STAGES[scheme]

    def run():
        # (B, N, d) -> per-coordinate (8, B/8) blocks stacked on sublanes
        pos_c = jnp.concatenate(
            [_fold(pos[:, i, a]) for i in range(n) for a in range(dim)], 0)
        vel_c = jnp.concatenate(
            [_fold(vel[:, i, a]) for i in range(n) for a in range(dim)], 0)
        mass_c = jnp.concatenate([_fold(mass[:, i]) for i in range(n)], 0)
        eps2_c = _fold(eps2)

        kernel = functools.partial(_composition_multistep_kernel, n=n,
                                   dim=dim, n_steps=n_steps, h=h, G=G,
                                   stages=stages, unroll=unroll)
        L = B // _SUB
        grid = (L // lanes,)
        bs = lambda rows: pl.BlockSpec((rows, lanes), lambda i: (0, i))
        out_pos, out_vel = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(nd * _SUB), bs(nd * _SUB), bs(n * _SUB), bs(_SUB)],
            out_specs=(bs(nd * _SUB), bs(nd * _SUB)),
            out_shape=(jax.ShapeDtypeStruct((nd * _SUB, L), pos.dtype),
                       jax.ShapeDtypeStruct((nd * _SUB, L), pos.dtype)),
            interpret=interpret,
        )(pos_c, vel_c, mass_c, eps2_c)

        def unfold(block):  # (nd*8, L) -> (B, n, d)
            coords = [block[k * _SUB:(k + 1) * _SUB, :].reshape(B)
                      for k in range(nd)]
            return jnp.stack(coords, axis=1).reshape(B, n, dim)

        return unfold(out_pos), unfold(out_vel)

    if interpret:
        return run()
    from jax._src.config import enable_x64 as _x64_scope

    with _x64_scope(False):
        return run()


def verlet_multistep(pos, vel, mass, eps2, *, h, G, n_steps, lanes=512,
                     unroll=1, interpret=False):
    return composition_multistep(pos, vel, mass, eps2, h=h, G=G,
                                 n_steps=n_steps, lanes=lanes, unroll=unroll,
                                 scheme="verlet", interpret=interpret)


def yoshida4_multistep(pos, vel, mass, eps2, *, h, G, n_steps, lanes=512,
                       unroll=1, interpret=False):
    return composition_multistep(pos, vel, mass, eps2, h=h, G=G,
                                 n_steps=n_steps, lanes=lanes, unroll=unroll,
                                 scheme="yoshida4", interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("h", "G", "n_steps", "lanes", "unroll"))
def verlet_multistep_jit(pos, vel, mass, eps2, h, G, n_steps, lanes=512,
                        unroll=1):
    return verlet_multistep(pos, vel, mass, eps2, h=h, G=G,
                            n_steps=n_steps, lanes=lanes, unroll=unroll)


@functools.partial(jax.jit,
                   static_argnames=("h", "G", "n_steps", "lanes", "unroll"))
def yoshida4_multistep_jit(pos, vel, mass, eps2, h, G, n_steps, lanes=512,
                           unroll=1):
    return yoshida4_multistep(pos, vel, mass, eps2, h=h, G=G,
                              n_steps=n_steps, lanes=lanes, unroll=unroll)
