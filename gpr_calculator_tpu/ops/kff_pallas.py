r"""Fused Pallas TPU kernel for the force-force covariance block.

The XLA path (ops/kernels.py kff) materialises the four env-pair tensors
(M, P1, P2 and the combined output) in HBM before the (env -> point) block
reduction; at 10k-row scale those temporaries are GBs per chunk.  This
kernel fuses, per (point-tile x point-tile) grid cell:

    per-pair coefficients  A(c), B(c)      (VPU: pow/exp on the c tile)
    the 3x3 cartesian terms                (unrolled u, v in {0,1,2}):
        M_uv  = J1_u  J2_v^T
        P1_u  = J1_u  u2^T        P2_v = u1 J2_v^T
        env_uv = A * (M_uv - P1_u Q2_v + c Q1_u Q2_v - Q1_u P2_v)
               + B * (P1_u - c Q1_u)(P2_v - c Q2_v)
    block reduction env(T1, T2) -> out(TP1, TP2) as two one-hot matmuls
    (S1 env S2^T), avoiding in-kernel 4D reshapes.

Everything stays in VMEM; HBM sees only the inputs once and the
(3, 3, m1, m2) output.  Mathematical spec: rbf_kff_many
(gpr_calc/kernels/rbf_kernel.cpp:342-473) == ops/kernels.py kff.

Layout notes
------------
* inputs are env-major with envs grouped per point: env pa = p * B + a, so
  a tile of T1 = TP1 * B1 env rows covers exactly TP1 whole points;
* the kernel writes out[u, v, p, q]; the caller transposes to the
  reference row layout (p*3+u, q*3+v) once, outside the kernel;
* validity (padding env, |x| < eps) is encoded as rinv == 0, which zeroes
  A and B for that pair -- the same trick the padded-layout XLA path uses.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import ForceData


def _kff_kernel(s2_ref, inv2l2_ref,                 # SMEM scalars
                u1_ref, j1_ref, q1_ref, e1_ref, r1_ref,
                u2t_ref, j2t_ref, q2_ref, e2_ref, r2_ref,
                s1_ref, s2m_ref,
                out_ref, *, zeta: int):
    f32 = jnp.float32
    sigma2 = s2_ref[0, 0]
    inv2l2 = inv2l2_ref[0, 0]

    u1 = u1_ref[:]                       # (T1, d)
    u2t = u2t_ref[:]                     # (d, T2)
    c = jnp.dot(u1, u2t, preferred_element_type=f32)      # (T1, T2)

    # per-pair coefficients
    if zeta == 2:
        d1 = c
        dm2 = jnp.ones_like(c)
    else:
        dm2 = c
        for _ in range(zeta - 3):
            dm2 = dm2 * c
        d1 = dm2 * c
    D = d1 * c
    k = sigma2 * jnp.exp(-(1.0 - D) * inv2l2)
    dk_dD = k * inv2l2
    rr = r1_ref[:] * r2_ref[:]           # (T1,1)*(1,T2) -> (T1, T2)
    same = (e1_ref[:] == e2_ref[:]).astype(f32)
    A = dk_dD * (zeta * d1) * rr * same
    B = (dk_dD * (zeta * (zeta - 1) * dm2
                  + (zeta * d1) * (zeta * d1) * inv2l2) * rr * same)

    S1 = s1_ref[:]                        # (TP1, T1) one-hot point map
    S2 = s2m_ref[:]                       # (TP2, T2)

    for u in range(3):
        j1u = j1_ref[u]                   # (T1, d)
        p1u = jnp.dot(j1u, u2t, preferred_element_type=f32)   # (T1, T2)
        q1u = q1_ref[u]                   # (T1, 1)
        l1u = p1u - c * q1u
        for v in range(3):
            j2v = j2t_ref[v]              # (d, T2)
            muv = jnp.dot(j1u, j2v, preferred_element_type=f32)
            p2v = jnp.dot(u1, j2v, preferred_element_type=f32)
            q2v = q2_ref[v]               # (1, T2)
            env = (A * (muv - p1u * q2v + c * q1u * q2v - q1u * p2v)
                   + B * l1u * (p2v - c * q2v))
            blk = jnp.dot(jnp.dot(S1, env, preferred_element_type=f32),
                          S2.T, preferred_element_type=f32)
            out_ref[u, v] = blk


def _pick_tile(m: int, B: int, budget_envs: int = 256) -> int:
    """points per tile: a divisor of m with tile envs <= budget."""
    best = 1
    for tp in range(1, m + 1):
        if m % tp == 0 and tp * B <= budget_envs:
            best = tp
    return best


@functools.partial(jax.jit, static_argnames=("zeta", "interpret"))
def kff_pallas(f1: ForceData, f2: ForceData, params, zeta: int = 2,
               interpret: bool = False) -> jnp.ndarray:
    """RBF force-force block via the fused Pallas kernel, (3 m1, 3 m2).

    f1.dxdr must have 3 cartesian columns (the stress path stays on the
    XLA implementation).
    """
    f32 = jnp.float32
    m1, B1, d = f1.x.shape
    m2, B2, _ = f2.x.shape
    assert f1.dxdr.shape[3] == 3 and f2.dxdr.shape[3] == 3

    def prep(f):
        m, B, d = f.x.shape
        x = f.x.reshape(m * B, d).astype(f32)
        n2 = jnp.sum(x * x, axis=1)
        n = jnp.sqrt(n2)
        valid = (n > 1e-8) & (f.ele.reshape(-1) > 0)
        u = x / jnp.where(valid, n, 1.0)[:, None]
        rinv = jnp.where(valid, 1.0 / jnp.where(valid, n, 1.0), 0.0)
        J = f.dxdr.reshape(m * B, d, 3).astype(f32)
        Jt = jnp.transpose(J, (2, 0, 1))          # (3, N, d)
        Q = jnp.einsum("und,nd->un", Jt, u)       # (3, N)
        ele = f.ele.reshape(-1).astype(jnp.int32)
        return u, Jt, Q, ele, rinv

    u1, J1t, Q1, ele1, r1 = prep(f1)
    u2, J2t, Q2, ele2, r2 = prep(f2)

    # pad d to a lane-friendly multiple of 8 (zeros don't change dots)
    d_pad = ((d + 7) // 8) * 8
    if d_pad != d:
        u1 = jnp.pad(u1, ((0, 0), (0, d_pad - d)))
        u2 = jnp.pad(u2, ((0, 0), (0, d_pad - d)))
        J1t = jnp.pad(J1t, ((0, 0), (0, 0), (0, d_pad - d)))
        J2t = jnp.pad(J2t, ((0, 0), (0, 0), (0, d_pad - d)))

    TP1 = _pick_tile(m1, B1)
    TP2 = _pick_tile(m2, B2)
    T1, T2 = TP1 * B1, TP2 * B2
    N1, N2 = m1 * B1, m2 * B2

    # one-hot (point <- env) reduction maps, shared across tiles
    S1 = jnp.kron(jnp.eye(TP1, dtype=f32), jnp.ones((1, B1), f32))
    S2 = jnp.kron(jnp.eye(TP2, dtype=f32), jnp.ones((1, B2), f32))

    u2t = u2.T                                   # (d, N2)
    J2tt = jnp.transpose(J2t, (0, 2, 1))         # (3, d, N2)

    grid = (m1 // TP1, m2 // TP2)
    dt = jnp.float32
    out = pl.pallas_call(
        functools.partial(_kff_kernel, zeta=zeta),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # lhs tiles
            pl.BlockSpec((T1, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((3, T1, d_pad), lambda i, j: (0, i, 0)),
            pl.BlockSpec((3, T1, 1), lambda i, j: (0, i, 0)),
            pl.BlockSpec((T1, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((T1, 1), lambda i, j: (i, 0)),
            # rhs tiles
            pl.BlockSpec((d_pad, T2), lambda i, j: (0, j)),
            pl.BlockSpec((3, d_pad, T2), lambda i, j: (0, 0, j)),
            pl.BlockSpec((3, 1, T2), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, T2), lambda i, j: (0, j)),
            pl.BlockSpec((1, T2), lambda i, j: (0, j)),
            # reduction maps (replicated)
            pl.BlockSpec((TP1, T1), lambda i, j: (0, 0)),
            pl.BlockSpec((TP2, T2), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3, TP1, TP2),
                               lambda i, j: (0, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((3, 3, m1, m2), dt),
        interpret=interpret,
    )(
        jnp.asarray(params["sigma"], f32).reshape(1, 1) ** 2,
        (1.0 / (2.0 * jnp.asarray(params["l"], f32) ** 2)).reshape(1, 1),
        u1, J1t,
        Q1[:, :, None], ele1[:, None].astype(jnp.int32),
        r1[:, None],
        u2t, J2tt, Q2[:, None, :], ele2[None, :], r2[None, :],
        S1, S2,
    )
    # (3, 3, m1, m2) -> (m1*3, m2*3) reference row layout
    return jnp.transpose(out, (2, 0, 3, 1)).reshape(m1 * 3, m2 * 3)
