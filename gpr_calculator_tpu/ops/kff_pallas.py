r"""Fused Pallas TPU kernel for the force-force covariance block.

The XLA path (ops/kernels.py kff) materialises the env-pair tensors
(M, P1, P2, env) in HBM before the (env -> point) block reduction; at
10k-row scale those temporaries are GBs per chunk and the op becomes
HBM-bound (measured: precision-independent ~8 s per 10k x 10k build).
This kernel keeps everything in VMEM; HBM sees each input once and the
nine (m1, m2) cartesian outputs once.

Grid: (lhs point tiles, rhs point tiles, rhs env sub-tiles).  Per cell:

    c      = u1 u2^T                       (T1, S) env dots
    A(c), B(c)                             per-pair coefficients (VPU)
    for u, v in 3x3 (unrolled):
        M_uv = J1_u J2_v^T ; P1_u = J1_u u2^T ; P2_v = u1 J2_v^T
        env  = A (M_uv - P1_u Q2_v + c Q1_u Q2_v - Q1_u P2_v)
             + B (P1_u - c Q1_u)(P2_v - c Q2_v)
        out_uv += S1 env S2_s^T            (one-hot point reductions, MXU)

The nine output blocks are revisited across the s (fastest) grid dim and
accumulated in VMEM; S2_s encodes the env->point map of sub-tile s.

Mathematical spec: rbf_kff_many (gpr_calc/kernels/rbf_kernel.cpp:342-473)
== ops/kernels.py kff.  Validity (padding env, |x| < eps) is encoded as
rinv == 0, which zeroes A and B for that pair.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import ForceData

TP1 = 8          # lhs points per tile
TP2 = 128        # rhs points per tile
SUB_ENVS = 512   # rhs env sub-tile width (VMEM budget)


def _kff_kernel(sig2_ref, inv2l2_ref,
                u1_ref, j1_ref, q1_ref, e1_ref, r1_ref,
                u2t_ref, j2t_ref, q2_ref, e2_ref, r2_ref,
                map1_ref, map2_ref,
                *out_refs, zeta: int):
    f32 = jnp.float32
    sigma2 = sig2_ref[0, 0]
    inv2l2 = inv2l2_ref[0, 0]
    s = pl.program_id(2)

    u1 = u1_ref[:]                          # (T1, d)
    S1 = map1_ref[:]                        # (TP1, T1)
    S2 = map2_ref[0]                        # (TP2, sub)

    u2t = u2t_ref[:]                        # (d, sub)
    c = jnp.dot(u1, u2t, preferred_element_type=f32)   # (T1, sub)

    if zeta == 2:
        d1 = c
        dm2 = jnp.ones_like(c)
    else:
        dm2 = c
        for _ in range(zeta - 3):
            dm2 = dm2 * c
        d1 = dm2 * c
    D = d1 * c
    k = sigma2 * jnp.exp(-(np.float32(1.0) - D) * inv2l2)
    dk_dD = k * inv2l2
    rr = r1_ref[:] * r2_ref[:]              # (T1,1)*(1,sub)
    same = jnp.where(e1_ref[:] == e2_ref[:],
                     np.float32(1.0), np.float32(0.0))
    A = dk_dD * (zeta * d1) * rr * same
    Bc = (dk_dD * (zeta * (zeta - 1) * dm2
                   + (zeta * d1) * (zeta * d1) * inv2l2) * rr * same)

    first = s == 0
    for u in range(3):
        j1u = j1_ref[u]                     # (T1, d)
        p1u = jnp.dot(j1u, u2t, preferred_element_type=f32)
        q1u = q1_ref[u]                     # (T1, 1)
        l1u = p1u - c * q1u
        for v in range(3):
            j2v = j2t_ref[v]                # (d, sub)
            muv = jnp.dot(j1u, j2v, preferred_element_type=f32)
            p2v = jnp.dot(u1, j2v, preferred_element_type=f32)
            q2v = q2_ref[v]                 # (1, sub)
            env = (A * (muv - p1u * q2v + c * q1u * q2v - q1u * p2v)
                   + Bc * l1u * (p2v - c * q2v))
            blk = jnp.dot(
                jnp.dot(S1, env, preferred_element_type=f32), S2.T,
                preferred_element_type=f32)            # (TP1, TP2)
            ref = out_refs[u * 3 + v]

            @pl.when(first)
            def _(ref=ref, blk=blk):
                ref[:] = blk

            @pl.when(jnp.logical_not(first))
            def _(ref=ref, blk=blk):
                ref[:] = ref[:] + blk


def _pad_points(f: ForceData, multiple: int) -> ForceData:
    m = f.x.shape[0]
    m_new = ((m + multiple - 1) // multiple) * multiple
    if m_new == m:
        return f
    pad = m_new - m
    return ForceData(
        x=jnp.pad(f.x, ((0, pad), (0, 0), (0, 0))),
        dxdr=jnp.pad(f.dxdr, ((0, pad), (0, 0), (0, 0), (0, 0))),
        ele=jnp.pad(f.ele, ((0, pad), (0, 0))),
        nreal=f.nreal)


@functools.partial(jax.jit, static_argnames=("zeta", "interpret"))
def kff_pallas(f1: ForceData, f2: ForceData, params, zeta: int = 2,
               interpret: bool = False) -> jnp.ndarray:
    """RBF force-force block via the fused Pallas kernel, (3 m1, 3 m2).

    f1.dxdr must have 3 cartesian columns (the stress path stays on the
    XLA implementation)."""
    f32 = jnp.float32
    m1_in, m2_in = f1.x.shape[0], f2.x.shape[0]
    assert f1.dxdr.shape[3] == 3 and f2.dxdr.shape[3] == 3
    f1 = _pad_points(f1, TP1)
    f2 = _pad_points(f2, TP2)
    m1, B1, d = f1.x.shape
    m2, B2, _ = f2.x.shape

    def prep(f):
        m, B, dd = f.x.shape
        x = f.x.reshape(m * B, dd).astype(f32)
        n2 = jnp.sum(x * x, axis=1)
        n = jnp.sqrt(n2)
        valid = (n > 1e-8) & (f.ele.reshape(-1) > 0)
        u = x / jnp.where(valid, n, 1.0)[:, None]
        rinv = jnp.where(valid, 1.0 / jnp.where(valid, n, 1.0), 0.0)
        J = f.dxdr.reshape(m * B, dd, 3).astype(f32)
        Jt = jnp.transpose(J, (2, 0, 1))          # (3, N, d)
        Q = jnp.einsum("und,nd->un", Jt, u)       # (3, N)
        ele = f.ele.reshape(-1).astype(jnp.int32)
        return u, Jt, Q, ele, rinv

    u1, J1t, Q1, ele1, r1 = prep(f1)
    u2, J2t, Q2, ele2, r2 = prep(f2)

    d_pad = ((d + 7) // 8) * 8
    if d_pad != d:
        u1 = jnp.pad(u1, ((0, 0), (0, d_pad - d)))
        u2 = jnp.pad(u2, ((0, 0), (0, d_pad - d)))
        J1t = jnp.pad(J1t, ((0, 0), (0, 0), (0, d_pad - d)))
        J2t = jnp.pad(J2t, ((0, 0), (0, 0), (0, d_pad - d)))

    T1, T2 = TP1 * B1, TP2 * B2
    sub = min(SUB_ENVS, T2)
    while T2 % sub or sub % B2:
        sub -= B2
    nsub = T2 // sub
    sub_pts = sub // B2

    # host-built one-hot env->point reduction maps
    S1 = np.kron(np.eye(TP1, dtype=np.float32),
                 np.ones((1, B1), np.float32))
    # S2h[s, q, b] = 1 if (s*sub + b)//B2 == q
    S2h = np.zeros((nsub, TP2, sub), np.float32)
    for s in range(nsub):
        for b in range(sub):
            S2h[s, (s * sub + b) // B2, b] = 1.0

    # Trace with x64 disabled: under x64 the BlockSpec index maps produce
    # i64 grid indices, which Mosaic cannot legalize.
    with jax.enable_x64(False):
        outs = _call((m1 // TP1, m2 // TP2, nsub), zeta, T1, sub, d_pad,
                     m1, m2, interpret, params, u1, J1t, Q1, ele1, r1,
                     u2, J2t, Q2, ele2, r2,
                     jnp.asarray(S1), jnp.asarray(S2h))
    # nine (m1, m2) planes -> (m1*3, m2*3)
    out = jnp.stack(outs, axis=0).reshape(3, 3, m1, m2)
    out = out.transpose(2, 0, 3, 1).reshape(m1 * 3, m2 * 3)
    return out[:3 * m1_in, :3 * m2_in]


def _call(grid, zeta, T1, sub, d_pad, m1, m2, interpret,
          params, u1, J1t, Q1, ele1, r1, u2, J2t, Q2, ele2, r2, S1, S2h):
    f32 = jnp.float32
    nsub = grid[2]
    return pl.pallas_call(
        functools.partial(_kff_kernel, zeta=zeta),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # lhs tiles (constant across j, s)
            pl.BlockSpec((T1, d_pad), lambda i, j, s: (i, 0)),
            pl.BlockSpec((3, T1, d_pad), lambda i, j, s: (0, i, 0)),
            pl.BlockSpec((3, T1, 1), lambda i, j, s: (0, i, 0)),
            pl.BlockSpec((T1, 1), lambda i, j, s: (i, 0)),
            pl.BlockSpec((T1, 1), lambda i, j, s: (i, 0)),
            # rhs env sub-tiles
            pl.BlockSpec((d_pad, sub),
                         lambda i, j, s, n=nsub: (0, j * n + s)),
            pl.BlockSpec((3, d_pad, sub),
                         lambda i, j, s, n=nsub: (0, 0, j * n + s)),
            pl.BlockSpec((3, 1, sub),
                         lambda i, j, s, n=nsub: (0, 0, j * n + s)),
            pl.BlockSpec((1, sub), lambda i, j, s, n=nsub: (0, j * n + s)),
            pl.BlockSpec((1, sub), lambda i, j, s, n=nsub: (0, j * n + s)),
            # reduction maps
            pl.BlockSpec((TP1, T1), lambda i, j, s: (0, 0)),
            pl.BlockSpec((1, TP2, sub), lambda i, j, s: (s, 0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((TP1, TP2), lambda i, j, s: (i, j))
            for _ in range(9)),
        out_shape=tuple(jax.ShapeDtypeStruct((m1, m2), f32)
                        for _ in range(9)),
        interpret=interpret,
    )(
        jnp.asarray(params["sigma"], f32).reshape(1, 1) ** 2,
        (1.0 / (2.0 * jnp.asarray(params["l"], f32) ** 2)).reshape(1, 1),
        u1, J1t, Q1[:, :, None], ele1[:, None], r1[:, None],
        u2.T, jnp.transpose(J2t, (0, 2, 1)), Q2[:, None, :],
        ele2[None, :], r2[None, :],
        S1, S2h,
    )
