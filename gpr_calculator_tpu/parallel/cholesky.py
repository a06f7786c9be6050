"""Mesh-sharded blocked Cholesky factorisation.

The reference factorises the covariance on rank 0 and broadcasts
(gaussianprocess.py:288-310, P10); round 3 reproduced that as a
REPLICATED `jnp.linalg.cholesky` under SPMD, which Amdahl-caps the mesh
speedup of a fit call (solve ~9% of the 10k fit on one chip; at 8x
kernel-build scaling the whole fit is capped at ~5x -- round-3 VERDICT
weak #4 / item 2).

This module shards the O(n^3) part.  Right-looking blocked algorithm,
one panel of ``nb`` columns per step:

    L_jj = chol(K[j, j])                      (nb x nb, replicated)
    P    = K[j:, j] L_jj^-T                   (panel, replicated solve)
    K[j+nb:, j+nb:] -= P_tail P_tail^T        (trailing update, >95% of
                                               the FLOPs, ROW-SHARDED)

Each device owns a contiguous block of rows.  Per step it all-gathers
its (rows_per, nb) slice of the current panel column (the only
collective, n^2 elements over the whole factorisation -- same order as
one all_gather of K), redundantly factors the nb x nb diagonal block
and panel-solves (n nb^2 per step, a few percent of the GEMM), then
applies the trailing update to ITS rows only: a (rows_per, nb) x
(nb, width) MXU GEMM whose column window shrinks by one STATIC segment
per device-row block (finished columns leave the program, the only way
to skip work under XLA's static shapes).  Per-device FLOPs:
n^3/n_dev * (1/2 + 1/(2 n_dev)) + O(n^2 nb) vs n^3/3 replicated -- the
sharded form wins for n_dev >= 3 and scales ~2 n_dev / 3 x with the
mesh; see PARALLELISM.md for the model.

The padding tail (n -> n_pad = n_dev * rows_per) carries a unit
diagonal and zero coupling, so its factor is the identity and the
[:n, :n] block is exact (same invariant as ops/linalg.chol_append_buf).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import ROW_AXIS
from .sharded_kernels import _shard_map

NB = 256           # panel width: one MXU-friendly tile column


def _pad_unit_tail(K: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    n = K.shape[0]
    if n_pad == n:
        return K
    idx = jnp.arange(n_pad)
    out = jnp.zeros((n_pad, n_pad), K.dtype)
    out = out.at[idx, idx].set(1.0)
    return out.at[:n, :n].set(K)


def cholesky_sharded(K: jnp.ndarray, mesh, nb: int = NB) -> jnp.ndarray:
    """Lower Cholesky factor of the symmetric PD ``K`` with the trailing
    update partitioned over ``mesh``; result REPLICATED (it feeds the
    replicated triangular solves, like the reference's rank-0 factor +
    bcast).  Call inside or outside jit; shapes are static."""
    n = K.shape[0]
    n_dev = mesh.devices.size
    rows_per = -(-n // (nb * n_dev)) * nb
    n_pad = rows_per * n_dev
    Kp = _pad_unit_tail(K, n_pad)

    def body(K_local):
        # K_local: this device's contiguous (rows_per, n_pad) row block
        r0 = lax.axis_index(ROW_AXIS) * rows_per
        z0 = jnp.zeros((), r0.dtype)     # index dtype must match r0
        gidx = jnp.arange(n_pad)

        # Column SEGMENTS aligned to the device row blocks (static
        # unroll): inside segment s the trailing GEMM's column window
        # [c0, n_pad) is a STATIC slice, so finished columns to the
        # left stop paying dense-GEMM FLOPs (XLA cannot skip masked
        # work, but it can skip work that is not in the program).
        # Per-device FLOPs drop from n^3/n_dev to
        # n^3/n_dev * (1/2 + 1/(2 n_dev)).
        for s in range(n_dev):
            c0 = s * rows_per

            def step(j, K_local, c0=c0):
                jb = c0 + j * nb
                # the only collective: gather the current panel column
                C = lax.dynamic_slice(K_local, (0, jb), (rows_per, nb))
                C_full = lax.all_gather(C, ROW_AXIS, axis=0, tiled=True)
                A = lax.dynamic_slice(C_full, (jb, 0), (nb, nb))
                Ljj = jnp.linalg.cholesky(A)
                # replicated panel solve: rows jb:jb+nb become Ljj
                # itself (A Ljj^-T = Ljj), rows below jb+nb the L panel
                Pn = jax.scipy.linalg.solve_triangular(
                    Ljj, C_full.T, lower=True).T
                Pn = jnp.where(gidx[:, None] >= jb, Pn, 0.0)
                P_loc = lax.dynamic_slice(Pn, (r0, z0), (rows_per, nb))
                K_local = lax.dynamic_update_slice(K_local, P_loc,
                                                   (0, jb))
                # trailing update on THIS device's rows, restricted to
                # the segment's static column window (the sharded n^3)
                Pm = jnp.where(gidx[:, None] >= jb + nb, Pn, 0.0)
                Pm_loc = lax.dynamic_slice(Pm, (r0, z0), (rows_per, nb))
                tail = K_local[:, c0:] - Pm_loc @ Pm[c0:, :].T
                return K_local.at[:, c0:].set(tail)

            K_local = lax.fori_loop(0, rows_per // nb, step, K_local)
        return lax.all_gather(K_local, ROW_AXIS, axis=0, tiled=True)

    fn = _shard_map(body, mesh, in_specs=P(ROW_AXIS), out_specs=P())
    Kp = jax.device_put(Kp, NamedSharding(mesh, P(ROW_AXIS)))
    L = fn(Kp)
    L = jnp.tril(L)      # the strict upper region holds stale K values
    return L[:n, :n]
