r"""Incremental (block rank-update) Cholesky factorisation.

The reference re-factorises the full (N_E + 3 N_F)^2 covariance from
scratch on every fit (gaussianprocess.py:297, O(n^3)).  When training data
is appended and the hyperparameters are unchanged, the factor can be
extended in O(n^2 k):

    K_new = [[K,   B ],        L_new = [[L,   0 ],
             [B^T, C ]]                 [S^T, L_c]]

    S   = L^{-1} B                   (triangular solve, n x k)
    L_c = chol(C - S^T S)            (k x k)

Used by GP.fit(opt=False) fast paths and exposed for workload drivers
(BASELINE.md: "incremental Cholesky" / rank-update refactorisation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def chol_append(L: jnp.ndarray, B: jnp.ndarray,
                C: jnp.ndarray) -> jnp.ndarray:
    """Extend the lower Cholesky factor L of K to the factor of
    [[K, B], [B^T, C]].

    Args:
        L: (n, n) lower factor of K
        B: (n, k) cross covariance
        C: (k, k) new self block (noise already added)
    Returns:
        the full (n+k, n+k) lower factor.
    """
    n = L.shape[0]
    k = C.shape[0]
    S = jax.scipy.linalg.solve_triangular(L, B, lower=True)     # (n, k)
    Lc = jnp.linalg.cholesky(C - S.T @ S)
    top = jnp.concatenate([L, jnp.zeros((n, k), L.dtype)], axis=1)
    bot = jnp.concatenate([S.T, Lc], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@jax.jit
def chol_solve_lower(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.linalg.cho_solve((L, True), y)
