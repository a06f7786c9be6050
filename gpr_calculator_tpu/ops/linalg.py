r"""Incremental (block rank-update) factorisations.

The reference re-factorises the full (N_E + 3 N_F)^2 covariance from
scratch on every fit (gaussianprocess.py:297, O(n^3)).  When training data
is appended and the hyperparameters are unchanged, the factor can be
extended in O(n^2 k):

    K_new = [[K,   B ],        L_new = [[L,   0 ],
             [B^T, C ]]                 [S^T, L_c]]

    S   = L^{-1} B                   (triangular solve, n x k)
    L_c = chol(C - S^T S)            (k x k)

The production opt=False refit path (GP._try_incremental_fit) keeps ONE
canonical factor -- the lower Cholesky factor in a donated capacity
buffer -- and extends it in place (chol_append_buf): the weights and the
serving variance are both computed by triangular solves against L, which
are backward stable at any conditioning.  (An explicit-inverse Schur
update was tried and REJECTED: it loses ~cond(K) digits in alpha, a
measured 8 meV energy error at GPR conditioning sigma^2/noise^2 ~ 1e9.
Do not rebuild that design.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Blocked wide triangular solves (MXU substitution)
#
# XLA's TriangularSolve lowering on TPU is pathological for WIDE
# right-hand sides at large n: a single cho_solve of (20000, 20000)
# against 2048 columns compiles to a 20.9 GiB-temp program in 160 s,
# and the same solve inside a lax.scan crashes the TPU compile helper
# outright (measured, tools/probe_scan_trace.py) -- which capped the
# analytic NLL's diag/trace pass at ~10k rows.  The routines below
# rebuild the solve as BLOCK substitution: invert the (nb, nb) diagonal
# blocks once per factor, then sweep block rows with one (nb, n) x
# (n, k) matmul per step inside a fori_loop.  Everything is a dense
# MXU contraction with static shapes; temps are O(n k); the loop body
# compiles once.  Cost is 2x the ideal substitution FLOPs (each sweep
# multiplies the full row block, half of which is above/below the
# diagonal and known zero) -- the price of never materialising a
# data-dependent-width slice under jit.
# ---------------------------------------------------------------------------

# block size of the substitution sweeps; 512 keeps the per-step matmul
# MXU-shaped while the diagonal-block inversion stays trivial to compile
_SOLVE_NB = 512


def _pad_factor(L: jnp.ndarray, nb: int):
    """Pad an (n, n) lower factor to a block multiple with a unit-diag
    tail (same invariant as the capacity buffers: padded rows solve to
    exactly zero)."""
    n = L.shape[0]
    n_pad = -(-n // nb) * nb
    if n_pad == n:
        return L, n_pad
    Lp = jnp.zeros((n_pad, n_pad), L.dtype).at[:n, :n].set(L)
    idx = jnp.arange(n, n_pad)
    return Lp.at[idx, idx].set(1.0), n_pad


def blocked_dinv(L: jnp.ndarray, nb: int = _SOLVE_NB) -> jnp.ndarray:
    """(n_blk, nb, nb) inverses of the diagonal blocks of a lower
    factor, the precompute shared by every `blocked_cho_solve` against
    the same L (one small vmapped solve; n_blk * nb^2 storage)."""
    Lp, n_pad = _pad_factor(L, nb)
    n_blk = n_pad // nb
    blocks = Lp.reshape(n_blk, nb, n_blk, nb)
    diag = blocks[jnp.arange(n_blk), :, jnp.arange(n_blk), :]
    eye = jnp.eye(nb, dtype=L.dtype)
    return jax.vmap(lambda d: jax.scipy.linalg.solve_triangular(
        d, eye, lower=True))(diag)


def blocked_cho_solve(L: jnp.ndarray, B: jnp.ndarray,
                      dinv: jnp.ndarray | None = None,
                      nb: int = _SOLVE_NB,
                      start_row=0) -> jnp.ndarray:
    """K^-1 B for K = L L^T by blocked forward + backward substitution.

    Replaces jax.scipy.linalg.cho_solve for WIDE right-hand sides at
    large n, where XLA's TriangularSolve lowering explodes (see module
    comment).  Exact (no iteration): each block row is solved with the
    precomputed diagonal-block inverse after subtracting the already-
    solved region via one full-width matmul; not-yet-solved rows are
    still zero, and the factor's triangularity zeroes their weights, so
    the sweep needs no masking.

    ``start_row`` (may be a traced scalar) restricts BOTH sweeps to
    block rows >= start_row // nb: rows above it come back ZERO, not
    their true values.  This is exact for the forward half when B's
    rows above start_row are zero (L^-1 is lower triangular), and is
    how the NLL trace scan halves its work -- by K^-1's symmetry it
    only needs the lower-triangular part of each column block, so the
    backward sweep stops once it has filled the rows at and below the
    diagonal (the caller double-weights the strictly-lower entries).

    Args:
        L:         (n, n) lower Cholesky factor
        B:         (n, k) right-hand sides
        dinv:      optional blocked_dinv(L, nb) to amortise across calls
        nb:        substitution block size
        start_row: first row of interest (traced ok); rows above the
                   enclosing block boundary are returned as zero
    """
    n, k = B.shape
    Lp, n_pad = _pad_factor(L, nb)
    n_blk = n_pad // nb
    if dinv is None:
        dinv = blocked_dinv(L, nb)
    Bp = B if n_pad == n else jnp.zeros(
        (n_pad, k), B.dtype).at[:n, :].set(B)
    i0 = start_row // nb

    X = _fwd_sweep(Lp, Bp, dinv, nb, i0)

    def bwd(j, Y):
        i = n_blk - 1 - j
        r0 = i * nb
        colT = jax.lax.dynamic_slice(Lp, (0, r0), (n_pad, nb))
        acc = colT.T @ Y                    # rows > i of L^T: Y_i = 0
        Xi = jax.lax.dynamic_slice(X, (r0, 0), (nb, k))
        Yi = dinv[i].T @ (Xi - acc)
        return jax.lax.dynamic_update_slice(Y, Yi, (r0, 0))

    Y = jax.lax.fori_loop(0, n_blk - i0, bwd, jnp.zeros_like(Bp))
    return Y[:n, :]


def _fwd_sweep(Lp, Bp, dinv, nb, i0):
    n_pad, k = Bp.shape
    n_blk = n_pad // nb

    def fwd(i, X):
        r0 = i * nb
        row = jax.lax.dynamic_slice(Lp, (r0, 0), (nb, n_pad))
        acc = row @ X                       # solved region only: X_i = 0
        Bi = jax.lax.dynamic_slice(Bp, (r0, 0), (nb, k))
        Xi = dinv[i] @ (Bi - acc)
        return jax.lax.dynamic_update_slice(X, Xi, (r0, 0))

    return jax.lax.fori_loop(i0, n_blk, fwd, jnp.zeros_like(Bp))


def blocked_solve_lower(L: jnp.ndarray, B: jnp.ndarray,
                        dinv: jnp.ndarray | None = None,
                        nb: int = _SOLVE_NB) -> jnp.ndarray:
    """L^-1 B (forward substitution only) by the same blocked MXU
    sweep.  This is the serving-variance solve: XLA's TriangularSolve
    crashes the TPU compile helper at (n=20k, k=3072) and stages
    5.5 GiB of temps even at k=512, so `_predict_packed` routes wide
    variance solves on big factors here (var = diag - ||L^-1 k||^2
    needs only the forward half)."""
    n, k = B.shape
    Lp, n_pad = _pad_factor(L, nb)
    if dinv is None:
        dinv = blocked_dinv(L, nb)
    Bp = B if n_pad == n else jnp.zeros(
        (n_pad, k), B.dtype).at[:n, :].set(B)
    return _fwd_sweep(Lp, Bp, dinv, nb, 0)[:n, :]


@functools.partial(jax.jit, donate_argnums=(0,))
def chol_append_buf(Lbuf, B_full, C_pad, y_full, n):
    """Extend the lower Cholesky factor IN PLACE inside a donated
    capacity buffer when k_pad rows/cols are appended:

        S   = L^-1 B              (triangular solve, cap x k_pad)
        L_c = chol(C - S^T S)     (k_pad x k_pad)
        L_new = [[L, 0], [S^T, L_c]]

    Numerics: the factor extension and the alpha re-solve are
    triangular solves against L -- backward stable at any conditioning.
    (An explicit-inverse Schur update was tried first and loses
    ~cond(K) digits in alpha: at GPR conditioning sigma^2/noise^2 ~
    1e9 that was a measured 8 meV energy error.)

    ``n`` is a TRACED scalar and k_pad is a BUCKETED static width:
    one compiled program serves every refit at a given (capacity,
    k-bucket) instead of one per (n, k) pair -- an MD-cadence run used
    to recompile this program on EVERY refit (tens of seconds each
    through the remote TPU compiler), which inverted the whole
    O(n^2 k)-vs-O(n^3) advantage.  Appends whose real width k < k_pad
    carry GHOST columns: B ghost columns zero, C ghost block exactly
    identity (no noise), y ghost entries zero -- the factor then gains
    unit rows with zero coupling and zero weights, the same invariant
    as the inactive tail, and lc_diag ghost entries are exactly 1 (the
    PD check sees them as healthy).

    Invariants: ``Lbuf`` is (cap, cap) with the active factor in
    [:n, :n], UNIT diagonal on the inactive tail and zeros elsewhere --
    full-buffer triangular solves are then exact (inactive rows solve
    to zero) and no (n, n) slice is materialised.  With buffer donation
    the refit's peak device memory is the buffer itself plus O(n k)
    temporaries (round-2 VERDICT item 6; the old path kept L AND K^-1
    AND a padded eye-scatter copy, ~3x the covariance).

    Args:
        Lbuf:   (cap, cap) donated buffer, active [:n, :n], unit-diag
                tail; the caller guarantees n + k_pad <= cap (a
                dynamic_update_slice would silently CLAMP otherwise)
        B_full: (cap, k_pad) cross covariance K(old, new) in rows [:n],
                ZERO rows at and beyond n
        C_pad:  (k_pad, k_pad) new self block with noise added; ghost
                block exactly identity
        y_full: (cap,) labels in extended factor order, zero at ghosts
                and beyond n + k_pad
        n:      active factor size BEFORE the append (traced scalar)
    Returns:
        (Lbuf', alpha (cap,), lc_diag (k_pad,)); non-finite or <= 0
        entries of lc_diag signal a not-positive-definite extension
        (caller falls back to a full refactorisation; the donated
        buffer is then spent and must be rebuilt).
    """
    S = jax.scipy.linalg.solve_triangular(Lbuf, B_full, lower=True)
    Lc = jnp.linalg.cholesky(C_pad - S.T @ S)       # S rows n: are zero
    # write the k_pad new factor rows: S^T covers columns [:n] (its
    # entries at columns >= n are zero -- unit-diag tail x zero B rows),
    # then the diagonal block overlays Lc at (n, n)
    Lbuf = lax.dynamic_update_slice(Lbuf, S.T.astype(Lbuf.dtype), (n, 0))
    Lbuf = lax.dynamic_update_slice(Lbuf, Lc.astype(Lbuf.dtype), (n, n))
    alpha = jax.scipy.linalg.cho_solve((Lbuf, True), y_full)
    return Lbuf, alpha, jnp.diagonal(Lc)


@jax.jit
def chol_buf_solve(Lbuf, y_full):
    """alpha = K^-1 y by two triangular solves against the active region
    of a capacity factor buffer (unit-diag-tail invariant, so the
    full-buffer solve is exact: inactive/ghost rows of the zero-padded
    ``y_full`` (cap,) solve to zero).  One compiled program per
    capacity bucket -- no static active-size argument."""
    return jax.scipy.linalg.cho_solve((Lbuf, True), y_full)
