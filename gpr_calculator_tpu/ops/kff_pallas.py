r"""Fused Pallas TPU kernels for the force-force / energy-force blocks.

Why a custom kernel: the XLA path (ops/kernels.py kff) materialises the
(N1*3, N2*3) env-pair tensor in HBM between the matmuls and the
(env -> point) reduction, so the op is bound by elementwise HBM traffic
(~1.4 TF/s roofline on v5e; measured 1.2-2 TF/s).  Here every env-pair
intermediate lives in VMEM; HBM sees the inputs and the nine (m1, m2)
point-block planes only.

Design (one grid cell = TP1 lhs points x TP2 rhs points, B envs each).
The Jacobians are *projected* on the host side:

    q_u  = J_u . u                  (per env)
    Jt_u = J_u - q_u u              (component of J_u orthogonal to u)

which reduces the reference's force-force formula
(rbf_kernel.cpp:342-473; ops/kernels.py kff derivation) to a two-term
assembly with no per-pair q corrections:

    X = [u; Jt_x; Jt_y; Jt_z]  stacked along rows, d padded to 128 lanes
    G = X1 X2^T                          -- ONE MXU contraction (k=128)
        => all 16 pair blocks at once:
        c    = G[0,0]          p1_u = G[1+u,0]
        p2_v = G[0,1+v]        m_uv = G[1+u,1+v]
    A(c), B(c) per-pair coefficients                      (VPU)
    env_uv = A m_uv + (B p1_u) p2_v                       (VPU, in VMEM)

    lhs env -> point: sublane reshape-sum (VPU), planes stacked in one
    VMEM scratch; rhs env -> point: ONE dense k=t2 matmul for all nine
    planes; sub-tile columns scattered into the 128-wide output blocks
    with a tiled VPU mask and accumulated across the s grid dim.

The single k=128 contraction replaces the 22 thin (k=30) matmuls of the
first revision (per-matmul MXU latency capped it at ~0.34 TF/s), and the
stacked reduction replaces that revision's 27 small reduction matmuls
per cell.

Matmul precision (GPR_CALC_TPU_KFF_PRECISION / mm_precision kwarg):
TPU MXU multiplies in bf16; an exact-f32 matmul costs 6 passes.  The
covariance stays POSITIVE SEMI-DEFINITE under reduced precision if and
only if every G block is an EXACT inner product of consistently-rounded
per-point vectors: the assembly env = F'(c) (V1.V2) +
F''(c) (V1.u2)(u1.V2) is then exactly the directional-derivative Gram
of the PD kernel F(y1.y2) at the rounded points (for ANY per-point
(u, V), normalised or not), so Cholesky cannot fail beyond the noise
floor.  A truncated multi-pass expansion (e.g. hi hi + hi lo + lo hi,
dropping lo lo) is NOT a Gram matrix -- measured at the 10k workload it
shifts the spectrum by ~80x the 1e-2 noise floor and NaNs the Cholesky;
such modes are deliberately not offered.

  highest  6 passes  exact f32 kernel of the f32 descriptors
  bf16x4   4 passes  exact f32 Gram of hi+lo bf16-pair-rounded inputs
                     (input perturbation ~2^-17: physically negligible;
                     the default)
  bf16     1 pass    exact f32 Gram of bf16-rounded inputs (input
                     perturbation ~2^-9 ~ 2e-3 relative: inside any
                     realistic GPR noise assumption; the fast mode)

bf16x4/bf16 widen the lane (k) dimension instead of issuing separate
dots (lhs [h|h|l|l] . rhs [h|l|h|l] for x4) so ONE contraction
accumulates every product term in a single f32 G buffer -- separate
dots would hold multiple (4 t1, 4 t2) partials and blow the 16 MB
scoped-VMEM limit.

Mathematical spec: rbf_kff_many (gpr_calc/kernels/rbf_kernel.cpp:342-473)
== ops/kernels.py kff (parity asserted in tests/test_kff_pallas.py).
Validity (padding env, |x| < eps, ele == 0) is encoded as rinv == 0,
which zeroes A and B for that pair.
"""
from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from .packing import ForceData

TP1 = 8      # max lhs points per grid cell (shrunk adaptively, _lhs_tile)
TPC = 128    # rhs points per output column block
D_LANES = 128
T2_MAX = 512  # rhs env-tile budget (VMEM)
G_BUDGET = 8 * 2 ** 20  # per-cell G buffer budget (scoped VMEM is 16 MB)
# Largest triangular schedule one pallas_call may carry: the scalar-
# prefetch window lives in SMEM (1 MB) and the TPU compile helper dies
# past 2^17 int32 cell codes (131,072 = 512 KB double-buffered;
# measured on v5e: 127,512 cells compiles, 131,584 crashes --
# tools/probe_compile_limit.py).  Bigger schedules are split into
# row-tile-aligned panels, one pallas_call each (_sched_panels).
SCHED_CELL_CAP = int(os.environ.get("GPR_CALC_TPU_SCHED_CELL_CAP",
                                    120_000))

_DN = (((1,), (1,)), ((), ()))   # contract lane dims, no batch


def _resolve_precision(mm_precision):
    if mm_precision is None:
        mm_precision = os.environ.get("GPR_CALC_TPU_KFF_PRECISION",
                                      "bf16x4")
    if mm_precision not in ("highest", "bf16x4", "bf16"):
        raise ValueError(f"unknown kff matmul precision: {mm_precision}")
    return mm_precision


def _lanes(mode: str, d: int) -> int:
    """Operand lane width for descriptor width d, padded to a lane-tile
    multiple.  bf16x4 packs the four hi/lo product terms CONTIGUOUSLY
    (4 d lanes, see _lhs_rhs) instead of four separately-padded 128-lane
    tiles -- at the production d=30 that is ONE k=128 contraction where
    the round-2 kernel issued four (4.3x MXU waste on lane padding)."""
    width = 4 * d if mode == "bf16x4" else d
    return -(-width // D_LANES) * D_LANES


def _lhs_tile_points(b1: int, t2: int, four_rows: bool) -> int:
    """Points per grid-cell row tile: the largest power of two <= TP1
    whose G buffer ((4 t1, 4 t2) for kff, (t1, 4 t2) for kef) fits
    G_BUDGET -- big-neighbourhood workloads (pd4-class: 72 envs/force
    point, 224/energy point) need 1-2 points per row tile where the
    bench shapes (32 envs) take 8."""
    rows_factor = 4 if four_rows else 1
    tp1 = TP1
    while tp1 >= 1:
        fits = rows_factor * tp1 * b1 * 4 * t2 * 4 <= G_BUDGET
        # operand/metadata blocks have t1 = tp1*b1 sublanes; Mosaic needs
        # them divisible by 8 (outputs are reshaped to (m/tp1, tp1, m2)
        # blocks which are exempt)
        if fits and (tp1 * b1) % 8 == 0:
            return tp1
        tp1 //= 2
    return 0


def _rhs_tile_points(B2: int) -> int:
    """Smallest TP2 with TP2*B2 a lane-tile multiple, grown to the VMEM
    budget, and dividing TPC."""
    # tp2 starts as a power-of-two divisor of TPC=128 and the growth
    # condition preserves divisibility, so TPC % tp2 == 0 always holds
    tp2 = 128 // math.gcd(B2, 128)
    while tp2 * 2 * B2 <= T2_MAX and TPC % (tp2 * 2) == 0:
        tp2 *= 2
    return tp2


def _pair_blocks(x1_ref, x2_ref, rows1, rows2, mode: str):
    """G = X1 X2^T over all stacked components, computed at the requested
    matmul precision; f32 accumulate."""
    f32 = jnp.float32
    kl = x1_ref.shape[-1]
    a1 = x1_ref[:].reshape(rows1, kl)
    a2 = x2_ref[:].reshape(rows2, kl)
    prec = (jax.lax.Precision.HIGHEST if mode == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a1, a2, _DN, precision=prec,
                               preferred_element_type=f32)


def _coeff_sets(sigma2, p2, c, zeta: int, deriv: bool, dual: bool,
                rr, same, kind: str = "rbf"):
    """Per-pair (A, B) coefficient sets (F', F'' of the pair kernel).

    kind="rbf": p2 = gamma = 1/(2 l^2); deriv -> the d/d(gamma) set only
    (the analytic LML gradient's dK/dgamma build, ops/kernels
    rbf_dgamma); dual -> BOTH sets, sharing the exp and the G blocks
    (one fused pass instead of two kernel launches).
    kind="dot" (k = s2 (c^zeta + s0^2), Dot_mb.py / dot_kernel.cpp):
    p2 = s0^2 (unused by the derivative blocks); no deriv/dual
    (hyperparameter gradients for Dot go through the autodiff NLL)."""
    if zeta == 1:
        d1 = jnp.ones_like(c)
        dm2 = jnp.zeros_like(c)      # b0 = z(z-1) dm2 = 0 for zeta=1
    elif zeta == 2:
        d1 = c
        dm2 = jnp.ones_like(c)
    else:
        dm2 = c
        for _ in range(zeta - 3):
            dm2 = dm2 * c
        d1 = dm2 * c
    D = d1 * c
    zd1 = zeta * d1
    b0 = zeta * (zeta - 1) * dm2
    if kind == "dot":
        assert not (deriv or dual), "dot kernel has no fused deriv build"
        return [(sigma2 * zd1 * rr * same,
                 sigma2 * b0 * rr * same)]
    inv2l2 = p2
    k = sigma2 * jnp.exp((D - np.float32(1.0)) * inv2l2)
    b1c = zd1 * zd1
    A = k * inv2l2 * zd1
    B = k * inv2l2 * (b0 + b1c * inv2l2)
    sets = []
    if not deriv:
        sets.append((A * rr * same, B * rr * same))
    if deriv or dual:
        Dm1 = D - np.float32(1.0)
        dA = A * Dm1 + k * zd1
        dB = B * Dm1 + k * (b0 + np.float32(2.0) * b1c * inv2l2)
        sets.append((dA * rr * same, dB * rr * same))
    return sets


def _kff_body(sigma2, p2c, s, first,
              x1_ref, re1_ref, x2_ref, re2_ref,
              s2_ref, out_refs, acc_ref,
              zeta: int, t1: int, t2: int, b1: int, tp2: int,
              deriv: bool, dual: bool, mode: str, kind: str):
    f32 = jnp.float32

    # one contraction yields every pair block
    G = _pair_blocks(x1_ref, x2_ref, 4 * t1, 4 * t2, mode)

    c = G[:t1, :t2]
    rr = re1_ref[:, 0][:, None] * re2_ref[0][None, :]       # (t1, t2)
    same = jnp.where(re1_ref[:, 1][:, None] == re2_ref[1][None, :],
                     np.float32(1.0), np.float32(0.0))
    sets = _coeff_sets(sigma2, p2c, c, zeta, deriv, dual, rr, same,
                       kind=kind)
    nsets = len(sets)

    # assemble the env planes (9 per coefficient set), pre-reduced over
    # the lhs env axis (sublane reshape-sum -- VPU), stacked in one
    # scratch accumulator so the rhs env reduction is a SINGLE k=t2
    # matmul per cell instead of 27 latency-bound small MXU ops.  With
    # the projected Jacobians the plane is a two-term form:
    # A m_uv + (B p1_u) p2_v.
    p2 = [G[:t1, (1 + v) * t2:(2 + v) * t2] for v in range(3)]
    tp1 = t1 // b1
    for u in range(3):
        p1u = G[(1 + u) * t1:(2 + u) * t1, :t2]
        Bp1 = [B * p1u for (_, B) in sets]
        for v in range(3):
            m_uv = G[(1 + u) * t1:(2 + u) * t1, (1 + v) * t2:(2 + v) * t2]
            for ci, (A, _) in enumerate(sets):
                env = A * m_uv + Bp1[ci] * p2[v]
                # row (lhs env -> point) reduction on the VPU
                plane = ci * 9 + u * 3 + v
                acc_ref[plane * tp1:(plane + 1) * tp1, :] = (
                    env.reshape(tp1, b1, t2).sum(axis=1))

    # rhs env -> point reduction: one dense k=t2 contraction
    red = jnp.dot(acc_ref[:], s2_ref[:],
                  preferred_element_type=f32)   # (nsets*9*tp1, tp2)
    # scatter the tp2 columns of sub-tile s into the TPC-wide output
    # blocks with a tiled mask (VPU only -- no per-plane MXU op)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tp1, TPC), 1)
    mask = (lane // tp2 == s).astype(f32)
    ncopy = TPC // tp2
    for uv in range(9 * nsets):
        blk = red[uv * tp1:(uv + 1) * tp1, :]
        tiled = (jnp.concatenate([blk] * ncopy, axis=1) * mask)[None]
        ref = out_refs[uv]

        @pl.when(first)
        def _(ref=ref, tiled=tiled):
            ref[:] = tiled

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, tiled=tiled):
            ref[:] = ref[:] + tiled


def _kff_kernel(sig2_ref, inv2l2_ref,
                x1_ref, re1_ref, x2_ref, re2_ref, s2_ref,
                *refs, zeta: int, t1: int, t2: int, b1: int, tp2: int,
                deriv: bool, dual: bool, mode: str, kind: str):
    n_out = 18 if dual else 9
    out_refs, (acc_ref,) = refs[:n_out], refs[n_out:]
    s = pl.program_id(2)
    _kff_body(sig2_ref[0, 0], inv2l2_ref[0, 0], s, s == 0,
              x1_ref, re1_ref, x2_ref, re2_ref,
              s2_ref, out_refs, acc_ref, zeta, t1, t2, b1, tp2,
              deriv, dual, mode, kind)


def _kff_kernel_tri(cells, sig2_ref, inv2l2_ref,
                    x1_ref, re1_ref, x2_ref, re2_ref, s2_ref,
                    *refs, zeta: int, t1: int, t2: int, b1: int, tp2: int,
                    deriv: bool, dual: bool, mode: str, kind: str,
                    smask: int):
    """Triangular (self) schedule: the 1D grid enumerates only the cells
    whose column sub-tile reaches the upper triangle; (i, j, s) and the
    new-output-block flag come in as ONE bit-packed prefetched scalar
    per cell (_tri_cells) -- four separate arrays blow the 1 MB SMEM
    at the 20k-row scale."""
    n_out = 18 if dual else 9
    out_refs, (acc_ref,) = refs[:n_out], refs[n_out:]
    c = pl.program_id(0)
    code = cells[c]
    _kff_body(sig2_ref[0, 0], inv2l2_ref[0, 0],
              (code >> 1) & smask, (code & 1) == 1,
              x1_ref, re1_ref, x2_ref, re2_ref,
              s2_ref, out_refs, acc_ref, zeta, t1, t2, b1, tp2,
              deriv, dual, mode, kind)


def _cell_bits(n_row_tiles: int, n_col_blocks: int, nsub: int):
    """Bit widths for the packed triangular cell code
    (i << (1+sbits+jbits) | j << (1+sbits) | s << 1 | first).

    Widths are computed per shape -- a fixed 4-bit s field crashed on
    bucket widths with nsub > 16 (B=96 -> tp2=4 -> nsub=32).  Returns
    None when the code does not fit 31 bits (the gate then falls back
    to the XLA build)."""
    sbits = max(1, (nsub - 1).bit_length())
    jbits = max(1, (n_col_blocks - 1).bit_length())
    ibits = max(1, (n_row_tiles - 1).bit_length())
    if 1 + sbits + jbits + ibits > 31:
        return None
    return sbits, jbits


def _tri_cells(n_row_tiles, n_col_blocks, nsub, tp2, tp1):
    """Upper-triangle cell enumeration: row tile i (tp1 pts) x column
    sub-tile (j, s) (tp2 pts), kept when the sub-tile's last column
    reaches the row tile's first row; s ascending within each (i, j) so
    output-block revisits are consecutive.

    Returns (codes, sbits, jbits): ONE bit-packed int32 per cell
    (_cell_bits layout) -- SMEM is 1 MB and four per-cell arrays
    overflow it at the 20k-row scale (~150k triangular cells)."""
    bits = _cell_bits(n_row_tiles, n_col_blocks, nsub)
    assert bits is not None, (
        f"triangular cell code needs >31 bits "
        f"({n_row_tiles=}, {n_col_blocks=}, {nsub=}); "
        "the gate should have routed this shape to the XLA build")
    sbits, jbits = bits
    sh_j, sh_i = 1 + sbits, 1 + sbits + jbits
    codes = []
    for i in range(n_row_tiles):
        row_start = i * tp1
        for j in range(n_col_blocks):
            first = True
            for s in range(nsub):
                col_end = j * TPC + (s + 1) * tp2
                if row_start < col_end:
                    codes.append((i << sh_i) | (j << sh_j) | (s << 1)
                                 | (1 if first else 0))
                    first = False
    return np.asarray(codes, np.int32), sbits, jbits


def _sched_panels(codes: np.ndarray, sh_i: int, n_row_tiles: int,
                  cap: int):
    """Row-tile-aligned partition of the i-major triangular schedule
    into slices of at most ``cap`` cells: (c0, c1, i0, n_rows) per
    panel.

    One pallas_call per panel bounds the scalar-prefetch SMEM window
    (SCHED_CELL_CAP); row tiles stay contiguous and every row tile owns
    at least its diagonal cells, so the panels' output planes
    concatenate along the row axis into the full (m1/tp1, tp1, m2)
    planes with no uninitialised blocks."""
    n = len(codes)
    if n <= cap:
        return [(0, n, 0, n_row_tiles)]
    rows = (np.asarray(codes, np.int64) >> sh_i)
    starts = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
    row_of = rows[starts]
    ends = np.r_[starts[1:], n]
    assert int((ends - starts).max()) <= cap, (
        "a single row tile exceeds the schedule cell cap; "
        "route this shape to the XLA build")
    panels = []
    c0, i0 = 0, 0
    for k in range(len(starts)):
        if int(ends[k]) - c0 > cap:
            panels.append((c0, int(starts[k]), i0,
                           int(row_of[k]) - i0))
            c0, i0 = int(starts[k]), int(row_of[k])
    panels.append((c0, n, i0, n_row_tiles - i0))
    return panels


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


def _lhs_rhs(X, mode: str):
    """f32 X (last dim = TRUE descriptor width d, unpadded) -> (lhs, rhs)
    matmul operands at the requested precision, lane-padded to
    _lanes(mode, d).  The hi/lo split happens ONCE; both operand forms
    are concats of the same arrays, so the lhs.rhs contraction is an
    exact Gram of the rounded values wherever the pair appears.

    bf16x4 packs [hi|hi|lo|lo] . [hi|lo|hi|lo] CONTIGUOUSLY (4 d lanes,
    one shared zero-pad tail): the dot accumulates hi.hi + hi.lo +
    lo.hi + lo.lo = the exact product of the (hi+lo) pairs in a single
    contraction -- for d <= 32 that is ONE 128-lane MXU tile where
    per-term 128-lane padding cost four.

    The split uses integer mantissa masking, NOT dtype converts:
    ``lo = (X - bf16(X).astype(f32)).astype(bf16)`` looks right but the
    f32->bf16->f32 round trip folds away under XLA's
    --xla_allow_excess_precision (set by TPU runtimes), making lo
    identically zero and silently degrading the mode to plain bf16
    (observed on hardware: bf16x4 and bf16 produced bit-identical
    alphas).  Masking the low 16 mantissa bits is opaque to that
    rewrite; hi keeps the top 16 IEEE bits (exactly bf16-representable,
    truncation split) and lo = X - hi is exact in f32, rounded once to
    bf16."""
    d = X.shape[-1]
    kl = _lanes(mode, d)

    def lane_pad(a, w):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, kl - w)])

    if mode == "highest":
        Xp = lane_pad(X, d)
        return Xp, Xp
    if mode == "bf16":
        hi = lane_pad(X.astype(jnp.bfloat16), d)
        return hi, hi
    xu = jax.lax.bitcast_convert_type(X, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        xu & np.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f.astype(jnp.bfloat16)              # exact (low bits zero)
    lo = (X - hi_f).astype(jnp.bfloat16)
    lhs = lane_pad(jnp.concatenate((hi, hi, lo, lo), axis=-1), 4 * d)
    rhs = lane_pad(jnp.concatenate((hi, lo, hi, lo), axis=-1), 4 * d)
    return lhs, rhs


def _second_scalar(params, kind: str):
    """The kernel family's second scalar operand: gamma = 1/(2 l^2) for
    RBF, sigma0^2 for the dot kernel."""
    f32 = jnp.float32
    if kind == "dot":
        return (jnp.asarray(params["sigma0"], f32) ** 2).reshape(1, 1)
    return (1.0 / (2.0 * jnp.asarray(params["l"], f32) ** 2)).reshape(1, 1)


def force_operand(f: ForceData, mode: str, multiple: int = TPC):
    """(lhs, rhs, re) matmul operands for a force block side.

    lhs/rhs: (4, N, kl) stacked [u; Jt_x; Jt_y; Jt_z] component-major rows
    (Jt = the u-orthogonal Jacobian projection, see module docstring) at
    the requested precision; re: (2, N) validity (rinv) + element id.

    PSD of the assembled covariance requires every block that shares a
    data side to consume the SAME operand arrays: recomputing u in a
    differently-fused program can flip the bf16 rounding of a handful of
    envs and sink lambda_min below the 1e-4-scale energy noise floor
    (measured at the 10k workload).  Build once, pass everywhere."""
    f32 = jnp.float32
    f = _pad_points(f, multiple)
    m, B, d = f.x.shape
    x = f.x.reshape(m * B, d).astype(f32)
    n2 = jnp.sum(x * x, axis=1)
    n = jnp.sqrt(n2)
    valid = (n > config.EPS) & (f.ele.reshape(-1) > 0)
    u = x / jnp.where(valid, n, 1.0)[:, None]
    rinv = jnp.where(valid, 1.0 / jnp.where(valid, n, 1.0), 0.0)
    J = f.dxdr.reshape(m * B, d, 3).astype(f32)
    q = jnp.einsum("ndu,nd->nu", J, u)             # (N, 3)
    Jt = J - u[:, :, None] * q[:, None, :]         # project out u
    X = jnp.concatenate([u[None], jnp.transpose(Jt, (2, 0, 1))],
                        axis=0)                         # (4, N, d) true d
    re = jnp.stack([rinv, f.ele.reshape(-1).astype(f32)], axis=0)  # (2, N)
    lhs, rhs = _lhs_rhs(X, mode)       # lane-pads to _lanes(mode, d)
    return lhs, rhs, re


def energy_operand(e, mode: str, multiple: int = TP1):
    """(lhs, rhs, w) operands for an energy side: lhs/rhs (N1, kl) unit
    descriptors at the requested precision, w (N1, 2) = [valid/count,
    element id].  Same build-once contract as force_operand.  multiple:
    point-padding granularity (lcm(TP1, n_devices) for the row-sharded
    multi-chip build)."""
    f32 = jnp.float32
    e = _pad_energy(e, multiple)
    m, A, d = e.x.shape
    x = e.x.reshape(m * A, d).astype(f32)
    n1 = jnp.sqrt(jnp.sum(x * x, axis=1))
    v1 = (n1 > config.EPS) & (e.ele.reshape(-1) > 0)
    u1 = x / jnp.where(v1, n1, 1.0)[:, None]            # true d
    inv_count = jnp.repeat(1.0 / e.counts.astype(f32), A)
    w = jnp.stack([jnp.where(v1, inv_count, 0.0),
                   e.ele.reshape(-1).astype(f32)], axis=1)  # (N1, 2)
    lhs, rhs = _lhs_rhs(u1, mode)
    return lhs, rhs, w


def kff_pallas(f1: ForceData, f2: ForceData, params, zeta: int = 2,
               interpret: bool = False, symmetric: bool = False,
               deriv: bool = False,
               mm_precision: str | None = None,
               kind: str = "rbf") -> jnp.ndarray:
    """RBF force-force block via the fused Pallas kernel, (3 m1, 3 m2).

    f1.dxdr must have 3 cartesian columns (the stress path stays on the
    XLA implementation) and the descriptor width must fit one lane tile
    (d <= 128).  symmetric=True (f1 is f2, the training build) runs the
    triangular schedule -- only cells reaching the upper triangle are
    computed (~1.8x fewer) and the lower blocks are mirrored afterwards
    (K_FF[(i,u),(j,v)] == K_FF[(j,v),(i,u)]).  mm_precision: see module
    docstring (None -> GPR_CALC_TPU_KFF_PRECISION, default bf16x4)."""
    mode = _resolve_precision(mm_precision)
    m1_in, m2_in = f1.x.shape[0], f2.x.shape[0]
    assert f1.dxdr.shape[3] == 3 and f2.dxdr.shape[3] == 3
    assert f1.x.shape[2] <= D_LANES, "descriptor width > 128: use XLA kff"
    B1, B2 = f1.x.shape[1], f2.x.shape[1]
    if symmetric:
        assert m1_in == m2_in and B1 == B2
        lhs, rhs, re = force_operand(f1, mode, TPC)
        out = kff_from_ops(params, lhs, re, rhs, re, B1=B1, B2=B2,
                           zeta=zeta, interpret=interpret,
                           symmetric=True, deriv=deriv, mode=mode,
                           kind=kind)
    else:
        lhs1, _, re1 = force_operand(f1, mode, TP1)
        _, rhs2, re2 = force_operand(f2, mode, TPC)
        out = kff_from_ops(params, lhs1, re1, rhs2, re2, B1=B1, B2=B2,
                           zeta=zeta, interpret=interpret,
                           symmetric=False, deriv=deriv, mode=mode,
                           kind=kind)
    return out[:3 * m1_in, :3 * m2_in].astype(f1.x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("B1", "B2", "zeta", "interpret",
                                    "symmetric", "deriv", "dual", "mode",
                                    "kind", "axis_name"))
def kff_from_ops(params, lhs1, re1, rhs2, re2, *, B1: int, B2: int,
                 zeta: int, interpret: bool, symmetric: bool, deriv: bool,
                 mode: str, dual: bool = False,
                 kind: str = "rbf", cells=None, owned=None,
                 axis_name: str | None = None) -> jnp.ndarray:
    """Force-force block from prebuilt operands (force_operand), returning
    the PADDED (3 m1p, 3 m2p) f32 block.  k_self passes the SAME operand
    arrays here and to kef/kee so the training covariance is one
    consistent Gram (see force_operand).  dual=True returns the
    (K, dK/dgamma) PAIR from one fused pass (shared G contraction and
    exp -- the analytic-LML training gradient's hot path).

    Multi-chip (inside shard_map; parallel/sharded_kernels.py): pass an
    explicit per-device ``cells`` slice of the triangular schedule, the
    (n_row_tiles, n_col_blocks) ``owned`` 0/1 block-ownership mask, and
    the mesh ``axis_name`` -- unvisited output blocks are garbage, so
    they are masked by ``owned`` before the cross-device psum, after
    which every device holds the full (replicated) symmetric block."""
    assert not (dual and deriv), "dual already includes the deriv set"
    assert not (kind == "dot" and (deriv or dual)), (
        "dot kernel has no fused deriv build")
    f32 = jnp.float32
    kl = lhs1.shape[-1]
    N1, N2 = lhs1.shape[1], rhs2.shape[1]
    m1, m2 = N1 // B1, N2 // B2
    tp2 = _rhs_tile_points(B2)
    t2 = tp2 * B2
    tp1 = _lhs_tile_points(B1, t2, four_rows=True)
    if tp1 == 0:
        raise ValueError(
            f"fused kff tile does not fit scoped VMEM for lhs bucket "
            f"B1={B1} against rhs tile t2={t2} (B2={B2}); route this "
            "shape to the XLA build (k_block/_use_pallas gates)")
    t1 = tp1 * B1
    nsub = TPC // tp2
    n_planes = 18 if dual else 9
    X1, X2 = lhs1, rhs2

    # rhs env -> point one-hot reduction map (the lhs reduction is a
    # sublane reshape-sum inside the kernel)
    S2 = np.kron(np.eye(tp2, dtype=np.float32),
                 np.ones((1, B2), np.float32)).T         # (t2, tp2)

    panels = None
    if symmetric:
        if cells is None:
            codes, sbits, jbits = _tri_cells(m1 // tp1, m2 // TPC, nsub,
                                             tp2, tp1)
            sh_i0 = 1 + sbits + jbits
            if len(codes) > SCHED_CELL_CAP:
                panels = _sched_panels(codes, sh_i0, m1 // tp1,
                                       SCHED_CELL_CAP)
            cells = jnp.asarray(codes)
        else:
            # explicit schedule slice (multi-chip shard_map path): the
            # caller owns the partitioning; slices are not row-
            # contiguous, so no panel split applies here
            sbits, jbits = _cell_bits(m1 // tp1, m2 // TPC, nsub)
        sh_j, sh_i = 1 + sbits, 1 + sbits + jbits
        jmask, smask = (1 << jbits) - 1, (1 << sbits) - 1

    tensor_args = (
        jnp.asarray(params["sigma"], f32).reshape(1, 1) ** 2,
        _second_scalar(params, kind),
        X1.reshape(4, N1 // t1, t1, kl),
        re1.T,
        X2.reshape(4, N2 // t2, t2, kl),
        re2,
        jnp.asarray(S2),
    )
    # outputs are (rows-of-tiles, tp1, m2) so the per-cell block
    # (1, tp1, TPC) stays Mosaic-legal for any tp1 (a 2D (tp1, TPC)
    # block needs tp1 % 8 == 0, which adaptive tiles break)
    out_shape = tuple(jax.ShapeDtypeStruct((m1 // tp1, tp1, m2), f32)
                      for _ in range(n_planes))
    scratch = [pltpu.VMEM((n_planes * tp1, t2), jnp.float32)]
    kern_kw = dict(zeta=zeta, t1=t1, t2=t2, b1=B1, tp2=tp2, deriv=deriv,
                   dual=dual, mode=mode, kind=kind)

    # Trace with x64 disabled: under x64 the BlockSpec index maps produce
    # i64 grid indices, which Mosaic cannot legalize.
    with jax.enable_x64(False):
        if not symmetric:
            grid = (m1 // tp1, m2 // TPC, nsub)
            outs = pl.pallas_call(
                functools.partial(_kff_kernel, **kern_kw),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((4, 1, t1, kl),
                                 lambda i, j, s: (0, i, 0, 0)),
                    pl.BlockSpec((t1, 2), lambda i, j, s: (i, 0)),
                    pl.BlockSpec((4, 1, t2, kl),
                                 lambda i, j, s, n=nsub: (0, j * n + s,
                                                          0, 0)),
                    pl.BlockSpec((2, t2),
                                 lambda i, j, s, n=nsub: (0, j * n + s)),
                    pl.BlockSpec((t2, tp2), lambda i, j, s: (0, 0)),
                ],
                out_specs=tuple(
                    pl.BlockSpec((1, tp1, TPC),
                                 lambda i, j, s: (i, 0, j))
                    for _ in range(n_planes)),
                out_shape=out_shape,
                scratch_shapes=scratch,
                interpret=interpret,
            )(*tensor_args)
        else:
            def tri_call(cells_p, i0, nrows_p):
                # one triangular pallas_call over a row-contiguous
                # schedule slice; output planes cover rows [i0, i0+nrows)
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(cells_p.shape[0],),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((4, 1, t1, kl),
                                     lambda c, C, si=sh_i: (0, C[c] >> si,
                                                            0, 0)),
                        pl.BlockSpec((t1, 2),
                                     lambda c, C, si=sh_i: (C[c] >> si,
                                                            0)),
                        pl.BlockSpec((4, 1, t2, kl),
                                     lambda c, C, n=nsub, sj=sh_j,
                                     jm=jmask, sm=smask:
                                     (0, (((C[c] >> sj) & jm)) * n
                                      + ((C[c] >> 1) & sm), 0, 0)),
                        pl.BlockSpec((2, t2),
                                     lambda c, C, n=nsub, sj=sh_j,
                                     jm=jmask, sm=smask:
                                     (0, (((C[c] >> sj) & jm)) * n
                                      + ((C[c] >> 1) & sm))),
                        pl.BlockSpec((t2, tp2),
                                     lambda c, C: (0, 0)),
                    ],
                    out_specs=tuple(
                        pl.BlockSpec((1, tp1, TPC),
                                     lambda c, C, si=sh_i, sj=sh_j,
                                     jm=jmask, r0=i0:
                                     ((C[c] >> si) - r0, 0,
                                      (C[c] >> sj) & jm))
                        for _ in range(n_planes)),
                    scratch_shapes=scratch,
                )
                return pl.pallas_call(
                    functools.partial(_kff_kernel_tri, smask=smask,
                                      **kern_kw),
                    grid_spec=grid_spec,
                    out_shape=tuple(
                        jax.ShapeDtypeStruct((nrows_p, tp1, m2), f32)
                        for _ in range(n_planes)),
                    interpret=interpret,
                )(cells_p, *tensor_args)

            if panels is None:
                outs = tri_call(cells, 0, m1 // tp1)
            else:
                pouts = [tri_call(cells[c0:c1], i0, nr)
                         for c0, c1, i0, nr in panels]
                outs = tuple(
                    jnp.concatenate([po[k] for po in pouts], axis=0)
                    for k in range(n_planes))
            if owned is not None:
                # multi-chip: zero the blocks this device does not own
                # (their memory is uninitialised -- use where, a
                # multiply would propagate NaN bit patterns) and psum
                # so every device holds the full upper-triangle planes
                om = jnp.repeat(owned, TPC, axis=1)[:, None, :]
                outs = tuple(jnp.where(om, o, 0.0) for o in outs)
                if axis_name is not None:
                    outs = jax.lax.psum(outs, axis_name)

    outs = tuple(o.reshape(m1, m2) for o in outs)

    def assemble(planes):
        if symmetric:
            # mirror the never-visited lower cells: plane (u,v) at (p, q)
            # equals plane (v,u) at (q, p); "kept" reproduces _tri_cells.
            p_idx = jnp.arange(m1)[:, None]
            q_idx = jnp.arange(m2)[None, :]
            kept = (tp1 * (p_idx // tp1)
                    < tp2 * (q_idx // tp2) + tp2)     # (m1, m2)
            planes = [jnp.where(kept, planes[u * 3 + v],
                                planes[v * 3 + u].T)
                      for u in range(3) for v in range(3)]
        # interleave to rows (p,u) x cols (q,v) WITHOUT any tensor whose
        # trailing dim is 3: a (.., m, 3) layout lane-pads 3 -> 128 (42x
        # HBM; 55 GB at the 20k scale).  Stacks put the 3 on the SUBLANE
        # axis (3 -> 8 pad only) and the final step is a plain 2D
        # transpose.
        cols = []
        for v in range(3):
            cv = jnp.stack([planes[u * 3 + v] for u in range(3)],
                           axis=1)                    # (m1, 3, m2)
            cols.append(cv.reshape(3 * m1, m2).T)     # (m2, 3 m1)
        KT = jnp.stack(cols, axis=1).reshape(3 * m2, 3 * m1)
        return KT.T

    if dual:
        return assemble(outs[:9]), assemble(outs[9:])
    return assemble(outs)


# ---------------------------------------------------------------------------
# energy-force block, same fused design (lhs carries only u)
# ---------------------------------------------------------------------------

def _kef_kernel(sig2_ref, inv2l2_ref,
                u1_ref, w1_ref, x2_ref, re2_ref, s2_ref,
                *refs, zeta: int, t1: int, t2: int, a1: int, tp2: int,
                deriv: bool, dual: bool, mode: str, kind: str):
    """K_EF = -(1/N_p) sum dk_dD z c^(z-1) u1 . Jt2_v
    (rbf_kernel.cpp:102-171 + the wrapper normalisation), fused like
    _kff_body: one k=128 contraction, VPU assembly, stacked reduction.
    The rhs Jacobian projection folds the reference's (u1 - c u2)/r2 . J2v
    into a single pair block (u1 . Jt2_v).  dual=True emits the
    (K, dK/dgamma) plane pairs from the shared contraction."""
    f32 = jnp.float32
    n_out = 6 if dual else 3
    out_refs, (acc_ref,) = refs[:n_out], refs[n_out:]
    sigma2 = sig2_ref[0, 0]
    p2c = inv2l2_ref[0, 0]
    s = pl.program_id(2)

    G = _pair_blocks(u1_ref, x2_ref, t1, 4 * t2, mode)  # (t1, 4*t2)

    c = G[:, :t2]
    if zeta == 1:
        d1 = jnp.ones_like(c)
    else:
        d1 = c
        for _ in range(zeta - 2):
            d1 = d1 * c
    D = d1 * c
    # w1 carries validity/count on the lhs; re2 carries rinv (validity)
    # and the element id on the rhs
    scale = (w1_ref[:, 0][:, None] * re2_ref[0][None, :])
    same = jnp.where(w1_ref[:, 1][:, None] == re2_ref[1][None, :],
                     np.float32(1.0), np.float32(0.0))
    if kind == "dot":
        A_sets = [-(sigma2 * zeta * d1) * scale * same]
    else:
        inv2l2 = p2c
        k = sigma2 * jnp.exp((D - np.float32(1.0)) * inv2l2)
        A0 = -(k * inv2l2) * (zeta * d1)
        A_sets = []
        if not deriv:
            A_sets.append(A0 * scale * same)
        if deriv or dual:
            Ad = A0 * (D - np.float32(1.0)) - k * (zeta * d1)
            A_sets.append(Ad * scale * same)
    nsets = len(A_sets)

    tp1 = t1 // a1
    for v in range(3):
        P2v = G[:, (1 + v) * t2:(2 + v) * t2]
        for ci, A in enumerate(A_sets):
            env = A * P2v
            plane = ci * 3 + v
            acc_ref[plane * tp1:(plane + 1) * tp1, :] = (
                env.reshape(tp1, a1, t2).sum(axis=1))

    red = jnp.dot(acc_ref[:], s2_ref[:], preferred_element_type=f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tp1, TPC), 1)
    mask = (lane // tp2 == s).astype(f32)
    ncopy = TPC // tp2
    first = s == 0
    for v in range(3 * nsets):
        blk = red[v * tp1:(v + 1) * tp1, :]
        tiled = (jnp.concatenate([blk] * ncopy, axis=1) * mask)[None]
        ref = out_refs[v]

        @pl.when(first)
        def _(ref=ref, tiled=tiled):
            ref[:] = tiled

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, tiled=tiled):
            ref[:] = ref[:] + tiled


def _pad_energy(e, multiple: int):
    from .packing import EnergyData
    m = e.x.shape[0]
    m_new = ((m + multiple - 1) // multiple) * multiple
    if m_new == m:
        return e
    pad = m_new - m
    return EnergyData(
        x=jnp.pad(e.x, ((0, pad), (0, 0), (0, 0))),
        ele=jnp.pad(e.ele, ((0, pad), (0, 0))),
        counts=jnp.pad(e.counts, (0, pad), constant_values=1.0),
        nreal=e.nreal)


def kef_pallas(e1, f2: ForceData, params, zeta: int = 2,
               interpret: bool = False, deriv: bool = False,
               mm_precision: str | None = None,
               kind: str = "rbf") -> jnp.ndarray:
    """Energy-force block via the fused Pallas kernel, (m1, 3 m2)."""
    mode = _resolve_precision(mm_precision)
    m1_in, m2_in = e1.x.shape[0], f2.x.shape[0]
    assert f2.dxdr.shape[3] == 3
    assert e1.x.shape[2] <= D_LANES
    lhs1, _, w1 = energy_operand(e1, mode)
    _, rhs2, re2 = force_operand(f2, mode, TPC)
    out = kef_from_ops(params, lhs1, w1, rhs2, re2,
                       A1=e1.x.shape[1], B2=f2.x.shape[1], zeta=zeta,
                       interpret=interpret, deriv=deriv, mode=mode,
                       kind=kind)
    return out[:m1_in, :3 * m2_in].astype(e1.x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("A1", "B2", "zeta", "interpret",
                                    "deriv", "dual", "mode", "kind"))
def kef_from_ops(params, U1, w1, rhs2, re2, *, A1: int, B2: int,
                 zeta: int, interpret: bool, deriv: bool,
                 mode: str, dual: bool = False,
                 kind: str = "rbf") -> jnp.ndarray:
    """Energy-force block from prebuilt operands (energy_operand /
    force_operand), returning the PADDED (m1p, 3 m2p) f32 block.
    dual=True returns the (K, dK/dgamma) pair from one fused pass."""
    assert not (dual and deriv), "dual already includes the deriv set"
    assert not (kind == "dot" and (deriv or dual)), (
        "dot kernel has no fused deriv build")
    f32 = jnp.float32
    kl = U1.shape[-1]
    N1, N2 = U1.shape[0], rhs2.shape[1]
    m1, m2 = N1 // A1, N2 // B2
    tp2 = _rhs_tile_points(B2)
    t2 = tp2 * B2
    tp1 = _lhs_tile_points(A1, t2, four_rows=False)
    if tp1 == 0:
        raise ValueError(
            f"fused kef tile does not fit scoped VMEM for lhs bucket "
            f"A1={A1} against rhs tile t2={t2} (B2={B2}); route this "
            "shape to the XLA build (k_block/_use_pallas gates)")
    t1 = tp1 * A1
    nsub = TPC // tp2
    X2 = rhs2
    S2 = np.kron(np.eye(tp2, dtype=np.float32),
                 np.ones((1, B2), np.float32)).T

    grid = (m1 // tp1, m2 // TPC, nsub)
    n_planes = 6 if dual else 3

    with jax.enable_x64(False):
        outs = pl.pallas_call(
            functools.partial(_kef_kernel, zeta=zeta, t1=t1, t2=t2,
                              a1=A1, tp2=tp2, deriv=deriv, dual=dual,
                              mode=mode, kind=kind),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((t1, kl), lambda i, j, s: (i, 0)),
                pl.BlockSpec((t1, 2), lambda i, j, s: (i, 0)),
                pl.BlockSpec((4, 1, t2, kl),
                             lambda i, j, s, n=nsub: (0, j * n + s, 0, 0)),
                pl.BlockSpec((2, t2),
                             lambda i, j, s, n=nsub: (0, j * n + s)),
                pl.BlockSpec((t2, tp2), lambda i, j, s: (0, 0)),
            ],
            out_specs=tuple(
                pl.BlockSpec((1, tp1, TPC), lambda i, j, s: (i, 0, j))
                for _ in range(n_planes)),
            out_shape=tuple(jax.ShapeDtypeStruct((m1 // tp1, tp1, m2),
                                                 f32)
                            for _ in range(n_planes)),
            scratch_shapes=[pltpu.VMEM((n_planes * tp1, t2),
                                       jnp.float32)],
            interpret=interpret,
        )(
            jnp.asarray(params["sigma"], f32).reshape(1, 1) ** 2,
            _second_scalar(params, kind),
            U1,
            w1,
            X2.reshape(4, N2 // t2, t2, kl),
            re2,
            jnp.asarray(S2),
        )
    outs = tuple(o.reshape(m1, m2) for o in outs)

    def interleave(planes):
        # (m1, 3 m2) with cols (q,v) -- via the transpose so the 3 stays
        # on sublanes (see kff_from_ops.assemble)
        KT = jnp.stack([pl_.T for pl_ in planes],
                       axis=1).reshape(3 * m2, m1)    # (m2, 3, m1)
        return KT.T

    if dual:
        return interleave(outs[:3]), interleave(outs[3:])
    return interleave(outs)


# ---------------------------------------------------------------------------
# energy-energy block from the same operands (consistency companion)
# ---------------------------------------------------------------------------

def _largest_divisor_leq(m: int, cap: int) -> int:
    """Largest divisor of m that is <= cap, via sqrt(m) factor pairs --
    the previous linear scan was O(m) Python at trace time per shape."""
    if cap >= m:
        return m
    best = 1
    i = 1
    while i * i <= m:
        if m % i == 0:
            if i <= cap and i > best:
                best = i
            q = m // i
            if q <= cap and q > best:
                best = q
        i += 1
    return best


@functools.partial(jax.jit,
                   static_argnames=("A1", "zeta", "deriv", "dual", "mode",
                                    "kind"))
def kee_from_ops(params, lhs, rhs, w, *, A1: int, zeta: int,
                 deriv: bool, mode: str, dual: bool = False,
                 kind: str = "rbf", w_lhs=None) -> jnp.ndarray:
    """Energy-energy block from prebuilt operands (energy_operand),
    (m1p, m2p) f32, padded.

    Plain XLA (the block is tiny next to K_FF), but c is the SAME exact
    Gram of the SAME rounded operand arrays the Pallas K_EF/K_FF consume
    -- an exact-f32 K_EE next to rounded force blocks breaks the
    whole-covariance Gram property and NaNs the Cholesky (see module
    docstring).  Chunked over lhs points to bound the (N1, N2) pair
    matrix.

    w_lhs: per-row weights when ``lhs`` is a ROW STRIPE of the full
    operand (the multi-chip row-sharded build); defaults to ``w`` (the
    square self block)."""
    assert not (dual and deriv), "dual already includes the deriv set"
    f32 = jnp.float32
    N1, N2 = lhs.shape[0], rhs.shape[0]
    m_rows, m_cols = N1 // A1, N2 // A1
    if kind == "dot":
        assert not (deriv or dual), "dot kernel has no fused deriv build"
    sigma2 = jnp.asarray(params["sigma"], f32) ** 2
    p2c = _second_scalar(params, kind)[0, 0]
    if w_lhs is None:
        w_lhs = w
    wgt1 = w_lhs[:, 0].astype(f32)
    ele1 = w_lhs[:, 1].astype(f32)
    wgt = w[:, 0].astype(f32)
    ele = w[:, 1].astype(f32)
    prec = (jax.lax.Precision.HIGHEST if mode == "highest"
            else jax.lax.Precision.DEFAULT)

    def block(args):
        lb, wb, eb = args
        c = jax.lax.dot_general(lb, rhs, _DN, precision=prec,
                                preferred_element_type=f32)
        D = c
        for _ in range(zeta - 1):
            D = D * c
        if kind == "dot":
            k = sigma2 * (D + p2c)
        else:
            k = sigma2 * jnp.exp((D - 1.0) * p2c)
        msk = jnp.where(eb[:, None] == ele[None, :], 1.0, 0.0)
        msk = msk * (wb[:, None] * wgt[None, :])
        pc = lb.shape[0] // A1
        vals = []
        if not deriv:
            vals.append((k * msk)
                        .reshape(pc, A1, m_cols, A1).sum(axis=(1, 3)))
        if deriv or dual:
            vals.append((k * (D - 1.0) * msk)
                        .reshape(pc, A1, m_cols, A1).sum(axis=(1, 3)))
        return tuple(vals) if len(vals) > 1 else vals[0]

    # bound the (pc*A1, N2) pair matrix (plus ~4 elementwise temps) by a
    # memory budget -- the fixed gcd(m, 64) chunk can transiently
    # allocate GBs at many-env shapes the VMEM gate accepts
    budget_rows = max(1, int(2.5e8) // max(4 * N2, 1))   # ~1 GB of f32
    pc_cap = max(1, budget_rows // A1)
    pc = math.gcd(m_rows, 64)
    if pc > pc_cap:
        pc = _largest_divisor_leq(m_rows, pc_cap)
    nch = m_rows // pc
    out = jax.lax.map(block, (lhs.reshape(nch, pc * A1, lhs.shape[1]),
                              wgt1.reshape(nch, pc * A1),
                              ele1.reshape(nch, pc * A1)))
    if dual:
        return (out[0].reshape(m_rows, m_cols),
                out[1].reshape(m_rows, m_cols))
    return out.reshape(m_rows, m_cols)
