r"""Spherical harmonics Y_l^m and Cartesian gradients, jittable, complex-free.

Replaces scipy.special.sph_harm (gpr_calc/SO3.py:5,508-511,676-679) with
stable normalised associated-Legendre recurrences, fully vectorised over the
neighbour axis and unrolled over the (small, static) (l, m) index set.

Conventions match scipy:  Y_l^m(theta, phi) with theta = polar angle,
phi = azimuth;  Y_l^{-m} = (-1)^m conj(Y_l^m).

The primary implementation carries (re, im) REAL PAIRS instead of complex
arrays: the imaginary structure of Y_lm is purely the azimuthal phase
e^{i m phi}, so the split is analytic (re = P cos(m phi), im = P sin(m phi))
and every downstream consumer in the SO(3) power spectrum only ever needs
REAL PARTS of conjugated products (ops/so3.py) -- two real einsums where a
complex einsum would lower to four.  This is also what makes the f64
descriptor runnable ON TPU: the x64 rewriter has no f64 -> c128 expansion
(hard compiler abort), while pairs of f64 arrays emulate fine.
``ylm_all``/``ylm_gradients`` remain as complex-assembling wrappers for
tests and external callers.

The Cartesian gradient uses the same covariant-component recurrence as the
reference (SO3.py:682-707): for each (l, m)

  xcov0   = -sqrt(((l+1)^2-m^2)/((2l+1)(2l+3))) l Y_{l+1}^m / r
            + sqrt((l^2-m^2)/((2l-1)(2l+1))) (l+1) Y_{l-1}^m / r      (|m|<=l-1)
  xcov+1  = -sqrt((l+m+1)(l+m+2)/(2(2l+1)(2l+3))) l Y_{l+1}^{m+1} / r
            - sqrt((l-m-1)(l-m)/(2(2l-1)(2l+1))) (l+1) Y_{l-1}^{m+1} / r
  xcov-1  = -sqrt((l-m+1)(l-m+2)/(2(2l+1)(2l+3))) l Y_{l+1}^{m-1} / r
            - sqrt((l+m-1)(l+m)/(2(2l-1)(2l+1))) (l+1) Y_{l-1}^{m-1} / r

  dY/dx = (xcov-1 - xcov+1)/sqrt(2),  dY/dy = i (xcov-1 + xcov+1)/sqrt(2),
  dY/dz = xcov0
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def _legendre_rows(lmax: int, ct, st):
    """Normalised associated Legendre rows Ptilde_l^m (m = 0..lmax per row),
    including the full Y_lm normalisation sqrt((2l+1)/(4pi) (l-m)!/(l+m)!).

    Returns a list of (N, lmax+1) arrays, one per l = 0..lmax (entries with
    m > l are zero)."""
    rdt = ct.dtype
    L1 = lmax + 1
    m_idx = jnp.arange(L1)

    # diagonal seeds P_m^m (sequential in m -- lmax+1 steps)
    diag = [jnp.full_like(ct, 1.0 / math.sqrt(4.0 * math.pi))]
    for m in range(1, L1):
        diag.append(-math.sqrt((2 * m + 1) / (2.0 * m)) * st * diag[-1])
    Pmm = jnp.stack(diag, axis=1)                       # (N, lmax+1)

    # l-recurrence over whole m-rows; coefficients zeroed (in numpy, so
    # no NaN constants enter the trace) where the recurrence is invalid
    # (m >= l - 1: those entries are overwritten by the seed rows).
    mv = np.arange(L1, dtype=np.float64)
    rows = []
    P_prev2 = jnp.where(m_idx == 0, Pmm[:, 0:1], 0.0)   # l = 0 row
    rows.append(P_prev2)
    P_prev1 = None
    if lmax >= 1:
        p10 = math.sqrt(3.0) * ct * diag[0]
        P_prev1 = jnp.where(m_idx == 0, p10[:, None],
                            jnp.where(m_idx == 1, Pmm[:, 1:2], 0.0))
        rows.append(P_prev1)
    for l in range(2, L1):
        valid = mv <= l - 2
        a = np.where(valid, np.sqrt(
            np.where(valid, (4.0 * l * l - 1.0)
                     / np.maximum(l * l - mv * mv, 1e-300), 1.0)), 0.0)
        b = np.sqrt(np.where(valid, ((l - 1.0) ** 2 - mv * mv)
                             / (4.0 * (l - 1.0) ** 2 - 1.0), 0.0))
        row = (jnp.asarray(a, dtype=rdt) * (ct[:, None] * P_prev1)
               - jnp.asarray(a * b, dtype=rdt) * P_prev2)
        row = jnp.where(m_idx == l - 1,
                        math.sqrt(2 * l + 1) * ct[:, None]
                        * Pmm[:, l - 1:l], row)
        row = jnp.where(m_idx == l, Pmm[:, l:l + 1], row)
        rows.append(row)
        P_prev2, P_prev1 = P_prev1, row
    return rows


def ylm_all_ri(lmax: int, pos: jnp.ndarray, r: jnp.ndarray):
    """All Y_l^m for l = 0..lmax as a REAL PAIR (Yre, Yim).

    Vectorised over the m axis: the l-recurrence advances whole
    (N, lmax+1) m-rows with numpy coefficient vectors, and the output is
    assembled by stacking -- no per-(l, m) scatter ops.  (A per-entry
    ``.at[].set`` unroll emits ~(lmax+1)^2 scatters at trace time, which
    makes lmax = 32 -- the reference's validated ceiling, SO3.py:67-97 --
    effectively uncompilable.)

    Args:
        pos: (N, 3) vectors, r: (N,) their norms (caller guarantees r > 0).
    Returns:
        two real arrays (N, lmax+1, 2*lmax+1) indexed [n, l, lmax + m]
        (entries with |m| > l are zero).
    """
    rdt = pos.dtype
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    ct = z / r                       # cos(theta)
    rho = jnp.sqrt(x * x + y * y)
    st = rho / r                     # sin(theta) >= 0
    # cos/sin of m*phi via atan2: at the pole (rho == 0) every m != 0 term
    # carries a st^m = 0 factor from the Legendre diagonal, and
    # atan2(0, 0) = 0 is finite, so no guard is needed (0 * finite = 0).
    phi = jnp.arctan2(y, x)
    L1 = lmax + 1
    marange = jnp.arange(L1, dtype=rdt)
    mphi = phi[:, None] * marange[None, :]              # (N, lmax+1)
    cosm, sinm = jnp.cos(mphi), jnp.sin(mphi)

    rows = _legendre_rows(lmax, ct, st)

    # full signed m axis: Y_l^{-m} = (-1)^m conj(Y_l^m)
    # -> re[-m] = (-1)^m re[m], im[-m] = -(-1)^m im[m]
    sign = jnp.asarray((-1.0) ** np.arange(1, L1), dtype=rdt)
    planes_re, planes_im = [], []
    for row in rows:
        pos_re = row * cosm                             # m = 0..lmax
        pos_im = row * sinm
        neg_re = sign * pos_re[:, 1:]
        neg_im = -sign * pos_im[:, 1:]
        planes_re.append(jnp.concatenate([neg_re[:, ::-1], pos_re], axis=1))
        planes_im.append(jnp.concatenate([neg_im[:, ::-1], pos_im], axis=1))
    return (jnp.stack(planes_re, axis=1),
            jnp.stack(planes_im, axis=1))   # 2 x (N, lmax+1, 2*lmax+1)


def ylm_all(lmax: int, pos: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Complex-assembling wrapper over :func:`ylm_all_ri` (tests/external
    callers; complex128 is host/CPU-only -- the TPU f64 path uses the real
    pairs directly)."""
    yre, yim = ylm_all_ri(lmax, pos, r)
    return yre + 1j * yim


def ylm_gradients_ri(lmax: int, ylms_ext_ri, r: jnp.ndarray):
    """Cartesian gradients of Y_l^m for l = 1..lmax as a REAL PAIR, from
    Y value pairs up to lmax+1.

    Args:
        ylms_ext_ri: (Yre, Yim), each (N, lmax+2, 2*(lmax+1)+1) from
            ylm_all_ri(lmax+1, ...)
        r: (N,) vector norms.
    Returns:
        two real arrays (N, lmax+1, 2*lmax+1, 3); the l = 0 slice is zero.

    Per l, the three covariant components come from SHIFTED SLICES of
    the extended Y planes with numpy coefficient vectors over the whole
    m axis -- no per-(l, m) scatter ops (see ylm_all_ri).  The covariant
    combinations are linear with REAL coefficients except
    dY/dy = i (xcov-1 + xcov+1)/sqrt(2), where the factor i swaps the
    pair: re(gy) = -im(xm + xp)/sqrt(2), im(gy) = re(xm + xp)/sqrt(2)."""
    Yre_ext, Yim_ext = ylms_ext_ri
    W = 2 * lmax + 1
    rdt = Yre_ext.dtype
    inv_r = (1.0 / r)[:, None]
    s2 = 1.0 / math.sqrt(2.0)
    # output m value at each column of the W-wide axis
    mv = np.arange(-lmax, lmax + 1, dtype=np.float64)

    planes_re, planes_im = [], []
    zero = jnp.zeros((Yre_ext.shape[0], W, 3), dtype=rdt)
    planes_re.append(zero)                              # l = 0
    planes_im.append(zero)
    for l in range(1, lmax + 1):
        in_l = np.abs(mv) <= l
        # x^0: coefficients for Y_{l+1}^m and Y_{l-1}^m (|m| <= l-1)
        c0a = np.where(in_l, -l * np.sqrt(
            np.maximum((l + 1.0) ** 2 - mv * mv, 0.0)
            / ((2 * l + 1) * (2 * l + 3))), 0.0)
        v = np.abs(mv) <= l - 1
        c0b = np.where(v, (l + 1) * np.sqrt(
            np.where(v, (l * l - mv * mv), 0.0)
            / ((2 * l - 1.0) * (2 * l + 1))), 0.0)
        # x^{+1}: Y_{l+1}^{m+1} and Y_{l-1}^{m+1} (|m+1| <= l-1)
        cpa = np.where(in_l, -l * np.sqrt(
            np.maximum((l + mv + 1) * (l + mv + 2), 0.0)
            / (2.0 * (2 * l + 1) * (2 * l + 3))), 0.0)
        vp = np.abs(mv + 1) <= l - 1
        cpb = np.where(vp, -(l + 1) * np.sqrt(
            np.where(vp, (l - mv - 1) * (l - mv), 0.0)
            / (2.0 * (2 * l - 1) * (2 * l + 1))), 0.0)
        # x^{-1}: Y_{l+1}^{m-1} and Y_{l-1}^{m-1} (|m-1| <= l-1)
        cma = np.where(in_l, -l * np.sqrt(
            np.maximum((l - mv + 1) * (l - mv + 2), 0.0)
            / (2.0 * (2 * l + 1) * (2 * l + 3))), 0.0)
        vm = np.abs(mv - 1) <= l - 1
        cmb = np.where(vm, -(l + 1) * np.sqrt(
            np.where(vm, (l + mv - 1) * (l + mv), 0.0)
            / (2.0 * (2 * l - 1) * (2 * l + 1))), 0.0)

        ca = jnp.asarray(c0a, dtype=rdt)
        cb = jnp.asarray(c0b, dtype=rdt)
        pa = jnp.asarray(cpa, dtype=rdt)
        pb = jnp.asarray(cpb, dtype=rdt)
        ma = jnp.asarray(cma, dtype=rdt)
        mb = jnp.asarray(cmb, dtype=rdt)

        out_l_re, out_l_im = [], []
        for Yext in (Yre_ext, Yim_ext):
            # extended planes: column Mid + q of Yext aligns with output
            # column mid + q via the slice offsets below (Mid - mid = 1)
            Yp = Yext[:, l + 1, :]                      # (N, W + 2)
            Ym = Yext[:, l - 1, :]
            x0 = (ca * Yp[:, 1:-1] + cb * Ym[:, 1:-1]) * inv_r
            xp = (pa * Yp[:, 2:] + pb * Ym[:, 2:]) * inv_r
            xm = (ma * Yp[:, :-2] + mb * Ym[:, :-2]) * inv_r
            out_l_re.append((s2 * (xm - xp), x0))       # gx, gz parts
            out_l_im.append(s2 * (xm + xp))             # gy pre-factor-i
        (gx_re, gz_re), (gx_im, gz_im) = out_l_re
        sum_re, sum_im = out_l_im
        # gy = i * s2 * (xm + xp):  re = -im(sum), im = +re(sum)
        gy_re, gy_im = -sum_im, sum_re
        planes_re.append(jnp.stack([gx_re, gy_re, gz_re], axis=-1))
        planes_im.append(jnp.stack([gx_im, gy_im, gz_im], axis=-1))
    return (jnp.stack(planes_re, axis=1),
            jnp.stack(planes_im, axis=1))   # 2 x (N, lmax+1, W, 3)


def ylm_gradients(lmax: int, ylms_ext: jnp.ndarray,
                  r: jnp.ndarray) -> jnp.ndarray:
    """Complex-assembling wrapper over :func:`ylm_gradients_ri` (accepts
    the complex extended planes of :func:`ylm_all`)."""
    gre, gim = ylm_gradients_ri(
        lmax, (jnp.real(ylms_ext), jnp.imag(ylms_ext)), r)
    return gre + 1j * gim
