r"""Complex spherical harmonics Y_l^m and Cartesian gradients, jittable.

Replaces scipy.special.sph_harm (gpr_calc/SO3.py:5,508-511,676-679) with
stable normalised associated-Legendre recurrences, fully vectorised over the
neighbour axis and unrolled over the (small, static) (l, m) index set.

Conventions match scipy:  Y_l^m(theta, phi) with theta = polar angle,
phi = azimuth;  Y_l^{-m} = (-1)^m conj(Y_l^m).

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


def ylm_all(lmax: int, pos: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """All Y_l^m for l = 0..lmax.

    Vectorised over the m axis: the l-recurrence advances whole
    (N, lmax+1) m-rows with numpy coefficient vectors, and the output is
    assembled by stacking -- no per-(l, m) scatter ops.  (The previous
    per-entry ``.at[].set`` unroll emitted ~(lmax+1)^2 scatters at trace
    time, which made lmax = 32 -- the reference's validated ceiling,
    SO3.py:67-97 -- effectively uncompilable.)

    Args:
        pos: (N, 3) vectors, r: (N,) their norms (caller guarantees r > 0).
    Returns:
        complex array (N, lmax+1, 2*lmax+1) indexed [n, l, lmax + m]
        (entries with |m| > l are zero).
    """
    # All numpy coefficient vectors below are pinned to the input's real
    # dtype: under jax_enable_x64 a bare jnp.asarray(np.float64) would
    # promote the complex planes to complex128, and TPU's x64 rewriter
    # has no f64 -> c128 expansion (hard compiler abort on-device; see
    # tests/test_so3.py::test_f32_descriptor_jaxpr_stays_f32).
    rdt = pos.dtype
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    ct = z / r                       # cos(theta)
    rho = jnp.sqrt(x * x + y * y)
    st = rho / r                     # sin(theta) >= 0
    # e^{i phi}; at the pole (rho == 0) sin(theta) == 0 kills every m != 0
    # term, so the azimuth value is irrelevant -- guard to avoid 0/0.
    safe = jnp.where(rho > 0, rho, 1.0)
    phase = (x + 1j * y) / safe
    eip = jnp.where(rho > 0, phase, jnp.asarray(1.0 + 0j, phase.dtype))

    L1 = lmax + 1
    m_idx = jnp.arange(L1)

    # normalised associated Legendre: Ptilde_l^m includes the full Y_lm
    # normalisation sqrt((2l+1)/(4pi) (l-m)!/(l+m)!).
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

    # e^{i m phi} powers, and the full signed m axis by conjugation
    E = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(eip)[:, None],
         jnp.broadcast_to(eip[:, None], (eip.shape[0], lmax))], axis=1),
        axis=1)                                         # (N, lmax+1)
    sign = jnp.asarray((-1.0) ** np.arange(1, L1), dtype=rdt)
    planes = []
    for row in rows:
        pos_m = row.astype(E.dtype) * E                 # m = 0..lmax
        neg_m = sign * jnp.conj(pos_m[:, 1:])           # m = 1..lmax
        planes.append(jnp.concatenate([neg_m[:, ::-1], pos_m], axis=1))
    return jnp.stack(planes, axis=1)        # (N, lmax+1, 2*lmax+1)


def ylm_gradients(lmax: int, ylms_ext: jnp.ndarray,
                  r: jnp.ndarray) -> jnp.ndarray:
    """Cartesian gradients of Y_l^m for l = 1..lmax from Y values up to
    lmax+1.

    Args:
        ylms_ext: (N, lmax+2, 2*(lmax+1)+1) from ylm_all(lmax+1, ...)
        r: (N,) vector norms.
    Returns:
        complex (N, lmax+1, 2*lmax+1, 3); the l = 0 slice is zero.

    Per l, the three covariant components come from SHIFTED SLICES of
    the extended Y planes with numpy coefficient vectors over the whole
    m axis -- no per-(l, m) scatter ops (see ylm_all)."""
    W = 2 * lmax + 1
    rdt = ylms_ext.real.dtype         # see ylm_all: no f64 -> c128 on TPU
    inv_r = (1.0 / r)[:, None]
    s2 = 1.0 / math.sqrt(2.0)
    # output m value at each column of the W-wide axis
    mv = np.arange(-lmax, lmax + 1, dtype=np.float64)

    planes = []
    zero = jnp.zeros((ylms_ext.shape[0], W, 3), dtype=ylms_ext.dtype)
    planes.append(zero)                                 # l = 0
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

        # extended planes: column Mid + q of ylms_ext aligns with output
        # column mid + q via the slice offsets below (Mid - mid = 1)
        Yp = ylms_ext[:, l + 1, :]                      # (N, W + 2)
        Ym = ylms_ext[:, l - 1, :]
        x0 = (jnp.asarray(c0a, dtype=rdt) * Yp[:, 1:-1]
              + jnp.asarray(c0b, dtype=rdt) * Ym[:, 1:-1]) * inv_r
        xp = (jnp.asarray(cpa, dtype=rdt) * Yp[:, 2:]
              + jnp.asarray(cpb, dtype=rdt) * Ym[:, 2:]) * inv_r
        xm = (jnp.asarray(cma, dtype=rdt) * Yp[:, :-2]
              + jnp.asarray(cmb, dtype=rdt) * Ym[:, :-2]) * inv_r
        gx = s2 * (xm - xp)
        gy = 1j * s2 * (xm + xp)
        planes.append(jnp.stack([gx, gy, x0], axis=-1))  # (N, W, 3)
    return jnp.stack(planes, axis=1)    # (N, lmax+1, W, 3)
