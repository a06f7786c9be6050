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

import jax.numpy as jnp


def ylm_all(lmax: int, pos: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """All Y_l^m for l = 0..lmax.

    Args:
        pos: (N, 3) vectors, r: (N,) their norms (caller guarantees r > 0).
    Returns:
        complex array (N, lmax+1, 2*lmax+1) indexed [n, l, lmax + m]
        (entries with |m| > l are zero).
    """
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    ct = z / r                       # cos(theta)
    rho = jnp.sqrt(x * x + y * y)
    st = rho / r                     # sin(theta) >= 0
    # e^{i phi}; at the pole (rho == 0) sin(theta) == 0 kills every m != 0
    # term, so the azimuth value is irrelevant -- guard to avoid 0/0.
    safe = jnp.where(rho > 0, rho, 1.0)
    eip = jnp.where(rho > 0, (x + 1j * y) / safe, 1.0 + 0j)

    # normalised associated Legendre: Ptilde_l^m includes the full Y_lm
    # normalisation sqrt((2l+1)/(4pi) (l-m)!/(l+m)!)
    P = {}
    P[(0, 0)] = jnp.full_like(ct, 1.0 / math.sqrt(4.0 * math.pi))
    for m in range(1, lmax + 1):
        P[(m, m)] = (-math.sqrt((2 * m + 1) / (2.0 * m))
                     * st * P[(m - 1, m - 1)])
    for m in range(0, lmax):
        P[(m + 1, m)] = math.sqrt(2 * m + 3) * ct * P[(m, m)]
    for m in range(0, lmax + 1):
        for l in range(m + 2, lmax + 1):
            a = math.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = math.sqrt(((l - 1.0) ** 2 - m * m) /
                          (4.0 * (l - 1.0) ** 2 - 1.0))
            P[(l, m)] = a * (ct * P[(l - 1, m)] - b * P[(l - 2, m)])

    # assemble complex Y with e^{i m phi}
    eim = {0: jnp.ones_like(eip)}
    for m in range(1, lmax + 1):
        eim[m] = eim[m - 1] * eip

    N = pos.shape[0]
    out = jnp.zeros((N, lmax + 1, 2 * lmax + 1), dtype=jnp.complex128
                    if ct.dtype == jnp.float64 else jnp.complex64)
    mid = lmax
    for l in range(lmax + 1):
        for m in range(0, l + 1):
            ylm = P[(l, m)] * eim[m]
            out = out.at[:, l, mid + m].set(ylm)
            if m > 0:
                out = out.at[:, l, mid - m].set(((-1) ** m) * jnp.conj(ylm))
    return out


def ylm_gradients(lmax: int, ylms_ext: jnp.ndarray,
                  r: jnp.ndarray) -> jnp.ndarray:
    """Cartesian gradients of Y_l^m for l = 1..lmax from Y values up to
    lmax+1.

    Args:
        ylms_ext: (N, lmax+2, 2*(lmax+1)+1) from ylm_all(lmax+1, ...)
        r: (N,) vector norms.
    Returns:
        complex (N, lmax+1, 2*lmax+1, 3); the l = 0 slice is zero.
    """
    N = ylms_ext.shape[0]
    Mid = lmax + 1            # centre of the extended m axis
    mid = lmax                # centre of the output m axis
    out = jnp.zeros((N, lmax + 1, 2 * lmax + 1, 3), dtype=ylms_ext.dtype)
    inv_r = 1.0 / r
    s2 = 1.0 / math.sqrt(2.0)

    for l in range(1, lmax + 1):
        for m in range(-l, l + 1):
            x0 = (-math.sqrt(((l + 1) ** 2 - m * m)
                             / ((2 * l + 1) * (2 * l + 3))) * l
                  * ylms_ext[:, l + 1, Mid + m] * inv_r)
            if abs(m) <= l - 1:
                x0 = x0 + (math.sqrt((l * l - m * m)
                                     / ((2 * l - 1.0) * (2 * l + 1)))
                           * (l + 1) * ylms_ext[:, l - 1, Mid + m] * inv_r)

            xp = (-math.sqrt((l + m + 1) * (l + m + 2)
                             / (2.0 * (2 * l + 1) * (2 * l + 3))) * l
                  * ylms_ext[:, l + 1, Mid + m + 1] * inv_r)
            if abs(m + 1) <= l - 1:
                xp = xp - (math.sqrt((l - m - 1) * (l - m)
                                     / (2.0 * (2 * l - 1) * (2 * l + 1)))
                           * (l + 1) * ylms_ext[:, l - 1, Mid + m + 1] * inv_r)

            xm = (-math.sqrt((l - m + 1) * (l - m + 2)
                             / (2.0 * (2 * l + 1) * (2 * l + 3))) * l
                  * ylms_ext[:, l + 1, Mid + m - 1] * inv_r)
            if abs(m - 1) <= l - 1:
                xm = xm - (math.sqrt((l + m - 1) * (l + m)
                                     / (2.0 * (2 * l - 1) * (2 * l + 1)))
                           * (l + 1) * ylms_ext[:, l - 1, Mid + m - 1] * inv_r)

            gx = s2 * (xm - xp)
            gy = 1j * s2 * (xm + xp)
            gz = x0
            out = out.at[:, l, mid + m, 0].set(gx)
            out = out.at[:, l, mid + m, 1].set(gy)
            out = out.at[:, l, mid + m, 2].set(gz)
    return out
