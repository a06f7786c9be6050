r"""Modified spherical Bessel functions i_l(z), jittable and overflow-free.

The reference uses scipy.special.spherical_in (gpr_calc/SO3.py:5,564-566),
which is neither jittable nor safe for large z (i_l(z) ~ e^z / 2z).  We
compute the *scaled* functions

    b_l(z)  = e^{-z} i_l(z)          (bounded in [0, 1])
    db_l(z) = e^{-z} i_l'(z)

The descriptor layer (ops/so3.py) folds the e^{+z} back into the radial
integrand as exp(-alpha (r - q)^2), so no large intermediates ever appear --
a strict numerical improvement over the reference, which materialises raw
i_l values up to e^{2 alpha rcut^2} (SO3.py:480,492).

Stability: the three-term recurrence b_{l+1} = b_{l-1} - (2l+1)/z b_l has
i_l as its dominant solution downward and k_l as its dominant solution
upward *only when z < l*; for z >= l both directions are tame but the
downward (Miller) normalisation loses accuracy because i_l k_l ~ 1/(2z) is
nearly l-independent.  We therefore use

  * upward recurrence from the closed forms
        b_0 = (1 - e^{-2z}) / (2z)
        b_1 = (z (1 + e^{-2z}) - (1 - e^{-2z})) / (2 z^2)
    wherever z >= lmax + 1 (contamination decays there), and
  * Miller's downward recurrence with 40 guard indices wherever
    z < lmax + 1 (decay per step >= (2 lmax + 3)/(lmax + 1) ~ 2).

Both branches are evaluated vectorised and selected per element.

Derivative relation (same as scipy's):  i_l' = i_{l-1} - (l+1)/z i_l,
i_0' = i_1.
"""
from __future__ import annotations

import jax.numpy as jnp


def _b01(z):
    em = jnp.exp(-2.0 * z)
    # expm1 keeps b0 exact at small z ((1 - e^{-2z}) loses ~eps/2z
    # relative accuracy -- 6% at z=1e-6 in f32, and it normalises EVERY
    # Miller output)
    b0 = -jnp.expm1(-2.0 * z) / (2.0 * z)
    b1_formula = (z * (1.0 + em) - (1.0 - em)) / (2.0 * z * z)
    # the closed form cancels catastrophically for small z (numerator
    # ~2z^3/3 from O(z) terms: measured 1% relative error at z=1e-2 in
    # f32); switch to the series b1 = z/3 (1 - z + 3z^2/5 - 4z^3/15)
    z2 = z * z
    b1_series = z / 3.0 * (1.0 - z + 0.6 * z2 - (4.0 / 15.0) * z2 * z
                           + (2.0 / 21.0) * z2 * z2)
    # dtype-dependent switch at the error crossover (series truncation
    # ~z^5/35 vs the formula's measured ~2e-14/z^2 (f64) / ~1e-5/z^2
    # (f32) cancellation error)
    b1_cut = 0.3 if z.dtype == jnp.float32 else 0.02
    b1 = jnp.where(z < b1_cut, b1_series, b1_formula)
    return b0, b1


def _upward(lmax: int, z):
    b0, b1 = _b01(z)
    seq = [b0, b1]
    for l in range(1, lmax):
        seq.append(seq[l - 1] - (2 * l + 1) / z * seq[l])
    return jnp.stack(seq[: lmax + 1], axis=-1)


def _miller(lmax: int, z, n_extra: int = 40, lstart: int = None):
    assert n_extra >= 1, "Miller recurrence needs >= 1 guard index"
    if lstart is None:
        lstart = lmax + n_extra
    # dtype-aware seed/renormalisation bounds (1e-280 underflows in f32)
    if z.dtype == jnp.float32:
        tiny, big, small = 1e-30, 1e30, 1e-30
    else:
        tiny, big, small = 1e-280, 1e250, 1e-250
    fp = jnp.zeros_like(z)
    fc = jnp.full_like(z, tiny)
    outs = [None] * (lmax + 1)
    for l in range(lstart, 0, -1):
        fm = fp + (2 * l + 1) / z * fc
        if l - 1 <= lmax:
            outs[l - 1] = fm
        fp, fc = fc, fm
        # keep the unnormalised sequence in range (branches must carry
        # z.dtype: a literal-vs-literal where is f64 under x64 and would
        # silently promote the whole recurrence)
        scale = jnp.where(jnp.abs(fm) > big,
                          jnp.asarray(small, z.dtype),
                          jnp.asarray(1.0, z.dtype))
        fp = fp * scale
        fc = fc * scale
        outs = [None if o is None else o * scale for o in outs]
    b = jnp.stack(outs, axis=-1)
    b0_exact, _ = _b01(z)
    return b * (b0_exact / b[..., 0])[..., None]


def scaled_in(lmax: int, z: jnp.ndarray, n_extra: int = 40):
    """Return (b, db): e^{-z} i_l(z) and e^{-z} i_l'(z) for l = 0..lmax,
    shapes z.shape + (lmax + 1,).  Exact limits at z == 0."""
    zshape = z.shape
    zf = z.reshape(-1)
    # f32 needs a much wider small-z guard: below ~4e-7 a single Miller
    # step's (2l+1)/z growth can jump past float32 range BETWEEN the
    # renormalisation checks (measured: all-NaN output for z in
    # (1e-12, 2e-8]); the first-order limits below are accurate to
    # ~machine eps at these cutoffs
    z_cut = 1e-6 if z.dtype == jnp.float32 else 1e-12
    small = zf < z_cut
    zsafe = jnp.where(small, 1.0, zf)

    # upward recurrence is stable only for z comfortably ABOVE the
    # order: at z ~ lmax the contamination grows exponentially with
    # lmax (measured f64 error vs scipy at z = lmax+1, l = lmax:
    # 3e-10 at lmax=16, 3e-7 at 24, 4e-4 at 32 with the old
    # z_switch = lmax+1).  Switch at 2*lmax+2 and extend Miller's
    # start order past the largest z it now covers (downward
    # recurrence needs lstart above the turning point ~z).
    z_switch = float(2 * lmax + 2)
    use_up = zsafe >= z_switch
    z_up = jnp.maximum(zsafe, z_switch)    # clamp so the inactive branch
    z_dn = jnp.minimum(zsafe, z_switch)    # stays finite
    b = jnp.where(use_up[..., None], _upward(lmax, z_up),
                  _miller(lmax, z_dn, n_extra,
                          lstart=int(z_switch) + n_extra))

    # derivative: i_l' = i_{l-1} - (l+1)/z i_l  (l >= 1);  i_0' = i_1
    if lmax >= 1:
        ls = jnp.arange(1, lmax + 1)
        db_hi = b[..., :-1] - (ls + 1) / zsafe[..., None] * b[..., 1:]
        db = jnp.concatenate([b[..., 1:2], db_hi], axis=-1)
    else:
        _, b1 = _b01(zsafe)
        db = b1[..., None]

    # z -> 0 limits to FIRST order (the plain delta_{l0} limit leaves a
    # ~z absolute error at the f32 cutoff): b = [1-z, z/3, 0...],
    # db = [z/3, 1/3, 0...]
    l_idx = jnp.arange(lmax + 1)
    b_lim = jnp.where(l_idx == 0, 1.0 - zf[..., None],
                      jnp.where(l_idx == 1, zf[..., None] / 3.0, 0.0))
    third = jnp.asarray(1.0 / 3.0, zf.dtype)   # literal-vs-literal where
    db_lim = jnp.where(l_idx == 0, zf[..., None] / 3.0,   # is f64 under
                       jnp.where(l_idx == 1, third, 0.0))  # x64

    b = jnp.where(small[..., None], b_lim.astype(b.dtype), b)
    db = jnp.where(small[..., None], db_lim.astype(b.dtype), db)

    return b.reshape(*zshape, lmax + 1), db.reshape(*zshape, lmax + 1)
