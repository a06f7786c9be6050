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


def _miller(lmax: int, z, n_extra: int = 40, lstart: int = None,
            narrow_range: bool = False):
    assert n_extra >= 1, "Miller recurrence needs >= 1 guard index"
    if lstart is None:
        lstart = lmax + n_extra
    # dtype-aware seed/renormalisation bounds (1e-280 underflows in f32).
    # narrow_range: f64 EMULATED on an accelerator is a double-f32 pair
    # whose exponent range is float32's (~1e+-38) -- the f64 constants
    # there NaN exactly like raw f32 would; Miller's normalisation makes
    # the seed/rescale magnitudes arbitrary, so the narrow constants cost
    # no accuracy (1 ulp per rescale, and scale factors cancel in the
    # final b0 normalisation).
    if z.dtype == jnp.float32 or narrow_range:
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


def scaled_in(lmax: int, z: jnp.ndarray, n_extra: int = 40,
              narrow_range: bool = False):
    """Return (b, db): e^{-z} i_l(z) and e^{-z} i_l'(z) for l = 0..lmax,
    shapes z.shape + (lmax + 1,).  Exact limits at z == 0.

    narrow_range=True keeps every intermediate within float32's exponent
    range: REQUIRED when an f64 program will execute on an accelerator,
    where XLA emulates f64 as f32 pairs and the wide-range Miller
    seeds/rescales NaN.  Accuracy cost: the small-z series cutover moves
    from 1e-12 to 1e-6 (first-order-limit error ~z^2/2 = 5e-13 absolute
    there, below the emulation's own ~2^-49 arithmetic)."""
    zshape = z.shape
    zf = z.reshape(-1)
    # f32 needs a much wider small-z guard: below ~4e-7 a single Miller
    # step's (2l+1)/z growth can jump past float32 range BETWEEN the
    # renormalisation checks (measured: all-NaN output for z in
    # (1e-12, 2e-8]); the first-order limits below are accurate to
    # ~machine eps at these cutoffs
    narrow = z.dtype == jnp.float32 or narrow_range
    z_cut = 1e-6 if narrow else 1e-12
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
                          lstart=int(z_switch) + n_extra,
                          narrow_range=narrow_range))

    # derivative: i_l' = i_{l-1} - (l+1)/z i_l  (l >= 1);  i_0' = i_1
    if lmax >= 1:
        ls = jnp.arange(1, lmax + 1)
        db_hi = b[..., :-1] - (ls + 1) / zsafe[..., None] * b[..., 1:]
        db = jnp.concatenate([b[..., 1:2], db_hi], axis=-1)
    else:
        _, b1 = _b01(zsafe)
        db = b1[..., None]

    # z -> 0 limits through the l = 2 leading terms (the delta_{l0}
    # limit leaves a ~z absolute error at the cutoff, and the narrow
    # cutoff at 1e-6 makes db_2 = 2z/15 ~ 1.3e-7 visible):
    # b = [1-z, z/3 - z^2/3, z^2/15, 0...],
    # db = [z/3 - z^2/3, 1/3 - z/3, 2z/15, 0...]
    l_idx = jnp.arange(lmax + 1)
    zc = zf[..., None]
    b1_lim = zc / 3.0 * (1.0 - zc)
    b_lim = jnp.where(l_idx == 0, 1.0 - zc,
                      jnp.where(l_idx == 1, b1_lim,
                                jnp.where(l_idx == 2, zc * zc / 15.0,
                                          0.0)))
    db_lim = jnp.where(l_idx == 0, b1_lim,
                       jnp.where(l_idx == 1, (1.0 - zc) / 3.0,
                                 jnp.where(l_idx == 2, 2.0 * zc / 15.0,
                                           0.0)))

    b = jnp.where(small[..., None], b_lim.astype(b.dtype), b)
    db = jnp.where(small[..., None], db_lim.astype(b.dtype), db)

    return b.reshape(*zshape, lmax + 1), db.reshape(*zshape, lmax + 1)
