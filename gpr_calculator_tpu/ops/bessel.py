r"""Modified spherical Bessel functions i_l(z), jittable and overflow-free.

The reference uses scipy.special.spherical_in (gpr_calc/SO3.py:5,564-566),
which is neither jittable nor safe for large z (i_l(z) ~ e^z / 2z).  We
compute the *scaled* functions

    b_l(z)  = e^{-z} i_l(z)          (bounded in [0, 1])
    db_l(z) = e^{-z} i_l'(z)

via Miller's downward recurrence (numerically stable for every z and l,
unlike the upward recurrence which loses all precision for z < l),
normalised with the closed form  b_0(z) = (1 - e^{-2z}) / (2z).

The descriptor layer (ops/so3.py) folds the e^{+z} back into the radial
integrand as exp(-alpha (r - q)^2), so no large intermediates ever appear --
a strict numerical improvement over the reference, which materialises raw
i_l values up to e^{2 alpha rcut^2} (SO3.py:480,492).

Derivative relation (same as scipy's):  i_l' = i_{l-1} - (l+1)/z i_l,
i_0' = i_1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_in(lmax: int, z: jnp.ndarray, n_extra: int = 16):
    """Return (b, db): e^{-z} i_l(z) and e^{-z} i_l'(z), shapes z.shape+(lmax+1,).

    Safe at z == 0 (returns the exact limits b_l(0) = delta_{l0},
    db_l(0) = delta_{l1} / 3 scaled... i_l'(0) = 1/3 for l=1 else 0 for l>1,
    i_0'(0) = 0).
    """
    zshape = z.shape
    zf = z.reshape(-1)
    small = zf < 1e-12
    zsafe = jnp.where(small, 1.0, zf)

    # Miller downward recurrence: f_{l-1} = f_{l+1} + (2l+1)/z f_l.
    # Start above lmax; the unnormalised sequence is proportional to b_l.
    lstart = lmax + n_extra
    fp = jnp.zeros_like(zsafe)          # f_{l+1}
    fc = jnp.full_like(zsafe, 1e-30)    # f_l
    outs = [None] * (lmax + 1)
    for l in range(lstart, 0, -1):
        fm = fp + (2 * l + 1) / zsafe * fc
        if l - 1 <= lmax:
            outs[l - 1] = fm
        fp, fc = fc, fm
        # periodic renormalisation to avoid overflow of the unnormalised seq
        scale = jnp.where(jnp.abs(fm) > 1e250, 1e-250, 1.0)
        fp = fp * scale
        fc = fc * scale
        outs = [None if o is None else o * scale for o in outs]
        if l - 1 <= lmax and outs[l - 1] is not None:
            pass
    # f_{lmax} downwards may not have been captured if lstart == lmax
    b = jnp.stack(outs, axis=-1)        # unnormalised, (N, lmax+1)
    b0_exact = (1.0 - jnp.exp(-2.0 * zsafe)) / (2.0 * zsafe)
    b = b * (b0_exact / b[..., 0])[..., None]

    # derivative: i_l' = i_{l-1} - (l+1)/z i_l  (l >= 1);  i_0' = i_1
    ls = jnp.arange(1, lmax + 1)
    db_hi = b[..., :-1] - (ls + 1) / zsafe[..., None] * b[..., 1:]
    if lmax >= 1:
        db0 = b[..., 1:2]
    else:
        # need i_1 for i_0': recompute from recurrence f_0 = f_2 + 3/z f_1
        db0 = (b0_exact - jnp.cosh(zsafe) * jnp.exp(-zsafe) / zsafe)[..., None]
        db0 = -db0  # i_1 = (z cosh z - sinh z)/z^2, scaled
    db = jnp.concatenate([db0, db_hi], axis=-1) if lmax >= 1 else db0

    # z -> 0 limits: b_l(0) = delta_{l0}; i_l'(0) = 1/3 for l == 1 else 0
    l_idx = jnp.arange(lmax + 1)
    b = jnp.where(small[..., None], (l_idx == 0).astype(b.dtype), b)
    db = jnp.where(small[..., None], (l_idx == 1).astype(b.dtype) / 3.0, db)

    return b.reshape(*zshape, lmax + 1), db.reshape(*zshape, lmax + 1)
