r"""SO(3) power-spectrum descriptor, TPU-native.

Re-implements the reference descriptor (gpr_calc/SO3.py) as a jitted JAX
program over a padded neighbour-pair list:

  p_{n1 n2 l}(i) = Re sum_m c_{n1 l m}(i) conj(c_{n2 l m}(i)),  n1 >= n2

  c_{nlm}(i) = 4 pi sum_{j in N(i)} w_j f_cut(r_ij) Y_lm(r_ij^)
               * e^{-alpha r^2} Integral_0^rcut q^2 g_n(q) e^{-alpha q^2}
                 i_l(2 alpha r q) dq

with the radial integral evaluated by Gauss-Chebyshev quadrature
(SO3.py:446-453) and g_n built from the W overlap matrix (SO3.py:417-444).

TPU-first differences from the reference:
  * scaled Bessels: the integrand is computed as
    G0_n(q) * exp(-alpha (r-q)^2) * e^{-z} i_l(z), z = 2 alpha r q, so no
    e^{+z}-sized intermediates appear (the reference materialises raw i_l,
    SO3.py:480,564).  Mathematically identical.
  * everything after the host-built neighbour list is one jitted program:
    Bessel/Ylm recurrences, the einsum chain (SO3.py:640-727), pair->seq
    segment sums, and the translation-invariance self rows (SO3.py:266-273).
  * the MPI decompositions P6/P7 (SO3.py:229-296,537-600) are replaced by
    data parallelism over the pair axis inside XLA.

The outputs match the reference dict contract exactly:
  {'x': (natoms, ncoef), 'dxdr': (nseq, ncoef, 3), 'rdxdr': (nseq, ncoef, 3, 3)
   or None, 'elements': [str], 'seq': (nseq, 2)}
with dxdr[s] = dP(center i_s)/dr_{j_s} and the (i, i) rows carrying
-sum_{j != i} dP_i/dr_j (SO3.py:270-273).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..atoms.atoms import CHEMICAL_SYMBOLS
from .bessel import scaled_in
from .sph import ylm_all_ri, ylm_gradients_ri


# ---------------------------------------------------------------------------
# static radial machinery (host, NumPy -- tiny)
# ---------------------------------------------------------------------------

def W_matrix(nmax: int) -> np.ndarray:
    """Symmetric orthonormalisation of the (rcut - r)^(a+2) radial basis
    (S^{-1/2} of the overlap matrix, SO3.py:417-430)."""
    S = np.zeros((nmax, nmax))
    for a in range(1, nmax + 1):
        ta = (2 * a + 5) * (2 * a + 6) * (2 * a + 7)
        for b in range(1, a + 1):
            tb = (2 * b + 5) * (2 * b + 6) * (2 * b + 7)
            S[a - 1, b - 1] = math.sqrt(ta * tb) / (
                (5 + a + b) * (6 + a + b) * (7 + a + b))
            S[b - 1, a - 1] = S[a - 1, b - 1]
    sinv = np.linalg.inv(S)
    eigvals, V = np.linalg.eig(sinv)
    return (V @ np.diag(np.sqrt(eigvals)) @ np.linalg.inv(V)).real


def gauss_chebyshev(nmax: int, lmax: int):
    """Chebyshev nodes and the uniform weight pi/N (SO3.py:446-453)."""
    N = (nmax + lmax + 1) * 10
    i = np.arange(1, N + 1)
    return np.cos((2 * i - 1) * np.pi / (2 * N)), np.pi / N


def radial_quadrature(nmax: int, lmax: int, rcut: float, alpha: float):
    """Quadrature nodes q, and G0[n, j] = w_j q^2 g_n(q) sqrt(1-x^2)
    WITHOUT the e^{-alpha q^2} factor (folded into the pair Gaussian)."""
    gc, w = gauss_chebyshev(nmax, lmax)
    w = w * rcut / 2.0
    q = rcut / 2.0 * (gc + 1.0)
    Wm = W_matrix(nmax)
    # phi_a(q) = (rcut-q)^(a+2) / sqrt(2 rcut^(2a+7) / ((2a+5)(2a+6)(2a+7)))
    phis = np.stack([
        (rcut - q) ** (a + 2)
        / math.sqrt(2 * rcut ** (2 * a + 7)
                    / ((2 * a + 5) * (2 * a + 6) * (2 * a + 7)))
        for a in range(1, nmax + 1)
    ])  # (nmax, NQ)
    g = Wm @ phis                                   # (nmax, NQ)
    G0 = g * (q ** 2) * np.sqrt(1.0 - gc ** 2) * w  # (nmax, NQ)
    return q, G0


# ---------------------------------------------------------------------------
# cutoff functions (SO3.py:409-415; only 'cosine' is implemented in the
# reference -- the other names there resolve to absent symbols)
# ---------------------------------------------------------------------------

def cosine_cutoff(r, rcut, derivative=False):
    if derivative:
        return -0.5 * jnp.pi / rcut * jnp.sin(jnp.pi * r / rcut)
    return 0.5 * (jnp.cos(jnp.pi * r / rcut) + 1.0)


CUTOFFS = {"cosine": cosine_cutoff}


# ---------------------------------------------------------------------------
# jitted core
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("nmax", "lmax", "natoms", "nseq", "derivative",
                     "stress", "cutoff", "narrow_range"))
def _so3_core(rij, weights, pair_center, pair_seq, pair_Ri, pair_Rj,
              self_seq, self_ids, seq_center, q, G0,
              *, nmax: int, lmax: int, natoms: int, nseq: int,
              rcut: float, alpha: float, derivative: bool, stress: bool,
              cutoff: str, narrow_range: bool = False):
    """One device program: pair c/dc -> per-centre power spectrum + grads.

    Shapes (P = padded pair count):
      rij (P,3), weights (P,), pair_center (P,), pair_seq (P,),
      pair_Ri/Rj (P,3) absolute positions, self_seq (n_sel,) seq row of
      (i,i) and self_ids (n_sel,) the atom index of each (a subset call
      has n_sel < natoms -- center_tot is indexed by ATOM, self rows by
      selection), seq_center (nseq,) centre of each seq row, q (NQ,),
      G0 (nmax,NQ)

    Complex-free: the Ylm factors are carried as (re, im) REAL PAIRS
    (ops/sph.py), and every conjugated product here only needs REAL
    parts (P = c conj(c), dP = dc conj(ctot) + h.c.), so each complex
    einsum is two real einsums.  This is what lets the f64 descriptor
    run ON an accelerator (no f64 -> c128 conversion exists there);
    narrow_range must then be True so the Bessel recurrences stay inside
    the f32 exponent range of XLA's f64-as-f32-pairs emulation.
    """
    fdt = rij.dtype
    # rcut/alpha often arrive as numpy f64 scalars, which are NOT weakly
    # typed: left alone they promote the whole radial/Bessel chain to
    # f64 inside the f32 serving program (emulated f64 on TPU, and one
    # step from the fatal f64->c128 convert the x64 rewriter rejects).
    rcut = jnp.asarray(rcut, fdt)
    alpha = jnp.asarray(alpha, fdt)
    P = rij.shape[0]
    NQ = q.shape[0]
    ncoef = nmax * (nmax + 1) // 2 * (lmax + 1)
    cut_fn = CUTOFFS[cutoff]

    r = jnp.sqrt(jnp.sum(rij * rij, axis=1))
    valid = weights != 0
    rs = jnp.where(valid, r, 1.0)
    u = rij / rs[:, None]

    # scaled radial integrand: E[p, j] = exp(-alpha (r - q_j)^2)
    E = jnp.exp(-alpha * (rs[:, None] - q[None, :]) ** 2)
    z = 2.0 * alpha * rs[:, None] * q[None, :]
    lmax_b = lmax
    b, db = scaled_in(lmax_b, z,
                      narrow_range=narrow_range)     # (P, NQ, lmax+1)

    # I~[p, n, l] = sum_j G0[n, j] E[p, j] b[p, j, l]
    Eb = E[:, :, None] * b
    I = jnp.einsum("nj,pjl->pnl", G0.astype(fdt), Eb)

    # angular part
    norm_l = jnp.sqrt(2.0 * jnp.sqrt(2.0) * jnp.pi
                      / jnp.sqrt(2.0 * jnp.arange(lmax + 1, dtype=fdt) + 1.0))
    fourpi = 4.0 * jnp.pi
    fcut = cut_fn(rs, rcut)

    if not derivative:
        Yre, Yim = ylm_all_ri(lmax, u, jnp.ones_like(rs))  # unit vecs, r=1
        # c[p, n, l, m] = 4pi fcut w Y I~ norm_l  (linear in Y: re/im alike)
        pref_nd = (fourpi * (weights * fcut))[:, None, None, None] \
            * I[:, :, :, None] * norm_l[None, None, :, None]
        c_re = pref_nd * Yre[:, None, :, :]
        c_im = pref_nd * Yim[:, None, :, :]
        ctot_re = jax.ops.segment_sum(
            c_re, pair_center, num_segments=natoms + 1)[:natoms]
        ctot_im = jax.ops.segment_sum(
            c_im, pair_center, num_segments=natoms + 1)[:natoms]
        # Re[ctot conj(ctot)] = re.re + im.im
        Pfull = (jnp.einsum("anlm,aklm->ankl", ctot_re, ctot_re)
                 + jnp.einsum("anlm,aklm->ankl", ctot_im, ctot_im))
        tri = np.tril_indices(nmax)
        x = Pfull[:, tri[0], tri[1], :].reshape(natoms, ncoef)
        return x, None, None

    # derivative path: Y to lmax+1 for the gradient recurrence
    Yext_ri = ylm_all_ri(lmax + 1, u, jnp.ones_like(rs))
    mid_ext = lmax + 1
    Yre = Yext_ri[0][:, :lmax + 1, mid_ext - lmax: mid_ext + lmax + 1]
    Yim = Yext_ri[1][:, :lmax + 1, mid_ext - lmax: mid_ext + lmax + 1]
    dYre, dYim = ylm_gradients_ri(lmax, Yext_ri, rs)  # (P, lmax+1, 2l+1, 3)

    # dI~/dr [p, n, l] = sum_j G0 E (2 alpha q db - 2 alpha r b)
    dEb = E[:, :, None] * (2.0 * alpha * q[None, :, None] * db
                           - 2.0 * alpha * rs[:, None, None] * b)
    dIdr = jnp.einsum("nj,pjl->pnl", G0.astype(fdt), dEb)

    wvalid = weights * valid
    pref = fourpi * wvalid                            # (P,)
    dfcut = cut_fn(rs, rcut, derivative=True)
    dfu = (dfcut[:, None] * u)[:, None, None, None, :]

    # c / dc are LINEAR in (Y, dY): build each real component once.
    # c0 (no cutoff): 4pi w Y I~ ;  dc0 = 4pi w (dY I~ + Y u dI~/dr)
    def c_dc(Ypart, dYpart):
        c0 = pref[:, None, None, None] * I[:, :, :, None] \
            * Ypart[:, None, :, :]
        dc0 = (pref[:, None, None, None, None]
               * (dYpart[:, None, :, :, :] * I[:, :, :, None, None]
                  + Ypart[:, None, :, :, None] * u[:, None, None, None, :]
                  * dIdr[:, :, :, None, None]))
        dc = dc0 * fcut[:, None, None, None, None] + c0[..., None] * dfu
        c = c0 * fcut[:, None, None, None] * norm_l[None, None, :, None]
        dc = dc * norm_l[None, None, :, None, None]
        return c, dc

    c_re, dc_re = c_dc(Yre, dYre)
    c_im, dc_im = c_dc(Yim, dYim)

    ctot_re = jax.ops.segment_sum(
        c_re, pair_center, num_segments=natoms + 1)[:natoms]
    ctot_im = jax.ops.segment_sum(
        c_im, pair_center, num_segments=natoms + 1)[:natoms]

    # power spectrum per centre: Re[ctot conj(ctot)] = re.re + im.im
    Pfull = (jnp.einsum("anlm,aklm->ankl", ctot_re, ctot_re)
             + jnp.einsum("anlm,aklm->ankl", ctot_im, ctot_im))
    tri = np.tril_indices(nmax)
    x = Pfull[:, tri[0], tri[1], :].reshape(natoms, ncoef)

    # per-pair dP[p, n, k, l, d] = dc[p,n,l,m,d] conj(ctot[i_p,k,l,m]) + h.c.
    # Only Re[A] survives the + h.c.:  dP = Re[A] + swap_nk(Re[A]), with
    # Re[A] = dc_re.ctot_re + dc_im.ctot_im
    idx_i = jnp.minimum(pair_center, natoms - 1)
    A_re = (jnp.einsum("pnlmd,pklm->pnkld", dc_re, ctot_re[idx_i])
            + jnp.einsum("pnlmd,pklm->pnkld", dc_im, ctot_im[idx_i]))
    dP = A_re + jnp.swapaxes(A_re, 1, 2)              # (P, n, k, l, 3)
    dP = dP * valid[:, None, None, None, None]
    dP_tri = dP[:, tri[0], tri[1], :, :].reshape(P, ncoef, 3)

    # seq accumulation + translation-invariance self rows (SO3.py:261-273)
    dxdr = jax.ops.segment_sum(dP_tri, pair_seq, num_segments=nseq + 1)[:nseq]
    center_tot = jax.ops.segment_sum(
        dxdr, seq_center, num_segments=natoms + 1)[:natoms]
    dxdr = dxdr.at[self_seq].add(-center_tot[self_ids])

    rdxdr = None
    if stress:
        # pstress[(i,j)] -= sum_w Rj (x) dP_w ; [(i,i)] += sum_{w in i} Ri(x)dP
        # index order (coef, cart_n=R, cart_m=grad) -> stored as (ncoef,3,3),
        # matching the reference's 'wn,wijkm->wijknm' layout (SO3.py:298-303)
        rdPj = jnp.einsum("pn,pcm->pcnm", pair_Rj, dP_tri)
        pstress = -jax.ops.segment_sum(
            rdPj, pair_seq, num_segments=nseq + 1)[:nseq]
        rdPi = jnp.einsum("pn,pcm->pcnm", pair_Ri, dP_tri)
        rdPi_center = jax.ops.segment_sum(
            rdPi, pair_center, num_segments=natoms + 1)[:natoms]
        pstress = pstress.at[self_seq].add(rdPi_center[self_ids])
        rdxdr = pstress  # caller applies the -1/vol (SO3.py:306)

    return x, dxdr, rdxdr


def _f64_descriptor_on_host() -> bool:
    """True when f64 descriptor programs should be exiled to the host CPU
    backend instead of running (emulated) on the accelerator.

    Historically mandatory: the complex Ylm chain aborted the TPU
    compiler (no f64 -> c128 expansion) and the wide-range Miller seeds
    NaN'd under the f32-exponent-range f64 emulation.  Both are gone --
    the core is complex-free (real Ylm pairs, ops/sph.py) and the Bessel
    recurrences take narrow_range -- so the default is now ON-DEVICE
    (measured ~25x faster than the 1-core host at pd4 scale).
    GPR_CALC_TPU_F64_DESC=host restores the exile (debug/parity)."""
    import os
    return os.environ.get("GPR_CALC_TPU_F64_DESC", "device") == "host"


def _descriptor_device(dt):
    """Device context for the descriptor program: default placement
    (accelerator) unless the f64 host exile is requested via
    GPR_CALC_TPU_F64_DESC=host."""
    import contextlib
    if dt == jnp.float64 and jax.default_backend() != "cpu" \
            and _f64_descriptor_on_host():
        try:
            return jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            return contextlib.nullcontext()
    return contextlib.nullcontext()


# ---------------------------------------------------------------------------
# host-facing descriptor class
# ---------------------------------------------------------------------------

class SO3:
    """Drop-in equivalent of gpr_calc.SO3.SO3 (constructor contract
    SO3.py:23-34, validation SO3.py:67-174)."""

    def __init__(self, nmax: int = 3, lmax: int = 3, rcut: float = 3.5,
                 alpha: float = 2.0, derivative: bool = True,
                 stress: bool = False, cutoff_function: str = "cosine",
                 weight_on: bool = False):
        if not isinstance(nmax, int) or not (1 <= nmax <= 11):
            raise ValueError("nmax must be an integer in [1, 11]")
        if not isinstance(lmax, int) or not (0 <= lmax <= 32):
            raise ValueError("lmax must be an integer in [0, 32]")
        if rcut <= 0:
            raise ValueError("rcut must be positive")
        if alpha <= 0:
            raise ValueError("alpha must be positive")
        if cutoff_function not in CUTOFFS:
            raise NotImplementedError(
                f"cutoff function {cutoff_function!r} not implemented")
        if stress and not derivative:
            raise ValueError(
                "stress=True requires derivative=True (the rdxdr strain "
                "terms are built from the gradient chain)")
        self.nmax = nmax
        self.lmax = lmax
        self.rcut = float(rcut)
        self.alpha = float(alpha)
        self.derivative = derivative
        self.stress = stress
        self.cutoff_function = cutoff_function
        self.weight_on = weight_on
        self._type = "SO3"
        # keep the quadrature constants at full f64 (numpy) and cast per
        # call: storing them truncated to the CONSTRUCTION-time
        # config.dtype() would silently poison a later f64 calculate()
        # on a descriptor built under f32 config (measured 4.9e-7
        # relative error on an 'exact f64' result)
        q, G0 = radial_quadrature(nmax, lmax, self.rcut, self.alpha)
        self._q = np.asarray(q, np.float64)
        self._G0 = np.asarray(G0, np.float64)

    # -- persistence (SO3.py:45-65) --
    def save_dict(self):
        return {"nmax": self.nmax, "lmax": self.lmax, "rcut": self.rcut,
                "alpha": self.alpha, "derivative": self.derivative,
                "stress": self.stress, "_type": "SO3"}

    @classmethod
    def from_dict(cls, d):
        return cls(nmax=d["nmax"], lmax=d["lmax"], rcut=d["rcut"],
                   alpha=d["alpha"], derivative=d.get("derivative", True),
                   stress=d.get("stress", False))

    def load_from_dict(self, d):
        self.__init__(nmax=d["nmax"], lmax=d["lmax"], rcut=d["rcut"],
                      alpha=d["alpha"], derivative=d.get("derivative", True),
                      stress=d.get("stress", False))

    @property
    def ncoef(self) -> int:
        return self.nmax * (self.nmax + 1) // 2 * (self.lmax + 1)

    def __str__(self):
        return (f"SO3 descriptor with Cutoff: {self.rcut:6.3f} "
                f"lmax: {self.lmax:d}, nmax: {self.nmax:d}, "
                f"alpha: {self.alpha:.3f}\n")

    def clear_memory(self):
        """API parity with SO3.clear_memory (SO3.py:176-184).

        The reference caches per-structure neighbour/coefficient arrays
        on the instance and this call frees them; here per-structure
        state never lives on the instance (calculate() is functional and
        the jitted core owns its buffers), so only the precomputed
        quadrature constants remain -- which the reference also keeps."""
        return

    # -- main API (mirrors SO3.calculate, SO3.py:186-323) --
    def calculate(self, atoms, atom_ids=None, use_mpi: bool = False,
                  dtype=None):
        out = self.calculate_device(atoms, atom_ids, dtype=dtype,
                                    use_mpi=use_mpi)
        nseq = out["nseq"]
        return {
            "x": np.asarray(out["x"]),
            "dxdr": None if out["dxdr"] is None
            else np.asarray(out["dxdr"])[:nseq],
            "rdxdr": None if out["rdxdr"] is None
            else np.asarray(out["rdxdr"])[:nseq],
            "elements": out["elements"],
            "seq": out["seq"],
        }

    def _prep_structure(self, atoms, atom_ids=None):
        """Host-side neighbour/seq prep for ONE structure, UNPADDED.

        Returns raw numpy arrays ready for offset-concatenation
        (:meth:`calculate_many`) or single-structure padding
        (:meth:`calculate_device`): pair arrays (rij, w, pair_center,
        pair_seq, Ri, Rj) with pair_seq = -1 for pairs whose center is
        outside ``atom_ids`` (callers map -1 to their garbage segment),
        self rows (self_seq, self_ids), seq metadata (seq, nseq) and the
        structure's natoms/elements.
        """
        from ..atoms.neighborlist import neighbor_pairs

        positions = np.asarray(atoms.positions, float)
        numbers = np.asarray(atoms.numbers, int)
        natoms = len(numbers)
        if atom_ids is None:
            atom_ids = list(range(natoms))

        pi, pj, rij = neighbor_pairs(atoms, self.rcut)

        # atomic weights: neighbour Z, negated for unlike species when
        # weight_on (SO3.py:381-385)
        w = numbers[pj].astype(float)
        if self.weight_on:
            w = np.where(numbers[pj] != numbers[pi], -w, w)

        # seq construction (SO3.py:389-404), vectorised: seq rows are the
        # unique (center i, neighbour-or-self j) pairs in (i, j)
        # lexicographic order -- identical to the reference's
        # per-atom-sorted loop for ascending atom_ids (the only order
        # callers use); encoding pairs as i*(natoms+1)+j makes the
        # row ids one np.unique + searchsorted (the python dict loop
        # costs ~80 ms/call at 216-atom pd4 scale, on the serving path)
        ids_arr = np.asarray(atom_ids, np.int64)
        if len(ids_arr) > 1 and np.any(np.diff(ids_arr) <= 0):
            raise ValueError(
                "atom_ids must be strictly ascending (the seq rows are "
                "ordered by center atom, SO3.py:389-404)")
        stride = natoms + 1
        key_pairs = pi.astype(np.int64) * stride + pj
        key_self = ids_arr * stride + ids_arr
        if len(ids_arr) == natoms:
            in_sel = None
            keys = np.concatenate([key_pairs, key_self])
        else:
            in_sel = np.isin(pi, ids_arr)
            keys = np.concatenate([key_pairs[in_sel], key_self])
        uniq = np.unique(keys)
        seq = np.stack([uniq // stride, uniq % stride], axis=1)
        nseq = len(seq)
        pair_seq = np.searchsorted(uniq, key_pairs).astype(np.int32)
        if in_sel is not None:
            # pairs whose center is outside atom_ids carry no seq row:
            # route them to the dropped garbage segment (the reference's
            # dict lookup would KeyError here; subset calls never hit it)
            pair_seq = np.where(in_sel, pair_seq, -1).astype(np.int32)
        self_seq = np.searchsorted(uniq, key_self).astype(np.int32)
        Ri = positions[pi]
        Rj = Ri + rij
        elements = list(getattr(atoms, "symbols", [])) or [
            CHEMICAL_SYMBOLS[int(zz)] for zz in numbers]
        return {
            "rij": rij, "w": w, "pair_center": pi.astype(np.int32),
            "pair_seq": pair_seq, "Ri": Ri, "Rj": Rj,
            "self_seq": self_seq,
            "self_ids": ids_arr.astype(np.int32),
            "seq": seq, "nseq": nseq, "natoms": natoms,
            "elements": elements,
        }

    def calculate_device(self, atoms, atom_ids=None, use_mpi: bool = False,
                         dtype=None):
        """Device-resident descriptor (the serving fast path).

        Same math as :meth:`calculate`, but the output arrays stay jax
        device buffers so a downstream jitted pack/predict program can
        gather from them without a device->host->device round trip per
        NEB/MD step (SURVEY 7(e)).  Contract:

          x     (natoms, ncoef) jax
          dxdr  (nseq_pad, ncoef, 3) jax -- rows >= nseq are ZERO (the
                seq axis is bucket-padded), so nseq is a safe zero row
                for gather padding
          rdxdr (nseq_pad, ncoef, 3, 3) jax or None, already scaled by
                -1/volume (the reference's convention, SO3.py:306)
          seq   (nseq, 2) host numpy; 'elements' list; 'nseq' int
        """
        del use_mpi  # parallelism is handled by XLA sharding, not MPI
        prep = self._prep_structure(atoms, atom_ids)
        natoms, nseq, seq = prep["natoms"], prep["nseq"], prep["seq"]

        # bucket the seq axis so the jitted core is reused as the neighbour
        # topology fluctuates along a trajectory
        from .packing import bucket_size
        nseq_pad = bucket_size(nseq, multiple=16)
        pair_seq = np.where(prep["pair_seq"] < 0, nseq_pad,
                            prep["pair_seq"]).astype(np.int32)
        seq_center = np.concatenate([
            seq[:, 0], np.full(nseq_pad - nseq, natoms)]).astype(np.int32)

        # pad the pair axis to a bucket for shape reuse
        P = len(pair_seq)
        P_pad = bucket_size(max(P, 1), multiple=64)
        pad = P_pad - P
        rij_p = np.concatenate(
            [prep["rij"], np.tile([[1.0, 0, 0]], (pad, 1))])
        w_p = np.concatenate([prep["w"], np.zeros(pad)])
        pc_p = np.concatenate([prep["pair_center"],
                               np.full(pad, natoms, np.int32)])
        ps_p = np.concatenate([pair_seq, np.full(pad, nseq_pad, np.int32)])
        Ri = np.concatenate([prep["Ri"], np.zeros((pad, 3))])
        Rj = Ri + rij_p
        self_seq, ids_arr = prep["self_seq"], prep["self_ids"]

        dt = jnp.dtype(dtype) if dtype is not None else config.dtype()
        # The core is complex-free (real Ylm pairs), so f64 runs
        # ON-DEVICE under XLA's f64-as-f32-pairs emulation; narrow_range
        # keeps the Bessel recurrences inside the emulation's f32
        # exponent range.  GPR_CALC_TPU_F64_DESC=host restores the old
        # host-CPU exile (native f64, ~25x slower on a 1-core host).
        narrow = (dt == jnp.float64 and jax.default_backend() != "cpu"
                  and not _f64_descriptor_on_host())
        with _descriptor_device(dt):
            x, dxdr, pstress = _so3_core(
                jnp.asarray(rij_p, dt), jnp.asarray(w_p, dt),
                jnp.asarray(pc_p), jnp.asarray(ps_p),
                jnp.asarray(Ri, dt), jnp.asarray(Rj, dt),
                jnp.asarray(self_seq),
                jnp.asarray(ids_arr.astype(np.int32)),
                jnp.asarray(seq_center),
                jnp.asarray(self._q, dt), jnp.asarray(self._G0, dt),
                nmax=self.nmax, lmax=self.lmax, natoms=natoms,
                nseq=nseq_pad, rcut=self.rcut, alpha=self.alpha,
                derivative=self.derivative, stress=self.stress,
                cutoff=self.cutoff_function, narrow_range=narrow)

        out = {
            "x": x,
            "dxdr": dxdr,
            "elements": prep["elements"],
            "seq": seq if self.derivative else None,
            "nseq": nseq,
        }
        if self.stress and pstress is not None:
            vol = atoms.get_volume()
            out["rdxdr"] = -pstress / vol
        else:
            out["rdxdr"] = None
        return out

    def _default_pair_budget(self) -> int:
        """Pairs per batched-ingest device call.

        On an accelerator the derivative-path per-pair intermediates
        (dc: (P, nmax, lmax+1, 2lmax+1, 3)) materialise with the 3-wide
        cart axis LANE-PADDED to 128 (measured on chip: a 317k-pair pd4
        batch staged one 39 GB copy = ~123 KB/pair = ~0.9 KB per
        (n, l, m) plane per pair), so the budget is derived from the
        descriptor geometry against an HBM allowance
        (GPR_CALC_TPU_INGEST_BUDGET bytes, default 4e9).  Host CPU has
        no lane padding: a flat generous cap applies."""
        if jax.default_backend() == "cpu" or not self.derivative:
            return 262144
        per_pair = 1024 * self.nmax * (self.lmax + 1) * (2 * self.lmax + 1)
        budget = float(os.environ.get("GPR_CALC_TPU_INGEST_BUDGET", 4e9))
        return max(4096, int(budget / per_pair))

    def calculate_many(self, atoms_list, dtype=None,
                       pair_budget: int = None):
        """Batched training-side descriptor ingest: ONE ``_so3_core``
        device program per GROUP of structures instead of one per
        structure (replaces the reference's MPI scatter over ranks, P8,
        gaussianprocess.py:726-821 -- here the batch axis is the
        concatenated pair/seq list with per-structure atom and seq-row
        offsets, which the core's segment_sums handle natively).

        Returns a list of host dicts matching :meth:`calculate`
        (x, dxdr, rdxdr, elements, seq), one per input structure.

        ``pair_budget`` bounds the pairs per device call (default: the
        geometry-aware memory model, _default_pair_budget); groups are
        closed when exceeding it, so arbitrarily long databases stream
        through a few compiled shapes (all batch axes are
        bucket-padded).
        """
        from .packing import bucket_size

        if pair_budget is None:
            pair_budget = self._default_pair_budget()
        preps = [self._prep_structure(atoms) for atoms in atoms_list]
        # greedy grouping under the pair budget (>= 1 structure/group)
        groups, cur, cur_pairs = [], [], 0
        for i, p in enumerate(preps):
            npairs = len(p["pair_seq"])
            if cur and cur_pairs + npairs > pair_budget:
                groups.append(cur)
                cur, cur_pairs = [], 0
            cur.append(i)
            cur_pairs += npairs
        if cur:
            groups.append(cur)

        dt = jnp.dtype(dtype) if dtype is not None else config.dtype()
        narrow = (dt == jnp.float64 and jax.default_backend() != "cpu"
                  and not _f64_descriptor_on_host())
        out = [None] * len(preps)
        # ONE compiled shape for the whole call: every group is padded
        # to the bucketed maxima over groups (cold compiles through the
        # remote TPU compiler cost tens of seconds EACH -- per-group
        # shapes made a 100-structure pd4 load spend ~8 min compiling)
        natoms_pad = bucket_size(max(
            sum(preps[i]["natoms"] for i in g) for g in groups),
            multiple=16)
        nseq_pad = bucket_size(max(
            sum(preps[i]["nseq"] for i in g) for g in groups),
            multiple=64)
        P_shared = bucket_size(max(
            1, max(sum(len(preps[i]["pair_seq"]) for i in g)
                   for g in groups)), multiple=256)
        for grp in groups:
            ps = [preps[i] for i in grp]
            natoms_tot = sum(p["natoms"] for p in ps)
            nseq_tot = sum(p["nseq"] for p in ps)
            ao = np.cumsum([0] + [p["natoms"] for p in ps])
            so = np.cumsum([0] + [p["nseq"] for p in ps])
            rij = np.concatenate([p["rij"] for p in ps])
            w = np.concatenate([p["w"] for p in ps])
            pc = np.concatenate(
                [p["pair_center"] + ao[k] for k, p in enumerate(ps)])
            # full-selection ingest: no -1 (out-of-selection) entries
            pseq = np.concatenate(
                [p["pair_seq"] + so[k] for k, p in enumerate(ps)])
            Ri = np.concatenate([p["Ri"] for p in ps])
            self_seq = np.concatenate(
                [p["self_seq"] + so[k] for k, p in enumerate(ps)])
            self_ids = np.concatenate(
                [p["self_ids"] + ao[k] for k, p in enumerate(ps)])
            seq_center = np.concatenate(
                [p["seq"][:, 0] + ao[k] for k, p in enumerate(ps)]
                + [np.full(nseq_pad - nseq_tot, natoms_pad)]
            ).astype(np.int32)

            P = len(pc)
            pad = P_shared - P
            rij_p = np.concatenate([rij, np.tile([[1.0, 0, 0]], (pad, 1))])
            w_p = np.concatenate([w, np.zeros(pad)])
            pc_p = np.concatenate(
                [pc, np.full(pad, natoms_pad, np.int32)]).astype(np.int32)
            ps_p = np.concatenate(
                [pseq, np.full(pad, nseq_pad, np.int32)]).astype(np.int32)
            Ri_p = np.concatenate([Ri, np.zeros((pad, 3))])
            Rj_p = Ri_p + rij_p

            with _descriptor_device(dt):
                x, dxdr, pstress = _so3_core(
                    jnp.asarray(rij_p, dt), jnp.asarray(w_p, dt),
                    jnp.asarray(pc_p), jnp.asarray(ps_p),
                    jnp.asarray(Ri_p, dt), jnp.asarray(Rj_p, dt),
                    jnp.asarray(self_seq.astype(np.int32)),
                    jnp.asarray(self_ids.astype(np.int32)),
                    jnp.asarray(seq_center),
                    jnp.asarray(self._q, dt), jnp.asarray(self._G0, dt),
                    nmax=self.nmax, lmax=self.lmax, natoms=natoms_pad,
                    nseq=nseq_pad, rcut=self.rcut, alpha=self.alpha,
                    derivative=self.derivative, stress=self.stress,
                    cutoff=self.cutoff_function, narrow_range=narrow)
            x = np.asarray(x)
            dxdr = None if dxdr is None else np.asarray(dxdr)
            pstress = None if pstress is None else np.asarray(pstress)
            for k, i in enumerate(grp):
                p = ps[k]
                d = {
                    "x": x[ao[k]:ao[k] + p["natoms"]],
                    "dxdr": None if dxdr is None
                    else dxdr[so[k]:so[k] + p["nseq"]],
                    "elements": p["elements"],
                    "seq": p["seq"] if self.derivative else None,
                }
                if self.stress and pstress is not None:
                    vol = atoms_list[i].get_volume()
                    d["rdxdr"] = -pstress[so[k]:so[k] + p["nseq"]] / vol
                else:
                    d["rdxdr"] = None
                out[i] = d
        return out


