"""Kernel hyperparameter containers (API parity with gpr_calc/kernels/
RBF_mb.py:7-60 and Dot_mb.py:5-43; the math lives in ops/kernels.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config


class _BlockAPI:
    """Reference kernel-layer block API: ``k_total`` / ``k_total_with_grad``
    / ``k_total_with_stress`` / ``diag`` (RBF_mb.py:62-229,
    Dot_mb.py:45-173), served by this framework's packed builders
    (ops/kernels.py) instead of per-block MPI row splits + C++ loops.

    ``data`` is the point-list layout GP stores (``GP.get_train_x``):
    ``{"energy": [(x, ele), ...], "force": [(x, dxdr, ele), ...]}`` with
    x (Ni, d) and dxdr (Ni, d, 3) (9 columns when rdxdr stress terms are
    appended).  Rows/cols are ordered [energies..., 3 rows per force
    point...] like the reference's build_covariance (kernels/base.py:3-30).
    Returns numpy arrays in the session dtype.
    """

    def _pack(self, data):
        from ..ops.packing import pack_energy, pack_force
        energy_pts = [(np.asarray(p[0], float), np.asarray(p[-1], int))
                      for p in data.get("energy", [])]
        force_pts = [(np.asarray(p[0], float), np.asarray(p[1], float),
                      np.asarray(p[-1], int))
                     for p in data.get("force", [])]
        if energy_pts:
            d = energy_pts[0][0].shape[1]
        elif force_pts:
            d = force_pts[0][0].shape[1]
        else:
            raise ValueError("empty data: need energy or force points")
        ncart = force_pts[0][1].shape[2] if force_pts else 3
        e = pack_energy(energy_pts, d=d)
        f = pack_force(force_pts, d=d, ncart=ncart)
        return e, f, len(energy_pts), len(force_pts), ncart

    @staticmethod
    def _real_rows(n_e, m_e, n_f, ncart):
        # pack_* emits one dummy padded point for an empty side; slice the
        # assembled block back to the real rows (absent blocks are simply
        # dropped, like build_covariance's None branches)
        return np.r_[np.arange(n_e), m_e + np.arange(ncart * n_f)]

    def k_total(self, data1, data2=None, f_tol=1e-10, tol=None):
        """Block covariance [[K_EE, K_EF], [K_FE, K_FF]]
        (RBF_mb.k_total, RBF_mb.py:135-171; Dot_mb.py:87-119).
        data2=None computes the symmetric self covariance."""
        from ..ops import kernels as K_ops
        e1, f1, n_e1, n_f1, nc1 = self._pack(data1)
        params = self.jax_params()
        if data2 is None:
            K = np.asarray(K_ops.k_self(e1, f1, params, self.kind,
                                        self.zeta))
            r = self._real_rows(n_e1, e1.ele.shape[0], n_f1, nc1)
            return K[np.ix_(r, r)]
        e2, f2, n_e2, n_f2, nc2 = self._pack(data2)
        K = np.asarray(K_ops.k_block(e1, f1, e2, f2, params, self.kind,
                                     self.zeta))
        r = self._real_rows(n_e1, e1.ele.shape[0], n_f1, nc1)
        c = self._real_rows(n_e2, e2.ele.shape[0], n_f2, nc2)
        return K[np.ix_(r, c)]

    def k_total_with_grad(self, data1, f_tol=1e-10):
        """(C, dC) with dC = dstack(dC/d(sigma), dC/d(second param))
        (RBF_mb.k_total_with_grad, RBF_mb.py:173-204 -- second param l;
        Dot_mb.py:121-148 -- second param sigma0).  Both derivatives are
        ANALYTIC: dK/dsigma = 2K/sigma; RBF's dK/dl rides the fused dual
        (K, dK/dgamma) pass with dgamma/dl = -1/l^3; Dot's dK/dsigma0
        is the energy-block pair-count kernel (ops/kernels.count_ee)."""
        from ..ops import kernels as K_ops
        e1, f1, n_e1, n_f1, nc1 = self._pack(data1)
        params = self.jax_params()
        if self.kind == "rbf":
            K, dK_dgamma = K_ops.k_self_dual(e1, f1, params, self.zeta)
            K = np.asarray(K)
            C2 = np.asarray(dK_dgamma) * (-1.0 / self.l ** 3)
        else:
            K = np.asarray(K_ops.k_self(e1, f1, params, self.kind,
                                        self.zeta))
            C2 = np.zeros_like(K)
            m_e = e1.ele.shape[0]
            W = np.asarray(K_ops.count_ee(e1))
            C2[:m_e, :m_e] = (self.sigma ** 2) * 2.0 * self.sigma0 * W
        C_s = (2.0 / self.sigma) * K
        r = self._real_rows(n_e1, e1.ele.shape[0], n_f1, nc1)
        ix = np.ix_(r, r)
        return K[ix], np.dstack((C_s[ix], C2[ix]))

    def k_total_with_stress(self, data1, data2, tol=1e-10):
        """(C, C_stress) for serving with virial rows
        (RBF_mb.k_total_with_stress, RBF_mb.py:206-229).  data1's force
        points must carry 9 cartesian columns (dxdr with the rdxdr
        stress terms appended, as GP.predict_structure builds them); the
        SAME kff/kef builders produce all 9 rows per point and the split
        here peels rows 3..9 into C_stress.  Sign convention: raw kernel
        rows (the reference's too -- its stress chain is marked obsolete
        and never sign-validated); GP.predict_structure negates to the
        ASE convention."""
        from ..ops import kernels as K_ops
        e1, f1, n_e1, n_f1, nc1 = self._pack(data1)
        if n_f1 and nc1 != 9:
            raise ValueError(
                "stress build needs 9-column force points (dxdr with "
                "appended rdxdr stress terms, cf. GP.predict_structure)")
        e2, f2, n_e2, n_f2, nc2 = self._pack(data2)
        params = self.jax_params()
        full = np.asarray(K_ops.k_block(e1, f1, e2, f2, params, self.kind,
                                        self.zeta))
        c = self._real_rows(n_e2, e2.ele.shape[0], n_f2, nc2)
        full = full[:, c]
        m_e = e1.ele.shape[0]
        e_rows = full[:n_e1]
        ncols = full.shape[1]
        # explicit column count: reshape(-1) cannot be resolved for an
        # energy-only data1 (n_f1 == 0, size-0 array)
        f_blocks = full[m_e:m_e + 9 * n_f1].reshape(n_f1, 9, ncols)
        C = np.concatenate(
            [e_rows, f_blocks[:, :3].reshape(3 * n_f1, ncols)], axis=0)
        C_stress = f_blocks[:, 3:].reshape(6 * n_f1, ncols)
        return C, C_stress

    def diag(self, data):
        """Self-variance diagonal: one entry per energy point, then 3 (or
        9) per force point (RBF_mb.diag, RBF_mb.py:62-133 -- which routes
        force diags through full per-point kff calls; here they are
        closed-form vmapped blocks, ops/kernels.diag_force)."""
        from ..ops import kernels as K_ops
        e, f, n_e, n_f, ncart = self._pack(data)
        params = self.jax_params()
        out = []
        if n_e:
            out.append(np.asarray(K_ops.diag_energy(
                e, params, self.kind, self.zeta))[:n_e])
        if n_f:
            df = np.asarray(K_ops.diag_force(f, params, self.kind,
                                             self.zeta))[:n_f]
            out.append(df.reshape(-1))
        return np.concatenate(out)


class RBF(_BlockAPI):
    r"""k(x1, x2) = sigma^2 exp(-(1 - (x1^.x2^)^zeta) / (2 l^2))."""

    name = "RBF"

    def __init__(self, para=(1.0, 1.0), bounds=((1e-2, 5e1), (1e-1, 1e1)),
                 zeta=2, device="tpu", ncpu=1):
        self.bounds = [list(b) for b in bounds]
        self.update(list(para))
        self.zeta = int(zeta)
        self.device = device

    def __str__(self):
        return "{:.5f}**2 *RBF({:.5f})".format(self.sigma, self.l)

    def update(self, para):
        self.sigma, self.l = float(para[0]), float(para[1])

    def parameters(self):
        return [self.sigma, self.l]

    def jax_params(self):
        dt = config.dtype()
        return {"sigma": jnp.asarray(self.sigma, dt),
                "l": jnp.asarray(self.l, dt)}

    @staticmethod
    def params_from_theta(theta):
        return {"sigma": theta[0], "l": theta[1]}

    @property
    def kind(self):
        return "rbf"

    def save_dict(self):
        return {"name": self.name, "sigma": self.sigma, "l": self.l,
                "zeta": self.zeta, "bounds": self.bounds}

    def load_from_dict(self, d):
        self.sigma, self.l = d["sigma"], d["l"]
        self.zeta = int(d["zeta"])
        self.bounds = d["bounds"]


class Dot(_BlockAPI):
    r"""k(x1, x2) = sigma^2 (sigma0^2 + (x1^.x2^)^zeta)."""

    name = "Dot"

    def __init__(self, para=(1.0, 1.0), bounds=((1e-2, 5e1), (1e-2, 1e1)),
                 zeta=3, device="tpu", ncpu=1):
        self.bounds = [list(b) for b in bounds]
        self.update(list(para))
        self.zeta = int(zeta)
        self.device = device

    def __str__(self):
        return "{:.3f}**2 *Dot({:.3f})".format(self.sigma, self.sigma0)

    def update(self, para):
        self.sigma, self.sigma0 = float(para[0]), float(para[1])

    def parameters(self):
        return [self.sigma, self.sigma0]

    def jax_params(self):
        dt = config.dtype()
        return {"sigma": jnp.asarray(self.sigma, dt),
                "sigma0": jnp.asarray(self.sigma0, dt)}

    @staticmethod
    def params_from_theta(theta):
        return {"sigma": theta[0], "sigma0": theta[1]}

    @property
    def kind(self):
        return "dot"

    def save_dict(self):
        return {"name": self.name, "sigma": self.sigma,
                "sigma0": self.sigma0, "zeta": self.zeta,
                "bounds": self.bounds}

    def load_from_dict(self, d):
        self.sigma, self.sigma0 = d["sigma"], d["sigma0"]
        self.zeta = int(d["zeta"])
        self.bounds = d["bounds"]


# reference-compatible aliases (RBF_mb / Dot_mb are the upstream class names)
RBF_mb = RBF
Dot_mb = Dot


def kernel_from_dict(d):
    name = d.get("name", "RBF")
    if name in ("RBF", "RBF_mb"):
        k = RBF()
    elif name in ("Dot", "Dot_mb"):
        k = Dot()
    else:
        raise NotImplementedError(f"unknown kernel {name}")
    k.load_from_dict(d)
    return k
