"""Kernel hyperparameter containers (API parity with gpr_calc/kernels/
RBF_mb.py:7-60 and Dot_mb.py:5-43; the math lives in ops/kernels.py)."""
from __future__ import annotations

import jax.numpy as jnp

from .. import config


class RBF:
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


class Dot:
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
