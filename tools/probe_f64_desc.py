"""Timing + accuracy of the f64 descriptor ON the accelerator (real-pair
Ylm + narrow-range Bessel under XLA's f64 emulation) vs the host-CPU
exile.  Run on the real chip: python tools/probe_f64_desc.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from gpr_calculator_tpu.io.ase_db import read_db
from gpr_calculator_tpu.ops.so3 import SO3


def run(tag, so3, atoms, n=3):
    t0 = time.time()
    d = so3.calculate(atoms, dtype=np.float64)
    cold = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        d = so3.calculate(atoms, dtype=np.float64)
        ts.append(time.time() - t0)
    print(f"# {tag}: cold {cold:.2f}s warm {min(ts):.3f}s")
    return d


def main():
    rows = read_db("/root/reference/examples/database/pd4-RBF.db")
    atoms = rows[0]["atoms"]
    so3 = SO3(nmax=3, lmax=4, rcut=5.0, alpha=2.0, derivative=True)
    print(f"# backend: {jax.default_backend()}")

    d_dev = run("f64 on-device", so3, atoms)

    os.environ["GPR_CALC_TPU_F64_DESC"] = "host"
    d_host = run("f64 host exile", so3, atoms)
    os.environ.pop("GPR_CALC_TPU_F64_DESC")

    for k in ("x", "dxdr"):
        a, b = np.asarray(d_dev[k]), np.asarray(d_host[k])
        scale = np.abs(b).max()
        print(f"# {k}: max abs diff {np.abs(a - b).max():.3e} "
              f"(scale {scale:.3e}, rel {np.abs(a - b).max() / scale:.3e})")


if __name__ == "__main__":
    main()
