"""Distributed prediction harness -- the test_mpi.py equivalent
(reference examples/test_mpi.py:1-37).

Loads the bundled 100-structure pd4-RBF model, refits without optimisation,
runs repeated predictions and prints wall times.  Where the reference
launches `mpirun -np 8`, this program shards the kernel rows over whatever
jax.devices() exposes (a TPU mesh, or virtual CPU devices via
XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
from time import time

import jax

from gpr_calculator_tpu import GP
from gpr_calculator_tpu.io.ase_db import read_db
from gpr_calculator_tpu.parallel import make_mesh

# the mesh handle is what routes the kernel build through the sharded
# paths (GP(mesh=...)); without it the operands stay single-device
mesh = make_mesh() if len(jax.devices()) > 1 else None
t0 = time()
gpr = GP.load("/root/reference/examples/database/pd4-RBF.json", N_max=100,
              row_chunk=32,  # bound kernel-build memory at this scale
              mesh=mesh)
gpr.fit(opt=False, show=False)
print(f"Fit time: {time() - t0:.2f}s on {jax.devices()}")

struc = read_db("/root/reference/examples/database/pd4-RBF.db")[0]["atoms"]
for i in range(3):
    t1 = time()
    E, F, S, E_std, F_std = gpr.predict_structure(struc, stress=False,
                                                  return_std=True)
    print(f"predict #{i}: {time() - t1:.3f}s")

print(f"E: {E:.6f} eV")
print(f"E_std: {E_std:.6f} eV")
print(f"F: {F[-3:]}")
print(f"F_std: {F_std[-3:]}")
print(f"Total time: {time() - t0:.2f}s")
