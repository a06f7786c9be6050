"""gpr_calculator_tpu -- a TPU-native on-the-fly GPR force-field framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
MaterSim/GPR_calculator: an SO(3) power-spectrum descriptor, RBF/Dot
many-body GPR kernels, an uncertainty-dispatched hybrid calculator, and an
NEB workload driver -- plus a standalone atoms/optimizer/IO stack so the
framework runs without ASE (and interoperates with ASE artifacts when
present).
"""
from . import config  # noqa: F401  (must be first: enables x64)

__version__ = "0.1.0"
