"""gpr_calculator_tpu -- a TPU-native on-the-fly GPR force-field framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
MaterSim/GPR_calculator: an SO(3) power-spectrum descriptor, RBF/Dot
many-body GPR kernels, an uncertainty-dispatched hybrid calculator, and an
NEB workload driver -- plus a standalone atoms/optimizer/IO stack so the
framework runs without ASE (and interoperates with ASE artifacts when
present).
"""
from . import config  # noqa: F401  (must be first: enables x64)

from .models.gp import GP  # noqa: E402
from .models.kernels import RBF, Dot, RBF_mb, Dot_mb  # noqa: E402
from .ops.so3 import SO3  # noqa: E402
from .calculator import GPR  # noqa: E402
from .atoms import Atoms, FixAtoms  # noqa: E402
from .calculators import EMT, LJ, get_vasp  # noqa: E402
from .neb import neb_calc, get_images, plot_path, plot_progress  # noqa: E402
from .mep import NEB  # noqa: E402
from .optimize import BFGS, FIRE  # noqa: E402

__version__ = "0.1.0"
__all__ = [
    "GP", "GPR", "SO3", "RBF", "Dot", "RBF_mb", "Dot_mb", "Atoms",
    "FixAtoms", "EMT", "LJ", "get_vasp", "neb_calc", "get_images",
    "plot_path", "plot_progress", "NEB", "BFGS", "FIRE",
]
