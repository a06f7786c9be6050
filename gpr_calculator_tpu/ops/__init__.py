from . import packing, kernels  # noqa: F401
