from .gp import GP, CUR, new_pt, metric_values  # noqa
from .kernels import RBF, Dot, RBF_mb, Dot_mb, kernel_from_dict  # noqa
