from .mesh import make_mesh, shard_train_data, ROW_AXIS  # noqa
from .sharded_kernels import kff_pallas_sharded, kef_pallas_sharded  # noqa
