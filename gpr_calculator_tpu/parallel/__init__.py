from .mesh import make_mesh, shard_train_data, ROW_AXIS  # noqa
