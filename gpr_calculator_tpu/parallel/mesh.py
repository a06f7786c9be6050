"""Device-mesh construction and data sharding for multi-chip kernel builds.

Replaces the reference's MPI decompositions P1-P10 (SURVEY.md section 2):
the kernel-matrix row blocks that mpi4py gathered/broadcast
(gpr_calc/kernels/RBF_mb.py:257-524) become a row-sharded env axis under
XLA's SPMD partitioner -- the collectives ride ICI and the Cholesky result
is implicitly replicated (no bcast, gaussianprocess.py:305-306).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.packing import EnergyData, ForceData

ROW_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def _pad_points_to(f: ForceData, multiple: int) -> ForceData:
    import jax.numpy as jnp
    m = f.m
    m_new = ((m + multiple - 1) // multiple) * multiple
    if m_new == m:
        return f
    pad = m_new - m
    return ForceData(
        x=jnp.pad(f.x, ((0, pad), (0, 0), (0, 0))),
        dxdr=jnp.pad(f.dxdr, ((0, pad), (0, 0), (0, 0), (0, 0))),
        ele=jnp.pad(f.ele, ((0, pad), (0, 0))),
        nreal=f.nreal,
    )


def shard_train_data(e: EnergyData, f: ForceData, mesh: Mesh):
    """Place the training blocks on the mesh: the force-point axis (the
    large one -- kernel rows) is sharded, the energy block is replicated."""
    n = mesh.devices.size
    f = _pad_points_to(f, n)
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(ROW_AXIS))
    e = EnergyData(
        x=jax.device_put(e.x, rep), ele=jax.device_put(e.ele, rep),
        counts=jax.device_put(e.counts, rep),
        nreal=jax.device_put(e.nreal, rep))
    f = ForceData(
        x=jax.device_put(f.x, row), dxdr=jax.device_put(f.dxdr, row),
        ele=jax.device_put(f.ele, row), nreal=jax.device_put(f.nreal, rep))
    return e, f
