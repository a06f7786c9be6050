"""Multi-chip wrappers for the fused Pallas covariance kernels.

The XLA kernel path scales out under plain GSPMD (mesh row-sharding,
parallel/mesh.py): XLA partitions the matmuls and inserts the ICI
collectives itself, replacing the reference's MPI row splits P1-P5
(gpr_calc/kernels/RBF_mb.py:257-524).  Pallas kernels are opaque to the
GSPMD partitioner, so their multi-chip form is explicit data parallelism
via shard_map: each device runs the rectangular kernel on its stripe of
lhs points against the full (replicated) rhs, and the row-sharded output
needs no collective at all -- exactly the reference's P3 decomposition,
minus the gather/bcast (the result STAYS sharded for the downstream
sharded Cholesky/solve).

Validated on the 8-way virtual CPU mesh in interpret mode
(tests/test_sharded_pallas.py); on hardware the same code runs the
compiled kernels per chip.
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.packing import ForceData
from .mesh import ROW_AXIS


def _shard_map(fn, mesh, in_specs, out_specs):
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def kff_pallas_sharded(f: ForceData, params, mesh, zeta: int = 2,
                       interpret: bool = False,
                       mm_precision: str | None = None):
    """(3 m, 3 m) self force-force block, rows sharded over ``mesh``.

    The point axis must divide the mesh size (shard_train_data pads it).
    Each shard computes its (m/n_dev, m) stripe with the rectangular
    fused kernel; output row-sharding matches kernel-row layouts
    downstream.
    """
    from ..ops.kff_pallas import kff_pallas

    n_dev = mesh.devices.size
    assert f.x.shape[0] % n_dev == 0, (
        f"force points {f.x.shape[0]} must divide the mesh ({n_dev}); "
        "pad with parallel.shard_train_data")

    f_specs = ForceData(x=P(ROW_AXIS), dxdr=P(ROW_AXIS), ele=P(ROW_AXIS),
                        nreal=P())
    full_specs = ForceData(x=P(), dxdr=P(), ele=P(), nreal=P())

    def stripe(f1_block: ForceData, f2_full: ForceData):
        return kff_pallas(f1_block, f2_full, params, zeta=zeta,
                          interpret=interpret, mm_precision=mm_precision)

    fn = _shard_map(stripe, mesh, in_specs=(f_specs, full_specs),
                    out_specs=P(ROW_AXIS))
    f_rep = jax.device_put(f, NamedSharding(mesh, P()))
    f_row = ForceData(
        x=jax.device_put(f.x, NamedSharding(mesh, P(ROW_AXIS))),
        dxdr=jax.device_put(f.dxdr, NamedSharding(mesh, P(ROW_AXIS))),
        ele=jax.device_put(f.ele, NamedSharding(mesh, P(ROW_AXIS))),
        nreal=f.nreal)
    return fn(f_row, f_rep)


def kef_pallas_sharded(e, f: ForceData, params, mesh, zeta: int = 2,
                       interpret: bool = False,
                       mm_precision: str | None = None):
    """(m_e, 3 m_f) energy-force block with the ENERGY rows sharded."""
    from ..ops.kff_pallas import kef_pallas
    from ..ops.packing import EnergyData

    n_dev = mesh.devices.size
    assert e.x.shape[0] % n_dev == 0

    e_specs = EnergyData(x=P(ROW_AXIS), ele=P(ROW_AXIS),
                         counts=P(ROW_AXIS), nreal=P())
    f_specs = ForceData(x=P(), dxdr=P(), ele=P(), nreal=P())

    def stripe(e_block, f_full):
        return kef_pallas(e_block, f_full, params, zeta=zeta,
                          interpret=interpret, mm_precision=mm_precision)

    fn = _shard_map(stripe, mesh, in_specs=(e_specs, f_specs),
                    out_specs=P(ROW_AXIS))
    e_row = EnergyData(
        x=jax.device_put(e.x, NamedSharding(mesh, P(ROW_AXIS))),
        ele=jax.device_put(e.ele, NamedSharding(mesh, P(ROW_AXIS))),
        counts=jax.device_put(e.counts, NamedSharding(mesh, P(ROW_AXIS))),
        nreal=e.nreal)
    f_rep = jax.device_put(f, NamedSharding(mesh, P()))
    return fn(e_row, f_rep)
