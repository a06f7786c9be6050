"""Multi-chip wrappers for the fused Pallas covariance kernels.

The XLA kernel path scales out under plain GSPMD (mesh row-sharding,
parallel/mesh.py): XLA partitions the matmuls and inserts the ICI
collectives itself, replacing the reference's MPI row splits P1-P5
(gpr_calc/kernels/RBF_mb.py:257-524).  Pallas kernels are opaque to the
GSPMD partitioner, so their multi-chip form is explicit data parallelism
via shard_map.

Two decompositions live here:

* ``kff_pallas_sharded`` / ``kef_pallas_sharded`` -- rectangular row
  stripes (the reference's P3: each device computes its stripe of lhs
  points against the replicated rhs; no collective, output stays
  row-sharded).  Serving-style blocks.
* ``pallas_self_blocks_sharded`` -- the PRODUCTION training build
  (GP(mesh=...) -> k_self/k_self_dual): the bit-packed TRIANGULAR cell
  schedule of the symmetric K_FF is partitioned across devices at
  output-block granularity (no 2x full-rectangle waste), each device
  masks the blocks it owns and one psum replicates the upper-triangle
  planes; K_EE and K_EF are striped over the energy rows of the SAME
  rounded operand arrays (the Gram-consistency requirement, see
  ops/kff_pallas.force_operand) with all-gathers riding ICI.  The
  replicated result feeds the replicated Cholesky -- the reference's
  P1-P5 + P10 in one program
  (gpr_calc/kernels/RBF_mb.py:257-524, gaussianprocess.py:288-310).

Validated on the 8-way virtual CPU mesh in interpret mode
(tests/test_sharded_pallas.py); on hardware the same code runs the
compiled kernels per chip.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# production training build: triangular cell schedule partitioned on the mesh
# ---------------------------------------------------------------------------

def _partition_tri_cells(codes: np.ndarray, sbits: int, jbits: int,
                         n_dev: int, nrt: int, ncb: int):
    """Partition the bit-packed triangular cell list into n_dev balanced
    chunks at output-block (group) granularity.

    All sub-tiles (s) of one (i, j) output block accumulate into the same
    output ref, so a group must stay on one device.  Devices with fewer
    cells are padded with cyclic repeats of a group they do NOT own: the
    recomputation lands in blocks their ownership mask zeroes, so any
    partial/overwritten state there is discarded before the psum.

    Returns (cells (n_dev, L) int32, owned (n_dev, nrt, ncb) bool).
    """
    sh_j, sh_i = 1 + sbits, 1 + sbits + jbits
    jmask = (1 << jbits) - 1
    starts = np.flatnonzero(codes & 1)
    bounds = np.r_[starts, len(codes)]
    n_groups = len(starts)
    # contiguous group partition balanced by cell count
    targets = np.linspace(0, len(codes), n_dev + 1)[1:-1]
    cuts = np.searchsorted(bounds[1:-1] if n_groups > 1 else [], targets)
    cuts = np.clip(cuts, 0, n_groups)
    g_bounds = np.r_[0, cuts, n_groups]          # group index boundaries
    chunks, owned = [], np.zeros((n_dev, nrt, ncb), bool)
    for k in range(n_dev):
        g0, g1 = g_bounds[k], g_bounds[k + 1]
        chunk = codes[bounds[g0]:bounds[g1]] if g1 > g0 else codes[:0]
        for g in range(g0, g1):
            c = int(codes[bounds[g]])
            owned[k, c >> sh_i, (c >> sh_j) & jmask] = True
        chunks.append(chunk)
    L = max(len(c) for c in chunks)
    out = np.empty((n_dev, L), np.int32)
    for k in range(n_dev):
        chunk = chunks[k]
        pad = L - len(chunk)
        if pad:
            # filler from a group this device does not own
            for g in range(n_groups):
                c = int(codes[bounds[g]])
                if not owned[k, c >> sh_i, (c >> sh_j) & jmask]:
                    filler = codes[bounds[g]:bounds[g + 1]]
                    break
            else:                      # single device owns everything
                filler = codes[bounds[0]:bounds[1]]
            reps = np.tile(filler, -(-pad // len(filler)))[:pad]
            chunk = np.concatenate([chunk, reps])
        out[k] = chunk
    return out, owned


@functools.lru_cache(maxsize=64)
def tri_schedule(m2p: int, B: int, n_dev: int):
    """(codes, cells, owned) of the n_dev-way partitioned triangular
    cell schedule for the padded force geometry, or None when the tile
    geometry is infeasible.  lru-cached: the work-proportionality gate
    (ops.kernels._sharded_train_ok) and pallas_self_blocks_sharded both
    need it, and the schedule is ~150k cells of host numpy at the
    20k-row scale -- recomputing per retrace would double trace cost."""
    from ..ops.kff_pallas import (TPC, _lhs_tile_points,
                                  _rhs_tile_points, _tri_cells)
    tp2 = _rhs_tile_points(B)
    if not tp2:
        return None
    tp1 = _lhs_tile_points(B, tp2 * B, four_rows=True)
    if not tp1:
        return None
    nrt, ncb, nsub = m2p // tp1, m2p // TPC, TPC // tp2
    codes, sbits, jbits = _tri_cells(nrt, ncb, nsub, tp2, tp1)
    cells, owned = _partition_tri_cells(codes, sbits, jbits, n_dev,
                                        nrt, ncb)
    return codes, cells, owned


def pallas_self_blocks_sharded(e, f, params, kind: str, zeta: int,
                               dual: bool, mesh,
                               interpret: bool | None = None,
                               mm_precision: str | None = None):
    """Symmetric training covariance (and, when dual, its
    gamma-derivative) from the fused Pallas blocks, partitioned over
    ``mesh``; the result is REPLICATED (it feeds the replicated
    Cholesky, reference P10).  Mirrors ops/kernels._pallas_self_blocks
    block-for-block; same build-once operand contract."""
    from ..ops.kff_pallas import (TP1, TPC, _resolve_precision,
                                  energy_operand, force_operand,
                                  kee_from_ops, kef_from_ops,
                                  kff_from_ops)
    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    mode = _resolve_precision(mm_precision)
    dg = kind == "rbf_dgamma"
    pk = "dot" if kind == "dot" else "rbf"
    m_e, A = e.x.shape[0], e.x.shape[1]
    m_f, B = f.x.shape[0], f.x.shape[1]
    dt = e.x.dtype

    # operand padding: energy rows split n_dev ways in whole row tiles
    # (both kee and kef are sharded over the ENERGY rows -- the kef grid
    # then needs no extra force padding beyond the single-device TPC);
    # splitting the energy axis mirrors the reference's "split the
    # larger axis" K_EF rule in reverse (RBF_mb.py:350-354) but the
    # work is m1 x m2-proportional either way.
    e_mult = TP1 * n_dev
    f_mult = TPC
    e_lhs, e_rhs, e_w = energy_operand(e, mode, multiple=e_mult)
    f_lhs, f_rhs, f_re = force_operand(f, mode, f_mult)

    # triangular schedule over the padded force geometry (cached --
    # the dispatch gate computed the same partition)
    m2p = f_lhs.shape[1] // B
    sched = tri_schedule(m2p, B, n_dev)
    assert sched is not None, \
        "tile geometry infeasible -- the dispatch gate should have " \
        "routed this build to XLA"
    _, cells_st, owned_st = sched

    kff_kw = dict(B1=B, B2=B, zeta=zeta, interpret=interpret,
                  symmetric=True, deriv=dg, mode=mode, kind=pk,
                  dual=dual, axis_name=ROW_AXIS)
    kef_kw = dict(A1=A, B2=B, zeta=zeta, interpret=interpret, deriv=dg,
                  mode=mode, kind=pk, dual=dual)
    kee_kw = dict(A1=A, zeta=zeta, deriv=dg, mode=mode, kind=pk,
                  dual=dual)

    def tup(x):
        return x if dual else (x,)

    def build(cells_d, owned_d, elhs_s, ew_s,
              e_rhs, e_w, f_lhs, f_rhs, f_re):
        # K_FF: this device's slice of the triangular cell schedule;
        # psum inside kff_from_ops replicates the planes
        ff = tup(kff_from_ops(params, f_lhs, f_re, f_rhs, f_re,
                              cells=cells_d[0], owned=owned_d[0],
                              **kff_kw))
        # K_EF: row stripe of the energy axis vs the full force rhs
        ef_loc = tup(kef_from_ops(params, elhs_s, ew_s, f_rhs, f_re,
                                  **kef_kw))
        ef = tuple(jax.lax.all_gather(x, ROW_AXIS, axis=0, tiled=True)
                   for x in ef_loc)
        # K_EE: the same row stripe vs the full energy rhs
        ee_loc = tup(kee_from_ops(params, elhs_s, e_rhs, e_w,
                                  w_lhs=ew_s, **kee_kw))
        ee = tuple(jax.lax.all_gather(x, ROW_AXIS, axis=0, tiled=True)
                   for x in ee_loc)
        return ee, ef, ff

    fn = _shard_map(
        build, mesh,
        in_specs=(P(ROW_AXIS), P(ROW_AXIS),          # cells, owned
                  P(ROW_AXIS), P(ROW_AXIS),          # e_lhs, e_w stripes
                  P(), P(), P(), P(), P()),          # replicated operands
        out_specs=(P(), P(), P()))
    ee, ef, ff = fn(jnp.asarray(cells_st), jnp.asarray(owned_st),
                    e_lhs, e_w,
                    e_rhs, e_w, f_lhs, f_rhs, f_re)

    def asm(K_ee, K_ef, K_ff):
        K_ee = K_ee[:m_e, :m_e].astype(dt)
        K_ef = K_ef[:m_e, :3 * m_f].astype(dt)
        K_ff = K_ff[:3 * m_f, :3 * m_f].astype(dt)
        top = jnp.concatenate([K_ee, K_ef], axis=1)
        bot = jnp.concatenate([K_ef.T, K_ff], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    return tuple(asm(a, b, c) for a, b, c in zip(ee, ef, ff))


def k_block_pallas_sharded(e1, f1, e2, f2, params, mesh, kind: str = "rbf",
                           zeta: int = 2, interpret: bool | None = None,
                           mm_precision: str | None = None):
    """Serving cross-covariance [[K_EE, K_EF], [K_FE, K_FF]] (rows:
    prediction data 1, cols: TRAINING data 2) with the training FORCE
    axis column-striped over ``mesh``; the result is replicated (it
    feeds the replicated GEMV/variance tail).

    The work is n_pred x n_train-proportional and the training force
    block dominates, so striping its columns divides the serving build
    n_dev ways; K_EE and K_FE touch only the (small) training energy
    axis and are computed replicated.  No PSD constraint here (the
    block is only contracted against alpha / the factor), matching the
    single-device k_block contract."""
    import math as _math
    import jax.numpy as _jnp
    from ..ops.kff_pallas import (TP1, TPC, _resolve_precision,
                                  energy_operand, force_operand,
                                  kef_from_ops, kff_from_ops)
    from ..ops import kernels as K_ops

    n_dev = mesh.devices.size
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    mode = _resolve_precision(mm_precision)
    pk = "dot" if kind == "dot" else "rbf"
    dg = kind == "rbf_dgamma"
    dt = e1.x.dtype
    m1e, A1 = e1.x.shape[0], e1.x.shape[1]
    m1f, B1 = f1.x.shape[0], f1.x.shape[1]
    m2f, B2 = f2.x.shape[0], f2.x.shape[1]

    # operands: training force padded so each column stripe is a whole
    # number of TPC output blocks; prediction sides at their native pads
    f2_ops = force_operand(f2, mode, TPC * n_dev)
    _, f2_rhs, f2_re = f2_ops
    f1_lhs, _, f1_re = force_operand(f1, mode, TP1)
    e1_lhs, _, e1_w = energy_operand(e1, mode)

    kff_kw = dict(B1=B1, B2=B2, zeta=zeta, interpret=interpret,
                  symmetric=False, deriv=dg, mode=mode, kind=pk)
    kef_kw = dict(A1=A1, B2=B2, zeta=zeta, interpret=interpret,
                  deriv=dg, mode=mode, kind=pk)

    def stripe(f2rhs_s, f2re_s, f1_lhs, f1_re, e1_lhs, e1_w):
        kff_loc = kff_from_ops(params, f1_lhs, f1_re, f2rhs_s, f2re_s,
                               **kff_kw)
        kef_loc = kef_from_ops(params, e1_lhs, e1_w, f2rhs_s, f2re_s,
                               **kef_kw)
        kff = jax.lax.all_gather(kff_loc, ROW_AXIS, axis=1, tiled=True)
        kef = jax.lax.all_gather(kef_loc, ROW_AXIS, axis=1, tiled=True)
        return kef, kff

    fn = _shard_map(stripe, mesh,
                    in_specs=(P(None, ROW_AXIS), P(None, ROW_AXIS),
                              P(), P(), P(), P()),
                    out_specs=(P(), P()))
    K_ef, K_ff = fn(f2_rhs, f2_re, f1_lhs, f1_re, e1_lhs, e1_w)
    K_ef = K_ef[:m1e, :3 * m2f].astype(dt)
    K_ff = K_ff[:3 * m1f, :3 * m2f].astype(dt)

    # small blocks, replicated: energy-energy and train-energy x
    # pred-force (the XLA builders partition/replicate these fine)
    K_ee = K_ops.kee(e1, e2, params, kind, zeta)
    K_fe = K_ops.kef(e2, f1, params, kind, zeta).T
    top = _jnp.concatenate([K_ee, K_ef], axis=1)
    bot = _jnp.concatenate([K_fe, K_ff], axis=1)
    return _jnp.concatenate([top, bot], axis=0)
