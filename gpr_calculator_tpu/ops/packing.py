"""Padded, static-shape data layout for GPR training/prediction points.

The reference packs ragged per-point descriptor blocks into flat arrays with
per-point row counts (gpr_calc/utilities.py:340-390 ``list_to_tuple``) and
re-derives point membership inside the C++ loops via ``x*_inds``.  On TPU we
instead use a dense padded layout

    energy point block:  x (m, A, d), ele (m, A)
    force point block :  x (m, B, d), dxdr (m, B, d, 3|9), ele (m, B)

where A/B are padded per-point environment counts and ``ele == 0`` marks
padding.  Padding rows have zero descriptors, so the reference's
``x_norm > eps`` guard (rbf_kernel.cpp:37) doubles as the padding mask; we
additionally mask on ``ele > 0`` explicitly.

Static shapes are bucketed (rounded up) so that a growing training set only
triggers recompilation when it crosses a bucket boundary.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .. import config


class EnergyData(NamedTuple):
    """A batch of energy points (one per structure).

    x      : (m, A, d) descriptors of every atom in each structure
    ele    : (m, A) int32 atomic numbers, 0 = padding
    counts : (m,) float, number of real atoms per point (K_EE normalisation,
             rbf_kernel.py:56,70 in the reference divides by N1*N2)
    nreal  : () int32, number of real points (<= m)
    """

    x: jnp.ndarray
    ele: jnp.ndarray
    counts: jnp.ndarray
    nreal: jnp.ndarray

    @property
    def m(self) -> int:
        return self.x.shape[0]

    @property
    def max_atoms(self) -> int:
        return self.x.shape[1]

    @property
    def d(self) -> int:
        return self.x.shape[2]


class ForceData(NamedTuple):
    """A batch of force points (one per selected atom).

    x     : (m, B, d) descriptors of the atomic environments whose power
            spectrum depends on the target atom's position
    dxdr  : (m, B, d, 3) gradients dX/dr of each environment w.r.t. the
            target atom (9 columns when stress terms are appended,
            cf. gaussianprocess.py:863-864)
    ele   : (m, B) int32 atomic numbers of env centres, 0 = padding
    nreal : () int32 number of real points
    """

    x: jnp.ndarray
    dxdr: jnp.ndarray
    ele: jnp.ndarray
    nreal: jnp.ndarray

    @property
    def m(self) -> int:
        return self.x.shape[0]

    @property
    def max_envs(self) -> int:
        return self.x.shape[1]

    @property
    def d(self) -> int:
        return self.x.shape[2]

    @property
    def ncart(self) -> int:
        return self.dxdr.shape[3]


def round_up(n: int, multiple: int) -> int:
    if n == 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


def bucket_size(n: int, multiple: int = 8, grow: float = 1.25) -> int:
    """Bucketed padding: next multiple of ``multiple`` at least ``grow*n``.

    NOTE: this is an ARITHMETIC ladder (bucket boundaries every
    ~multiple/grow), not a geometric one -- the shape count grows
    linearly with n, with a bounded ~(grow-1) padding overhead that
    gives the jit cache hysteresis when a size oscillates around a
    plain round_up boundary.  (A true geometric ladder would compile
    fewer shapes at large n; changing it now would invalidate every
    cached program, so it is documented rather than altered.)
    """
    if n <= 0:
        return multiple
    target = max(n, int(np.ceil(n * grow)))
    return round_up(target, multiple)


def pack_energy(
    points: Sequence,  # sequence of (x_i (Ni, d), ele_i (Ni,)) numpy arrays
    m_pad: Optional[int] = None,
    a_pad: Optional[int] = None,
    d: Optional[int] = None,
) -> EnergyData:
    """Pack ragged energy points into a padded EnergyData."""
    n = len(points)
    if n == 0:
        assert d is not None, "need descriptor width for empty energy block"
        m_pad = m_pad or 1
        a_pad = a_pad or 1
        return EnergyData(
            x=jnp.zeros((m_pad, a_pad, d), config.dtype()),
            ele=jnp.zeros((m_pad, a_pad), config.int_dtype()),
            counts=jnp.ones((m_pad,), config.dtype()),
            nreal=jnp.asarray(0, config.int_dtype()),
        )
    d_data = points[0][0].shape[1]
    assert d is None or d == d_data, (
        f"declared descriptor width d={d} but the points carry "
        f"{d_data} (model and prediction descriptors disagree?)")
    d = d_data
    max_a = max(int(p[0].shape[0]) for p in points)
    m_pad = m_pad or n
    a_pad = a_pad or max_a
    assert m_pad >= n and a_pad >= max_a
    x = np.zeros((m_pad, a_pad, d), np.float64)
    ele = np.zeros((m_pad, a_pad), np.int32)
    counts = np.ones((m_pad,), np.float64)
    for i, (xi, ei) in enumerate(points):
        ni = xi.shape[0]
        x[i, :ni] = xi
        ele[i, :ni] = np.asarray(ei, np.int32)
        counts[i] = ni
    return EnergyData(
        x=jnp.asarray(x, config.dtype()),
        ele=jnp.asarray(ele),
        counts=jnp.asarray(counts, config.dtype()),
        nreal=jnp.asarray(n, config.int_dtype()),
    )


def pack_force(
    points: Sequence,  # sequence of (x_i (Ni, d), dxdr_i (Ni, d, c), ele_i)
    m_pad: Optional[int] = None,
    b_pad: Optional[int] = None,
    d: Optional[int] = None,
    ncart: int = 3,
) -> ForceData:
    """Pack ragged force points into a padded ForceData."""
    n = len(points)
    if n == 0:
        assert d is not None
        m_pad = m_pad or 1
        b_pad = b_pad or 1
        return ForceData(
            x=jnp.zeros((m_pad, b_pad, d), config.dtype()),
            dxdr=jnp.zeros((m_pad, b_pad, d, ncart), config.dtype()),
            ele=jnp.zeros((m_pad, b_pad), config.int_dtype()),
            nreal=jnp.asarray(0, config.int_dtype()),
        )
    d_data = points[0][0].shape[1]
    assert d is None or d == d_data, (
        f"declared descriptor width d={d} but the points carry {d_data}")
    d = d_data
    nc_data = points[0][1].shape[2]
    assert ncart in (3, nc_data), (
        f"declared ncart={ncart} but the force points carry {nc_data} "
        "cart columns (stress rows missing?)")
    ncart = nc_data
    max_b = max(int(p[0].shape[0]) for p in points)
    m_pad = m_pad or n
    b_pad = b_pad or max_b
    assert m_pad >= n and b_pad >= max_b
    x = np.zeros((m_pad, b_pad, d), np.float64)
    dxdr = np.zeros((m_pad, b_pad, d, ncart), np.float64)
    ele = np.zeros((m_pad, b_pad), np.int32)
    for i, (xi, di, ei) in enumerate(points):
        ni = xi.shape[0]
        x[i, :ni] = xi
        dxdr[i, :ni] = di
        ele[i, :ni] = np.asarray(ei, np.int32)
    return ForceData(
        x=jnp.asarray(x, config.dtype()),
        dxdr=jnp.asarray(dxdr, config.dtype()),
        ele=jnp.asarray(ele),
        nreal=jnp.asarray(n, config.int_dtype()),
    )
