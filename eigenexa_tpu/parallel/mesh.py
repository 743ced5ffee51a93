"""2D device-mesh construction for the eigensolver process grid.

TPU-native analogue of the reference's grid setup in ``eigen_init0``
(reference: src/eigen_libs0.F:477-572): the process count P is factored into
``x_nnod × y_nnod`` with ``x_nnod`` the largest divisor ≤ √P, and the grid is
ordered column-major ('C', default) or row-major ('R').  Here the "processes"
are JAX devices and the grid is a ``jax.sharding.Mesh`` with axes
``('x', 'y')``: axis 'x' shards matrix *rows*, axis 'y' shards matrix
*columns* (matching the reference convention that global element A(j,i) lives
on process (mod(j-1,x_nnod)+1, mod(i-1,y_nnod)+1), SURVEY.md preamble).

Unlike MPI there are no communicator objects: row/column sub-communicators
(x_COMM_WORLD / y_COMM_WORLD, eigen_libs0.F:579-585) are simply the mesh
axes, and group-scoped collectives (the FS merge tree) are expressed by
masking on ``jax.lax.axis_index`` — see collectives.py.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def factor_grid(p: int) -> Tuple[int, int]:
    """Factor P devices into (x, y) with x the largest divisor of P ≤ √P.

    Mirrors the grid factorization of eigen_init0
    (reference: src/eigen_libs0.F:477-572).  Guarantees x ≤ y and x*y == P.
    """
    if p < 1:
        raise ValueError(f"device count must be >= 1, got {p}")
    x = 1
    for d in range(1, int(math.isqrt(p)) + 1):
        if p % d == 0:
            x = d
    return x, p // x


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
    order: str = "C",
) -> Mesh:
    """Build the 2D solver mesh with axes ('x', 'y').

    Args:
      devices: devices to use (default: all of ``jax.devices()``).
      shape: explicit (x_nnod, y_nnod); the analogue of passing an MPI_Cart
        to eigen_init (src/eigen_libs0.F:484-520).  Defaults to
        ``factor_grid(len(devices))``.
      order: 'C' (column-major rank placement, reference default) or 'R'
        (row-major) — the ``order`` argument of eigen_init
        (src/eigen_libs.F:70).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    p = len(devices)
    if shape is None:
        shape = factor_grid(p)
    x, y = shape
    if x * y != p:
        raise ValueError(f"grid shape {shape} does not cover {p} devices")
    arr = np.asarray(devices, dtype=object)
    if order.upper() == "C":
        # column-major: rank r -> (x = r % x_nnod, y = r // x_nnod)
        grid = arr.reshape((y, x)).T
    elif order.upper() == "R":
        grid = arr.reshape((x, y))
    else:
        raise ValueError(f"order must be 'C' or 'R', got {order!r}")
    return Mesh(grid, axis_names=("x", "y"))


def mesh_shape(mesh: Mesh) -> Tuple[int, int]:
    """Return (x_nnod, y_nnod) of a solver mesh."""
    return mesh.shape["x"], mesh.shape["y"]


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    """A 1×1 mesh — the P=1 path (serial fallback in the reference)."""
    if device is None:
        device = jax.devices()[0]
    return Mesh(np.asarray([[device]], dtype=object), axis_names=("x", "y"))
