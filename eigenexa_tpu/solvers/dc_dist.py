"""Distributed divide & conquer for the reduced tridiagonal problem.

TPU-native analogue of the FS D&C subsystem (reference: FS_PDLAED0.F90:62
binary merge tree over the process grid, FS_REDUCE_ZD.F90:98 group-scoped
z/d reductions, FS_PDLAED3.F90 secular roots + eigenvector GEMM cascade).

Entry point: :func:`solve_tridiag_dist` — used inside the distributed
driver's jit (parallel/distributed.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def solve_tridiag_dist(
    d: jnp.ndarray,
    e: jnp.ndarray,
    mesh: Mesh,
    big_n: int,
    vec_dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve T = S·diag(w)·Sᵀ with S laid out for the distributed
    back-transform.

    Returns (w (n,) replicated, s_pad (big_n, big_n) sharded P('x','y'))
    with S in rows/cols [:n] and zero padding elsewhere.
    """
    from eigenexa_tpu.solvers.dc_tree import solve_tridiag_dc

    n = d.shape[0]
    w, s = solve_tridiag_dc(d, e, vec_dtype=vec_dtype, impl="jax")
    s_pad = jnp.zeros((big_n, big_n), vec_dtype).at[:n, :n].set(s)
    s_pad = jax.lax.with_sharding_constraint(
        s_pad, NamedSharding(mesh, P("x", "y"))
    )
    return w, s_pad
