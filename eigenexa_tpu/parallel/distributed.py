"""Distributed (multi-chip) solver entry points.

Round-1 distribution strategy (SURVEY.md §2 parallelism inventory): the
matrix lives block-sharded over the 2D mesh (PartitionSpec('x','y') — the
TPU-native stand-in for the reference's 2D cyclic process grid,
src/eigen_libs0.F:477-572), and the solve runs under one jit whose GEMMs,
GEMVs and reductions are partitioned by XLA's SPMD partitioner, which
inserts the psum/all_gather/collective-permute traffic the reference
hand-writes in comm.F.  The sequential panel recurrence operates on
replicated O(n·nb) panel state; the O(n²) trailing updates and
back-transform GEMMs — where the flops and bytes are — stay sharded.

shard_map-based cyclic kernels (better load balance on the shrinking
trailing window) layer on top of the same entry points later without
changing callers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eigenexa_tpu.runtime import EigenContext, SolverConfig
from eigenexa_tpu.solvers.solver import _solve_core


def matrix_sharding(mesh: Mesh) -> NamedSharding:
    """The solver's canonical matrix sharding: rows over 'x', cols over 'y'."""
    return NamedSharding(mesh, P("x", "y"))


def shard_matrix(a: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(a, matrix_sharding(mesh))


@functools.partial(
    jax.jit, static_argnames=("nvec", "mode", "nb_f", "nb_b", "mesh")
)
def _dist_solve(a, nvec: int, mode: str, nb_f: int, nb_b: int, mesh: Mesh):
    a = jax.lax.with_sharding_constraint(a, matrix_sharding(mesh))
    w, z = _solve_core(a, nvec, mode, nb_f, nb_b)
    w = jax.lax.with_sharding_constraint(w, NamedSharding(mesh, P()))
    if z is not None:
        z = jax.lax.with_sharding_constraint(z, matrix_sharding(mesh))
    return w, z


def distributed_eigen_s(
    a: jnp.ndarray,
    mesh: Mesh,
    nvec: Optional[int] = None,
    mode: str = "A",
    config: Optional[SolverConfig] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """eigen_s over a 2D device mesh.  Returns (w replicated, Z sharded)."""
    cfg = config or SolverConfig()
    n = a.shape[0]
    nvec = n if nvec is None else min(nvec, n)
    a = shard_matrix(a, mesh)
    return _dist_solve(
        a, nvec, mode.upper(), cfg.panel_forward, cfg.panel_backward, mesh
    )


def training_step(mesh: Mesh, n: int = 32, dtype=jnp.float32):
    """One full solver step over the mesh — the framework's analogue of a
    'training step' for compile-validation: generate a Frank matrix sharded
    over ('x','y'), run scale→TRD→D&C→TRBAK, return (w, Z, residual).
    """
    from eigenexa_tpu.testing.matgen import frank

    a = shard_matrix(frank(n, dtype), mesh)
    cfg = SolverConfig(panel_forward=8, panel_backward=16)
    w, z = _dist_solve(a, n, "A", cfg.panel_forward, cfg.panel_backward, mesh)
    resid = jnp.linalg.norm(a @ z - z * w[None, :]) / jnp.linalg.norm(a)
    return w, z, resid
