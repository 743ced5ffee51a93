"""Divide & conquer solver for the reduced (tridiagonal/banded) problem.

Reference analogue: dc2_FS.F:75 → FS_EDC.F90 tree D&C (SURVEY.md §3.2).

This module is the dispatch facade: the default path is the batched tree
D&C with secular solves (eigenexa_tpu/solvers/dc_tree.py); the dense
``jnp.linalg.eigh`` oracle is kept permanently for cross-checks
(SURVEY.md §7 step 2) and for backends where it wins at small n.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def assemble_tridiag(d: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    n = d.shape[0]
    t = jnp.zeros((n, n), d.dtype)
    t = t + jnp.diag(d)
    if n > 1:
        t = t + jnp.diag(e, 1) + jnp.diag(e, -1)
    return t


@jax.jit
def solve_tridiag_dense(d: jnp.ndarray, e: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Oracle: dense eigh of T.  Returns ascending (w, S) with T·S = S·diag(w).

    The serial-fallback analogue of LAPACK_EIGEN2 / DSTEDC-at-P=1
    (reference: src/lapack_eigen.F, FS_EDC.F90:140-152)."""
    t = assemble_tridiag(d, e)
    w, s = jnp.linalg.eigh(t)
    return w, s


@jax.jit
def eigvals_tridiag_dense(d: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    t = assemble_tridiag(d, e)
    return jnp.linalg.eigvalsh(t)


def solve_tridiag(d, e, leaf: int = 32, vec_dtype=None):
    """Default reduced-problem solver: batched tree D&C (dc_tree.py).

    Returns ascending (w float64-when-x64, S in vec_dtype)."""
    from eigenexa_tpu.solvers.dc_tree import solve_tridiag_dc

    return solve_tridiag_dc(d, e, leaf=leaf, vec_dtype=vec_dtype)
