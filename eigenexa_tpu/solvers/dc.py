"""Divide & conquer solver for the reduced (tridiagonal/banded) problem.

Reference analogue: dc2_FS.F:75 → FS_EDC.F90 tree D&C (SURVEY.md §3.2).

Round-1 status: this module currently provides the *oracle* path — a dense
``jnp.linalg.eigh`` on the assembled tridiagonal — which the build plan
(SURVEY.md §7 step 2) keeps permanently as the correctness oracle for the
real mesh-recursive D&C with batched secular solves (eigenexa_tpu/solvers/
dc_tree.py, in progress).  The facade dispatches to the tree solver once
it lands; callers never change.
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
