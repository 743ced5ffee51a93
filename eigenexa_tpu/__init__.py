"""eigenexa_tpu — a TPU-native massively parallel dense eigensolver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RIKEN-RCCS/EigenExa (reference surveyed in /root/repo/SURVEY.md):

* ``eigen_s``  — standard real-symmetric eigenproblem A = Z W Z^T via blocked
  Householder tridiagonalization, divide & conquer, WY back-transform
  (reference driver: src/eigen_s.F:30 / src/eigen_FS.F:29).
* ``eigen_sx`` — one-stage band (pentadiagonal) variant
  (reference: src/eigen_sx.F:30).
* ``eigen_h``  — complex Hermitian driver (reference: src/eigen_h.F:28).
* ``eigen_gev``— generalized symmetric-definite A x = λ B x
  (reference: src/KMATH_EIGEN_GEV.F:2).

Design: a 2D ``jax.sharding.Mesh`` ('x','y') replaces the MPI process grid;
XLA collectives (psum/all_gather/ppermute under shard_map, or GSPMD-inserted)
replace comm.F; Pallas MXU kernels implement the hot panel/update/secular
kernels.  Everything is functional and jit-compilable with static shapes.
"""

from eigenexa_tpu.runtime import (
    EigenContext,
    eigen_init,
    eigen_free,
    eigen_get_procs,
    eigen_get_id,
    eigen_get_matdims,
)
from eigenexa_tpu.solvers.solver import eigen_s, eigen_sx, eigh
from eigenexa_tpu.solvers.hermitian import eigen_h
from eigenexa_tpu.solvers.gev import eigen_gev

__version__ = "0.1.0"
__codename__ = "takanoha"  # reference names releases too (eigen_libs0.F:29-48)

__all__ = [
    "EigenContext",
    "eigen_init",
    "eigen_free",
    "eigen_get_procs",
    "eigen_get_id",
    "eigen_get_matdims",
    "eigen_s",
    "eigen_sx",
    "eigen_h",
    "eigen_gev",
    "eigh",
]
