"""Verification layer: test-matrix generators and numerical acceptance checks.

TPU-native re-implementation of the reference's benchmark-driven test
strategy (SURVEY.md §4): `mat_set` generators with analytically known /
designed spectra, and `ev_test`/`w_test` residual, orthogonality and
eigenvalue-error checks with the reference's exact acceptance constants.
"""

from eigenexa_tpu.testing.matgen import mat_set, w_set, MATRIX_TYPES
from eigenexa_tpu.testing.checks import (
    residual_check,
    orthogonality_check,
    eigenvalue_check,
    gev_residual_check,
    b_orthogonality_check,
    CheckResult,
)

__all__ = [
    "mat_set",
    "w_set",
    "MATRIX_TYPES",
    "residual_check",
    "orthogonality_check",
    "eigenvalue_check",
    "gev_residual_check",
    "b_orthogonality_check",
    "CheckResult",
]
