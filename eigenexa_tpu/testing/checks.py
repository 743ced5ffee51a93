"""Numerical acceptance checks with the reference's exact constants.

Re-implements `ev_test` / `w_test` (reference: benchmark/ev_test.f:182-204,
benchmark/w_test.f:141-175):

  residual      ‖AZ−ZW‖_F / (N·ε·‖A‖_F)   PASS < 768, hard FAIL > 1024
  orthogonality ‖ZᵀZ−I‖_F / (N·ε)         PASS < 8,   hard FAIL > 32
  eigenvalues   max rel & abs error        PASS < √ε,  CAUTION < ε^{1/4}

ε is taken from the dtype under test, so the same checks apply to f64 (CPU
golden runs, matching the reference bit-for-bit in spirit) and f32/bf16
(TPU runs) with appropriately scaled tolerances.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class CheckResult:
    name: str
    value: float
    passed: bool
    hard_fail: bool
    caution: bool = False

    def __bool__(self):
        return self.passed

    def status(self) -> str:
        if self.passed:
            return "PASSED"
        if self.caution:
            return "CAUTION"
        return "FAILED" + (" (hard)" if self.hard_fail else "")

    def __repr__(self):
        return f"<{self.name}: {self.value:.4g} {self.status()}>"


def residual_check(a, z, w, nvec: Optional[int] = None,
                   col_chunk: int = 0) -> CheckResult:
    """‖AZ−ZW‖_F / (N·ε·‖A‖_F) with PASS<768 / FAIL>1024
    (reference: benchmark/ev_test.f:182-190).

    `col_chunk` > 0 streams Z in column blocks (Frobenius norms add in
    quadrature) — the memory path for n ≥ 32k full-spectrum checks on a
    16 GB chip, where A + Z + the A·Z product exceed the HBM."""
    n = a.shape[0]
    if nvec is not None:
        z = z[:, :nvec]
        w = w[:nvec]
    eps = float(jnp.finfo(a.dtype).eps)
    # measurement GEMMs at full precision of the dtype — on TPU the
    # default f32 matmul is bf16 passes, which would measure the CHECK's
    # rounding, not the solver's (the reference measures in the solve
    # precision, benchmark/ev_test.f)
    with jax.default_matmul_precision("highest"):
        if col_chunk and z.shape[1] > col_chunk:
            num2 = 0.0
            for c0 in range(0, z.shape[1], col_chunk):
                zc = z[:, c0:c0 + col_chunk]
                wc = w[c0:c0 + col_chunk]
                rc = a @ zc - zc * wc[None, :].astype(z.dtype)
                num2 += float(jnp.sum(jnp.abs(rc) ** 2))
            num = num2 ** 0.5
        else:
            r = a @ z - z * w[None, :].astype(z.dtype)
            num = jnp.linalg.norm(r)
        den = n * eps * jnp.linalg.norm(a)
    val = float(num / den)
    return CheckResult("residual", val, val < 768.0, val > 1024.0)


def orthogonality_check(z, nvec: Optional[int] = None,
                        col_chunk: int = 0) -> CheckResult:
    """‖ZᵀZ−I‖_F / (N·ε) with PASS<8 / FAIL>32
    (reference: benchmark/ev_test.f:196-204).

    `col_chunk` > 0 streams the Gram matrix in column blocks (see
    residual_check) — avoids materializing the n×n Gram at 32k."""
    n = z.shape[0]
    if nvec is not None:
        z = z[:, :nvec]
    eps = float(jnp.finfo(z.dtype).eps)
    m = z.shape[1]
    with jax.default_matmul_precision("highest"):
        if col_chunk and m > col_chunk:
            val2 = 0.0
            for c0 in range(0, m, col_chunk):
                zc = z[:, c0:c0 + col_chunk]
                gc = z.conj().T @ zc
                cw = gc.shape[1]
                # gc − I_c without materializing the m×cw identity (a
                # sum-then-correct formulation cancels catastrophically:
                # Σ|gc|² is O(cw) while the target is O(ε²))
                gc = gc.at[c0 + jnp.arange(cw), jnp.arange(cw)].add(-1.0)
                val2 += float(jnp.sum(jnp.abs(gc) ** 2))
            val = (val2 ** 0.5) / (n * eps)
        else:
            g = z.conj().T @ z - jnp.eye(m, dtype=z.dtype)
            val = float(jnp.linalg.norm(g) / (n * eps))
    return CheckResult("orthogonality", val, val < 8.0, val > 32.0)


def eigenvalue_check(w, w_true) -> CheckResult:
    """max relative & absolute eigenvalue error vs known spectrum, both
    ascending-sorted; PASS < √ε, CAUTION < ε^{1/4}
    (reference: benchmark/w_test.f:141-175)."""
    w = jnp.sort(jnp.asarray(w))
    w_true = jnp.sort(jnp.asarray(w_true).astype(w.dtype))
    eps = float(jnp.finfo(w.dtype).eps)
    eps2, eps4 = eps ** 0.5, eps ** 0.25
    abs_err = jnp.abs(w - w_true)
    denom = jnp.abs(w_true)
    rel_err = jnp.where(denom > eps, abs_err / jnp.maximum(denom, eps), 0.0)
    val = float(jnp.maximum(jnp.max(abs_err), jnp.max(rel_err)))
    return CheckResult(
        "eigenvalues", val, val < eps2, val >= eps4, caution=val < eps4
    )


def eigenvalue_check_scaled(w, w_true, caution_factor: float = 768.0
                            ) -> CheckResult:
    """Backward-stability-scaled eigenvalue check: max|w − w*| / (ε·‖A‖₂)
    with ‖A‖₂ = max|w*|.

    This is the f32 on-chip criterion, DISTINCT from the reference w_test
    contract (eigenvalue_check above, benchmark/w_test.f:141-160: max of
    rel and abs error < √ε).  The reference contract is an f64 statement —
    at f32 the backward-stability floor ε_f32·‖A‖₂ alone exceeds √ε_f32
    for any matrix with ‖A‖ ≳ 3, so the absolute branch is unsatisfiable
    regardless of solver quality.  A backward-stable solve has
    value = O(1) here (D&C typically lands at O(√n)); PASS < 768 mirrors
    the ev_test residual constant (both are N·ε-family criteria), hard
    FAIL > 1024.  Used by bench.py for f32 chip runs; the strict f64
    contract still runs in tests/ and on-chip via the f64 host-D&C path.
    """
    import numpy as np

    eps = float(jnp.finfo(jnp.asarray(w).dtype).eps)  # solve-dtype ε
    w_s = np.sort(np.asarray(w, dtype=np.float64))
    w_true_s = np.sort(np.asarray(w_true, dtype=np.float64))
    anorm = float(np.max(np.abs(w_true_s)))
    abs_err = float(np.max(np.abs(w_s - w_true_s)))
    val = abs_err / (eps * max(anorm, 1e-300))
    return CheckResult("eigenvalues_scaled", val, val < caution_factor,
                       val > 1024.0)


def gev_residual_check(a, b, z, w, nvec: Optional[int] = None
                       ) -> CheckResult:
    """‖AZ−BZW‖_F / (N·ε·‖A‖_F) — the generalized-problem residual
    (reference: benchmark/KMATH_EIGEN_GEV_check.f); same PASS/FAIL
    constants as ev_test."""
    n = a.shape[0]
    if nvec is not None:
        z = z[:, :nvec]
        w = w[:nvec]
    eps = float(jnp.finfo(a.dtype).eps)
    with jax.default_matmul_precision("highest"):
        r = a @ z - (b @ z) * w[None, :].astype(z.dtype)
        val = float(jnp.linalg.norm(r) / (n * eps * jnp.linalg.norm(a)))
    return CheckResult("gev_residual", val, val < 768.0, val > 1024.0)


def b_orthogonality_check(z, b, nvec: Optional[int] = None) -> CheckResult:
    """‖ZᵀBZ−I‖_F / (N·ε) — B-orthonormality of generalized eigenvectors
    (the GEV analogue of ev_test's orthogonality, same constants)."""
    n = z.shape[0]
    if nvec is not None:
        z = z[:, :nvec]
    eps = float(jnp.finfo(z.dtype).eps)
    with jax.default_matmul_precision("highest"):
        g = z.conj().T @ (b @ z) - jnp.eye(z.shape[1], dtype=z.dtype)
        val = float(jnp.linalg.norm(g) / (n * eps))
    return CheckResult("b_orthogonality", val, val < 8.0, val > 32.0)
