"""Generalized symmetric-definite eigensolver — KMATH_EIGEN_GEV analogue.

Reference: src/KMATH_EIGEN_GEV.F:2 / KMATH_EIGEN_GEV_1.F:40-115.
Algorithm (spectral reduction, not Cholesky — matching the reference):

  1. eigen_s(B)               →  B = V_B·D_B·V_Bᵀ  (must be positive def.)
  2. F = V_B·D_B^{-1/2}       (diag_mult, KMATH_EIGEN_GEV_misc.F:49)
  3. A' = Fᵀ·A·F              (two distributed GEMMs — pdgemm in reference)
  4. eigen_s(A')              →  A' = Z'·W·Z'ᵀ
  5. Z = F·Z'                 (back-transform GEMM)

Then A·Z = B·Z·W with Zᵀ·B·Z = I (B-orthonormal eigenvectors).
The positive-definiteness check mirrors the reference's w(1)<=0 test
(KMATH_EIGEN_GEV_1.F:47): the result is NaN-poisoned instead of aborting,
consistent with the framework's fail-fast-with-NaN contract (SURVEY.md §5.3).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax.numpy as jnp

from eigenexa_tpu.solvers.solver import SolveInfo, eigen_s
from eigenexa_tpu.runtime import EigenContext, default_context


def gev_flop_model(n: int, nvec: int, mode: str = "A") -> float:
    """Model flops of the generalized solve — the reference counts the
    TWO eigen_s calls plus the THREE pdgemms of the spectral reduction
    (src/KMATH_EIGEN_GEV_1.F:40-115: eigen_s(B), Fᵀ·A, (FᵀA)·F,
    eigen_s(A'), F·Z').  The ONE model shared by the driver, the
    distributed driver and the benchmark runner, so every reported GFLOPS
    line uses the same denominator (VERDICT r4 weak #7)."""
    from eigenexa_tpu.solvers.solver import flop_model

    f = flop_model(n, n, True) + 2 * (2.0 * n ** 3)  # eigen_s(B) + A'=FᵀAF
    if mode.upper() == "N":
        return f + flop_model(n, 0, False)
    return f + flop_model(n, nvec, True) + 2.0 * n * n * nvec


def eigen_gev(
    a: jnp.ndarray,
    b: jnp.ndarray,
    nvec: Optional[int] = None,
    mode: str = "A",
    ctx: Optional[EigenContext] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], SolveInfo]:
    """Solve A·x = λ·B·x for symmetric A and s.p.d. B.

    Returns (w ascending, Z (n×nvec) B-orthonormal or None, SolveInfo).
    mode='N' returns eigenvalues only, skipping the Z'-eigenvector solve
    and the F·Z' back-multiply (an extension over the reference, whose
    KMATH_EIGEN_GEV always computes eigenpairs; the benchmark runner's
    mode column is honored through this).  Other stage-isolation modes
    are not meaningful for the composed algorithm and raise.
    """
    ctx = ctx or default_context()
    mode = mode.upper()
    if mode not in ("A", "N"):
        raise ValueError(
            f"eigen_gev supports modes 'A' and 'N'; got {mode!r} "
            "(the reference KMATH_EIGEN_GEV.F computes eigenpairs only)")
    n = a.shape[0]
    nvec = n if nvec is None else min(nvec, n)
    t0 = time.perf_counter()

    import jax

    wb, vb, _ = eigen_s(b, mode="A", ctx=ctx)
    # positive-definiteness guard → NaN poison (reference aborts; we poison)
    pd_ok = wb[0] > 0
    with jax.default_matmul_precision(ctx.config.matmul_precision):
        safe_wb = jnp.where(wb > 0, wb, 1.0)
        dinv_sqrt = jnp.where(
            pd_ok, 1.0 / jnp.sqrt(safe_wb), jnp.nan
        ).astype(a.dtype)
        f = vb * dinv_sqrt[None, :]

        a2 = f.T @ a @ f
        a2 = 0.5 * (a2 + a2.T)  # re-symmetrize (fp congruence)
        if mode == "N":
            w, z = eigen_s(a2, mode="N", ctx=ctx)[0], None
        else:
            w, z2, _ = eigen_s(a2, nvec=nvec, mode="A", ctx=ctx)
            z = f @ z2
    from eigenexa_tpu.utils.sync import device_sync

    device_sync(w, z)
    elapsed = time.perf_counter() - t0
    info = SolveInfo(
        flops=gev_flop_model(n, nvec, mode),
        elapsed=elapsed,
        n=n,
        nvec=nvec,
        mode=mode,
    )
    return w, z, info
