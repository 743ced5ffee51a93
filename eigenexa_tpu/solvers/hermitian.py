"""Complex Hermitian eigensolver — eigen_h analogue.

Reference: src/eigen_h.F:28 — complex Householder reduction to a *real*
tridiagonal (eigen_hrd, src/eigen_hrd.F:1), real D&C on T, then the real
eigenvectors are cast to complex and the complex WY back-transform applied
(convert_DtoZ src/eigen_h.F:294 + hrbakwy4, src/hrbakwy4.F:1).

Here the reduction/back-transform kernels are the same code path as the
real driver (ops/householder.py is dtype-generic with the zlarfg real-β
convention), so this file is pure orchestration.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax.numpy as jnp

from eigenexa_tpu.ops.householder import tridiagonalize
from eigenexa_tpu.solvers import dc
from eigenexa_tpu.solvers.trbak import back_transform
from eigenexa_tpu.solvers.solver import (
    SolveInfo,
    flop_model,
    matrix_scaling,
)
from eigenexa_tpu.runtime import EigenContext, default_context


def eigen_h(
    a: jnp.ndarray,
    nvec: Optional[int] = None,
    mode: str = "A",
    ctx: Optional[EigenContext] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], SolveInfo]:
    """Hermitian eigensolver: A = Z·diag(w)·Zᴴ with real ascending w.

    Modes follow eigen_s ('A'/'N'/'X'/'T'; stage-isolation 'S'/'C' apply to
    the complex Q).  Returns (w, Z complex or None, SolveInfo).
    """
    ctx = ctx or default_context()
    if not jnp.iscomplexobj(a):
        a = a.astype(jnp.complex128 if a.dtype == jnp.float64
                     else jnp.complex64)
    n = a.shape[0]
    nvec = n if nvec is None else min(nvec, n)
    mode = mode.upper()
    cfg = ctx.config
    t0 = time.perf_counter()

    import jax

    z = None
    with jax.default_matmul_precision(cfg.matmul_precision):
        a_s, sigma = matrix_scaling(a)
        sigma_r = jnp.real(sigma)
        trd = tridiagonalize(a_s, nb=cfg.panel_forward)

        if mode == "N":
            w = dc.eigvals_tridiag_dense(trd.d, trd.e) / sigma_r
        elif mode in ("A", "X", "T"):
            w, s = dc.solve_tridiag(trd.d, trd.e, vec_dtype=trd.d.dtype)
            w = w / sigma_r
            s = s[:, :nvec]
            if mode == "T":
                z = s.astype(a.dtype)
            else:
                # convert_DtoZ analogue (src/eigen_h.F:294): real S →
                # complex, then the complex WY back-transform
                z = back_transform(s.astype(a.dtype), trd.v, trd.tau,
                                   nb=cfg.panel_backward)
        elif mode == "S":
            eye = jnp.eye(n, nvec, dtype=a.dtype)
            z = back_transform(eye, trd.v, trd.tau, nb=cfg.panel_backward)
            w = trd.d / sigma_r
        elif mode == "C":
            w = trd.d / sigma_r
            z = jnp.eye(n, nvec, dtype=a.dtype)
        else:
            raise ValueError(f"unknown mode {mode!r}")

    w = w.block_until_ready()
    elapsed = time.perf_counter() - t0
    # Hermitian flops: 4× the real count (complex mult = 4 real mults)
    info = SolveInfo(
        flops=4.0 * flop_model(n, nvec, mode in ("A", "X", "S")),
        elapsed=elapsed,
        n=n,
        nvec=nvec,
        mode=mode,
    )
    return w, z, info
