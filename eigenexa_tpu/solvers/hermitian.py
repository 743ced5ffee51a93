"""Complex Hermitian eigensolver — eigen_h analogue.

Reference: src/eigen_h.F:28 — complex Householder reduction to a *real*
tridiagonal (eigen_hrd, src/eigen_hrd.F:1), real D&C on T, then the real
eigenvectors are cast to complex and the complex WY back-transform applied
(convert_DtoZ src/eigen_h.F:294 + hrbakwy4, src/hrbakwy4.F:1).

Here the reduction/back-transform kernels are the same code path as the
real driver (ops/householder.py is dtype-generic with the zlarfg real-β
convention), so this file is pure orchestration.

Two paths:

* **native complex** — the dtype-generic kernels on complex arrays.  Used
  whenever the active backend has complex dtypes (CPU always; TPU
  backends that support c64).
* **real-pair embedding** (`eigen_h_realpair`) — for complex-less
  backends (the axon TPU tunnel): solve the 2n×2n real symmetric
  embedding [[Ar,-Ai],[Ai,Ar]] with the fast real eigen_s core, then
  extract one complex eigenvector per doubled eigenvalue and repair
  within-cluster mixing with a Newton–Schulz Löwdin polish
  (ops/zreal.py).  8× the real flops of the native complex path's 4×,
  but it runs entirely on the MXU real path the rest of the framework
  already optimizes.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from eigenexa_tpu.ops.householder import tridiagonalize
from eigenexa_tpu.ops.zreal import (
    ComplexPair,
    embed_hermitian,
    newton_schulz_unitarize,
)
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
    # complex-less backends (axon TPU): route through the real-pair
    # embedding.  Accepts a host numpy complex array, a ComplexPair, or an
    # (re, im) tuple of device arrays.
    if isinstance(a, (ComplexPair, tuple)):
        return eigen_h_realpair(a[0], a[1], nvec=nvec, mode=mode, ctx=ctx)
    if (np.iscomplexobj(a) or jnp.iscomplexobj(a)) and \
            not backend_supports_complex():
        ah = np.asarray(a)
        return eigen_h_realpair(
            jnp.asarray(np.ascontiguousarray(ah.real)),
            jnp.asarray(np.ascontiguousarray(ah.imag)),
            nvec=nvec, mode=mode, ctx=ctx)
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

    from eigenexa_tpu.utils.sync import device_sync

    device_sync(w, z)
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


_COMPLEX_OK: Optional[bool] = None


def backend_supports_complex() -> bool:
    """Whether the default backend can hold complex arrays.

    Decided by platform name, NOT by probing: on the axon tunnel a failed
    complex device_put poisons the client (every later device_put fails
    with UNIMPLEMENTED), so a try/except probe would brick the session.
    CPU/GPU/full-TPU XLA runtimes all support c64; the axon tunnel does
    not."""
    global _COMPLEX_OK
    if _COMPLEX_OK is None:
        try:
            ver = jax.devices()[0].client.platform_version
        except Exception:
            ver = ""
        _COMPLEX_OK = ("axon" not in ver
                       and jax.default_backend() != "axon")
    return _COMPLEX_OK


def _host_cluster_fix(w, zr, zi, v2, eps):
    """Rare fallback for complex eigenvalue multiplicity >= 2: the
    one-column-per-pair extraction can pick (nearly) collinear complex
    images inside a degenerate cluster, which the Newton-Schulz polish
    cannot repair (rank defect).  Re-derive each cluster's complex basis by
    pivoted QR over ALL of the cluster's real columns' complex images —
    tiny host-side work (clusters are small), pulling only the affected
    columns.

    Cluster tolerance is the numerical-degeneracy scale 16·n·ε·max|w|:
    D&C eigenvalues of an exactly-degenerate cluster spread by ~n·ε·‖A‖,
    so a tighter cut splits clusters (leaving unrepaired collinear picks);
    merging *distinct* eigenvalues this close costs a residual term of at
    most the separation itself — inside the acceptance budget
    (768·n·ε·‖A‖_F, benchmark/ev_test.f:182-190)."""
    import scipy.linalg

    z = np.asarray(zr) + 1j * np.asarray(zi)
    n, k = z.shape
    wh = np.asarray(w)[:k]  # clusters among the *returned* columns only
    scale = max(abs(wh[0]), abs(wh[-1]), 1e-30)
    bounds = np.flatnonzero(np.diff(wh) > 16 * n * eps * scale)
    starts = np.concatenate([[0], bounds + 1])
    ends = np.concatenate([bounds + 1, [k]])
    for i0, i1 in zip(starts, ends):
        m = i1 - i0
        if m <= 1:
            continue
        cols = np.asarray(v2[:, 2 * i0 : 2 * i1])   # (2n, 2m) real basis
        c = cols[:n] + 1j * cols[n:]                # (n, 2m), rank m
        q, _, _ = scipy.linalg.qr(c, mode="economic", pivoting=True)
        z[:, i0:i1] = q[:, :m]
    return z


def eigen_h_realpair(
    a_re: jnp.ndarray,
    a_im: jnp.ndarray,
    nvec: Optional[int] = None,
    mode: str = "A",
    ctx: Optional[EigenContext] = None,
) -> Tuple[jnp.ndarray, Optional[ComplexPair], SolveInfo]:
    """Hermitian solve on complex-less backends via the real symmetric
    embedding (module docstring).  Input is A = a_re + i*a_im with a_re
    symmetric, a_im antisymmetric; returns (w, ComplexPair Z, info).

    Modes: 'A', 'N', 'X' (the stage-isolation modes 'S'/'T'/'C' are tied
    to the complex WY reduction and only exist on the native path).
    """
    from eigenexa_tpu.solvers.solver import eigen_s

    mode = mode.upper()
    if mode not in ("A", "N", "X"):
        raise ValueError(
            f"mode {mode!r} requires the native complex path; the real-pair"
            " embedding supports 'A', 'N', 'X'")
    n = a_re.shape[0]
    nvec = n if nvec is None else min(nvec, n)
    t0 = time.perf_counter()
    # hand the 2n×2n embedding over without a caller-frame binding: at
    # n=16384 the pinned 4.3 GB matrix plus the 32k real solve's working
    # set exceeds the chip (the holder empties before eigen_s runs).
    # The input halves are dropped too — when eigen_h passed fresh device
    # arrays (the numpy-complex route) this frees another 2·n² before the
    # solve; tuple/ComplexPair callers keep their own references.
    holder = [embed_hermitian(a_re, a_im)]
    del a_re, a_im
    w2, v2, _ = eigen_s(holder.pop(), nvec=2 * nvec if mode != "N" else None,
                        mode=mode, ctx=ctx)
    w = 0.5 * (w2[0::2] + w2[1::2])
    z = None
    if mode != "N":
        from eigenexa_tpu.ops.zreal import pair_defect

        zr = v2[:n, 0::2]
        zi = v2[n:, 0::2]
        # the polish must NOT run at the TPU's default bf16 matmul
        # precision: its own GEMM noise (~1e-3) would swamp the ~1e-5
        # defect it is correcting.
        # 0.3 separates two regimes with a >10× margin each side: a
        # pathological pick (two extracted columns [nearly] collinear in
        # C^n) puts a ~1 off-diagonal in the Gram matrix, so the
        # entrywise defect is ≥ ~0.5 even for partial overlap — and
        # Newton–Schulz cannot repair it (rank defect; convergence needs
        # ‖ZᴴZ−I‖₂ < 1).  A clean extraction's defect is within-pair
        # rounding noise, measured ≤ ~1e-2 at f32 (tests assert both
        # regimes: tests/test_hermitian_embed.py::test_defect_threshold_*).
        # The defect is measured BEFORE the polish so the (common) clean
        # branch can FREE the 4n² embedding eigenvectors first — at
        # n=16384 that buffer plus the polish transients exceeds the chip.
        with jax.default_matmul_precision(
                (ctx or default_context()).config.matmul_precision):
            defect = float(pair_defect(zr, zi))
            if defect > 0.3:
                zr, zi, _ = newton_schulz_unitarize(zr, zi, iters=2)
                zfix = _host_cluster_fix(
                    w, zr, zi, v2, eps=float(jnp.finfo(zr.dtype).eps))
                zr = jnp.asarray(np.ascontiguousarray(zfix.real))
                zi = jnp.asarray(np.ascontiguousarray(zfix.imag))
            else:
                del v2
                zr, zi, _ = newton_schulz_unitarize(zr, zi, iters=2,
                                                    donate=True)
        z = ComplexPair(zr, zi)
    elapsed = time.perf_counter() - t0
    info = SolveInfo(
        flops=2.0 * flop_model(2 * n, 2 * nvec, mode == "A"),
        elapsed=elapsed, n=n, nvec=nvec, mode=mode,
    )
    return w, z, info
