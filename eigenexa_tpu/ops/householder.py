"""Blocked Householder tridiagonalization kernels (real symmetric and
complex Hermitian).

TPU-first re-design of the reference's TRD/HRD kernel families
(reference: src/eigen_trd.F:349 panel loop, src/eigen_trd_t4.F:81
compute_u, src/eigen_trd_t2.F:161 mat-vec, src/eigen_trd_t6_3.F:85
compute_v, src/eigen_t1.F:68 rank-2m trailing update; Hermitian twins
src/eigen_hrd_t*.F).

Differences from the reference (deliberate, TPU-idiomatic):

* The panel recurrence is a ``lax.fori_loop`` over columns with *static*
  shapes — masking replaces the reference's cyclic index algebra.  The
  trailing matrix for each panel is a statically-shaped slice (the panel
  loop runs in Python, so slices are concrete), keeping every GEMM
  MXU-tileable.
* The symmetric/Hermitian trailing update ``A -= U·Wᴴ + W·Uᴴ`` is done on
  the full square block (2× the triangular flop count) because dense MXU
  GEMM at 2× flops beats any masked/triangular formulation on the systolic
  array.
* One code path serves real and complex: reflectors use the zlarfg
  convention (β always real), so the Hermitian reduction produces a real
  tridiagonal directly — the same contract the reference's eigen_hrd
  provides for the real D&C stage (src/eigen_h.F:154-231).
* No cache-alignment (CSTAB) machinery: XLA owns layout; panel widths are
  multiples of the MXU tile instead.

All functions are dtype-generic (f32/f64/c64/c128) and jit-safe.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# global dispatch override for tridiagonalize(impl="auto") — settable from
# tests/benchmarks (env EIGENEXA_TRD_IMPL or assignment): "auto" picks
# windowed on TPU/f32 and rolled elsewhere; "rolled"/"windowed" force.
TRD_IMPL = os.environ.get("EIGENEXA_TRD_IMPL", "auto")


class TridiagResult(NamedTuple):
    d: jnp.ndarray      # (n,)  real diagonal of T
    e: jnp.ndarray      # (n-1,) real sub-diagonal of T
    v: jnp.ndarray      # (n, n) Householder vectors; column k holds the
                        #        reflector zeroing A[k+2:, k] (rows <= k
                        #        are 0, row k+1 is 1)
    tau: jnp.ndarray    # (n,) reflector scales (tau[k]=0 -> identity);
                        #      complex for Hermitian input


def _real_dtype(dtype):
    return jnp.finfo(dtype).dtype if not jnp.issubdtype(
        dtype, jnp.complexfloating
    ) else jnp.zeros((), dtype).real.dtype


def householder_vector(x: jnp.ndarray, mask: jnp.ndarray):
    """dlarfg/zlarfg analogue: reflector (v, tau, beta) annihilating the
    masked tail of x below its first masked element (the pivot alpha).

    Returns v (masked, v[pivot]=1), tau (0 when nothing to do), and the
    *real* beta — the resulting sub-diagonal value.  For complex input the
    zlarfg convention rotates the pivot phase into the reflector so beta is
    real (this is what lets the Hermitian path feed a real tridiagonal to
    the D&C stage, reference: src/eigen_hrd_t4.F / eigen_h.F:154).

    Robustness: the tail is pre-scaled by its max-abs before the norm, so
    ‖x‖² cannot overflow/underflow in f32 — the analogue of [dz]larfg's
    rescaling loop.
    """
    dtype = x.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    xm = jnp.where(mask, x, 0)
    idx = jnp.arange(x.shape[0])
    pividx = jnp.min(jnp.where(mask, idx, x.shape[0]))
    pividx = jnp.minimum(pividx, x.shape[0] - 1)
    alpha = xm[pividx]
    tail_mask = mask & (idx != pividx)
    tail = jnp.where(tail_mask, x, 0)
    scale = jnp.maximum(jnp.max(jnp.abs(tail)), jnp.finfo(rdtype).tiny)
    xnorm = jnp.linalg.norm(tail / scale) * scale  # real
    alphr = jnp.real(alpha)
    alphi = jnp.imag(alpha)
    mag = jnp.sqrt(alphr * alphr + alphi * alphi + xnorm * xnorm)
    beta = jnp.where(alphr >= 0, -mag, mag)  # real, opposite sign of alphr
    active = (xnorm > 0) | (alphi != 0)
    safe_beta = jnp.where(active, beta, jnp.asarray(1.0, rdtype))
    tau = jnp.where(
        active, (safe_beta.astype(dtype) - alpha) / safe_beta, 0.0
    ).astype(dtype)
    denom = jnp.where(active, alpha - safe_beta.astype(dtype), 1.0)
    v = jnp.where(tail_mask, x / denom, 0.0)
    v = v.at[pividx].set(jnp.where(active, 1.0, 0.0))
    beta_out = jnp.where(active, beta, alphr)
    return v.astype(dtype), tau, beta_out.astype(rdtype)


def _panel_body(j, carry, b):
    """One column of the [dz]latrd-style panel recurrence.

    b: (m, m) trailing matrix (frozen copy at panel start).
    carry: (u_panel (m,nb), w_panel (m,nb), tau (nb,), e (nb,)).
    The current column sees previous in-panel reflectors through the U/W
    correction terms (reference latency-hides this as eigen_trd_t5.F;
    here it is a dense masked matmul fused by XLA).
    """
    u_p, w_p, tau_p, e_p = carry
    m = b.shape[0]

    col = lax.dynamic_index_in_dim(b, j, axis=1, keepdims=False)  # (m,)
    w_row = lax.dynamic_index_in_dim(w_p, j, axis=0, keepdims=False)
    u_row = lax.dynamic_index_in_dim(u_p, j, axis=0, keepdims=False)
    # apply previous in-panel rank-2 updates to this column:
    # A_cur = B - U·Wᴴ - W·Uᴴ  =>  A_cur[:, j] = B[:, j] - U·conj(W[j]) - W·conj(U[j])
    col = col - u_p @ jnp.conj(w_row) - w_p @ jnp.conj(u_row)

    idx = jnp.arange(m)
    mask = idx > j  # strictly-below-diagonal part of column j
    v, tau, beta = householder_vector(col, mask)

    # q = A_cur·v  (reference: eigen_trd_au, src/eigen_trd_t2.F:161 — the
    # comm-dominant distributed symv; one GEMV on the MXU per column here)
    q = b @ v
    q = q - u_p @ (jnp.conj(w_p.T) @ v) - w_p @ (jnp.conj(u_p.T) @ v)
    # w = tau·q - (|tau|²/2)·(vᴴ·q)·v  so that Hᴴ·A·H = A - v·wᴴ - w·vᴴ
    # with the zlarfg convention Hᴴ = I - conj(tau)·v·vᴴ annihilating the
    # column (reference couplings: eigen_trd_compute_v,
    # src/eigen_trd_t6_3.F:85)
    w = tau * q - (tau * jnp.conj(tau) * 0.5) * (jnp.vdot(v, q)) * v

    u_p = lax.dynamic_update_index_in_dim(u_p, v, j, axis=1)
    w_p = lax.dynamic_update_index_in_dim(w_p, w, j, axis=1)
    tau_p = tau_p.at[j].set(tau)
    e_p = e_p.at[j].set(beta)
    return u_p, w_p, tau_p, e_p


def tridiag_panel(b: jnp.ndarray, nb: int):
    """Factor `nb` columns of the trailing matrix `b` (m×m).

    Returns (u_panel, w_panel, tau, e): after this the trailing update is
    b[nb:, nb:] -= U[nb:]·Wᴴ[nb:] + W[nb:]·Uᴴ[nb:].
    """
    m = b.shape[0]
    dtype = b.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    init = (
        jnp.zeros((m, nb), dtype),
        jnp.zeros((m, nb), dtype),
        jnp.zeros((nb,), dtype),
        jnp.zeros((nb,), rdtype),
    )
    body = functools.partial(_panel_body, b=b)
    return lax.fori_loop(0, nb, body, init)


def _panel_diag(b, u_p, w_p, nb: int):
    """Real diagonal of the updated panel columns:
    d_j = Re(B[j,j] − Σ_l (U[j,l]·conj(W[j,l]) + W[j,l]·conj(U[j,l])))."""
    diag = jnp.real(jnp.diagonal(b))[:nb]
    corr = 2.0 * jnp.sum(
        jnp.real(u_p[:nb] * jnp.conj(w_p[:nb])), axis=1
    )
    return diag - corr


@functools.partial(jax.jit, static_argnames=("nb",))
def _tridiag_step(b, nb: int):
    """One panel + trailing rank-2nb update, jitted per trailing size."""
    u_p, w_p, tau_p, e_p = tridiag_panel(b, nb)
    # rank-2k trailing update (reference: eigen_common_2update,
    # src/eigen_t1.F:68) — the flops-dominant contraction, fused with the
    # subtract into one HBM pass (Pallas on TPU; concat-GEMM elsewhere)
    from eigenexa_tpu.ops.pallas_kernels import rank2k_update

    b2 = rank2k_update(b[nb:, nb:], u_p[nb:], w_p[nb:])
    diag = _panel_diag(b, u_p, w_p, nb)
    return b2, u_p, w_p, tau_p, e_p, diag


@functools.partial(jax.jit, static_argnames=("m",))
def _remainder_step(b, m: int):
    u_p, w_p, tau_p, e_p = tridiag_panel(b, m)
    diag = _panel_diag(b, u_p, w_p, m)
    return u_p, w_p, tau_p, e_p, diag


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# windowed (no-roll) reduction — the TPU/f32 fast path
# ---------------------------------------------------------------------------

from eigenexa_tpu.ops.pallas_kernels import _SYMV_TM as _WIN_TM  # one knob


def _panel_win(b, j0, t0: int, nb: int, interpret: bool):
    """latrd panel recurrence in the fixed-buffer windowed frame: rows
    keep their global indices, the active window is [t0·256:, t0·256:],
    and the symv reads only the window's lower triangle
    (ops/pallas_kernels.symv_lower).  Real f32 only.

    Rows of b above the current panel hold stale (already-processed)
    data; every vector that could carry those rows into live values is
    masked (v by the reflector mask, w by `idx >= j0`), which also keeps
    the stale region from being written — so staleness stays bounded by
    the original matrix magnitude instead of compounding.
    """
    from eigenexa_tpu.ops.pallas_kernels import symv_lower

    n_pad = b.shape[0]
    dtype = b.dtype
    idx = jnp.arange(n_pad)
    init = (
        jnp.zeros((n_pad, nb), dtype),
        jnp.zeros((n_pad, nb), dtype),
        jnp.zeros((nb,), dtype),
        jnp.zeros((nb,), dtype),
    )

    def body(jc, carry):
        u_p, w_p, tau_p, e_p = carry
        j = j0 + jc
        col = lax.dynamic_index_in_dim(b, j, axis=1, keepdims=False)
        w_row = lax.dynamic_index_in_dim(w_p, j, axis=0, keepdims=False)
        u_row = lax.dynamic_index_in_dim(u_p, j, axis=0, keepdims=False)
        col = col - u_p @ w_row - w_p @ u_row
        v, tau, beta = householder_vector(col, idx > j)
        q = symv_lower(b, v, t0=t0, interpret=interpret)
        q = q - u_p @ (w_p.T @ v) - w_p @ (u_p.T @ v)
        w = tau * q - (tau * tau * 0.5) * jnp.dot(v, q) * v
        w = jnp.where(idx >= j0, w, 0.0)
        u_p = lax.dynamic_update_index_in_dim(u_p, v, jc, axis=1)
        w_p = lax.dynamic_update_index_in_dim(w_p, w, jc, axis=1)
        tau_p = tau_p.at[jc].set(tau)
        e_p = e_p.at[jc].set(beta)
        return u_p, w_p, tau_p, e_p

    return lax.fori_loop(0, nb, body, init)


def _win_schedule(n: int, nb: int, group: int):
    """Panel offsets per window group: group g covers offsets
    [g·group, (g+1)·group); returns ({g: [offsets]}, first remainder k)."""
    groups: dict = {}
    m_act, k = n, 0
    while m_act > nb:
        groups.setdefault(k // group, []).append(k)
        k += nb
        m_act -= nb
    return groups, k


@functools.partial(jax.jit, static_argnames=("nb", "t0", "interpret"),
                   donate_argnums=(0, 1, 2, 3))
def _win_group(b, tau_full, d, e, ks, nb: int, t0: int, interpret: bool):
    """One window group of the no-roll reduction: a `lax.scan` over the
    group's panels at a fixed tile window t0.  All four carries are
    donated, so the working buffer is updated in place across the eager
    group loop (the reference factors A in place, src/eigen_trd.F:349)."""
    from eigenexa_tpu.ops.pallas_kernels import rank2k_update_window

    def body(carry, j0):
        bc, tf, dc, ec = carry
        u_p, w_p, tau_p, e_p = _panel_win(bc, j0, t0, nb, interpret)
        dg = lax.dynamic_slice(bc, (j0, j0), (nb, nb))
        z32 = jnp.int32(0)  # literals must match j0's int32 under x64
        ug = lax.dynamic_slice(u_p, (j0, z32), (nb, nb))
        wg = lax.dynamic_slice(w_p, (j0, z32), (nb, nb))
        diag = jnp.diagonal(dg) - 2.0 * jnp.sum(ug * wg, axis=1)
        bc = rank2k_update_window(bc, u_p, w_p, t0=t0,
                                  interpret=interpret)
        # store V in place of the just-processed (dead) panel columns
        bc = lax.dynamic_update_slice(bc, u_p, (z32, j0))
        tf = lax.dynamic_update_slice(tf, tau_p, (j0,))
        dc = lax.dynamic_update_slice(dc, diag, (j0,))
        ec = lax.dynamic_update_slice(ec, e_p, (j0,))
        return (bc, tf, dc, ec), None

    (b, tau_full, d, e), _ = lax.scan(body, (b, tau_full, d, e), ks)
    return b, tau_full, d, e


@functools.partial(jax.jit, static_argnames=("k", "n"),
                   donate_argnums=(0,))
def _win_finish(b, tau_full, d, e, k: int, n: int) -> TridiagResult:
    """Remainder panel (m ≤ nb) + in-place V store + final slicing."""
    n_pad = b.shape[0]
    dtype = b.dtype
    m = n - k
    if m > 1:
        b_rem = lax.slice(b, (k, k), (n, n))
        u_p, w_p, tau_p, e_p = tridiag_panel(b_rem, m)
        diag = _panel_diag(b_rem, u_p, w_p, m)
        d = d.at[k : k + m].set(diag)
        e = e.at[k : k + m - 1].set(e_p[: m - 1])
        vcol = jnp.zeros((n_pad, m), dtype).at[k:n, :].set(u_p)
        b = b.at[:, k : k + m].set(vcol)
        tau_full = tau_full.at[k : k + m].set(tau_p)
    elif m == 1:
        d = d.at[k].set(b[k, k])
        b = b.at[:, k].set(jnp.zeros((n_pad,), dtype))
    return TridiagResult(d=d[:n], e=e[: max(n - 1, 1)][: n - 1],
                         v=b[:n, :n], tau=tau_full[:n])


def _tridiagonalize_windowed(a: jnp.ndarray, nb: int, group: int,
                             interpret: bool) -> TridiagResult:
    """No-roll reduction: ONE fixed (n_pad, n_pad) working buffer for the
    whole factorization.  Panels advance down the diagonal in the global
    frame; a statically-shrinking tile window bounds the work to the live
    trailing block, the symv kernel reads only the window's lower
    triangle, and the rank-2k trailing update aliases its output onto the
    buffer (rank2k_update_window).

    Reflectors are stored IN PLACE: after a panel's trailing update, its
    (dead) columns of the working buffer are overwritten with the panel's
    reflector vectors — exactly the reference's scheme of factoring A in
    place and keeping V in the zeroed-out part of the reduced matrix
    (src/eigen_trd.F:349 panel loop over A; src/eigen_trd_t7.F:72,208
    panel load/restore).  Later panels never read those columns as data:
    the rank-2k delta there is exactly zero (both U and the j0-masked W
    vanish on rows < j0), and the windowed symv's reads of them only feed
    result rows that the recurrence masks away.  Peak memory is therefore
    ~1·n² + O(n·nb).

    Orchestration is EAGER per window group (~8 jitted programs with all
    carries donated), like the per-level D&C dispatch: a single fused
    program at n=32768 crashes the TPU worker (reproduced — one or two
    groups run fine, the full monolith does not), and per-group dispatch
    also bounds compile size and single-dispatch runtime.  Dispatch
    latency is ~ms against multi-second group runtimes.  NOTE: the input
    buffer is CONSUMED (donated into the first group / used as the
    working buffer) — `tridiagonalize` copies unless donate=True.
    """
    n = a.shape[0]
    dtype = a.dtype
    tm = _WIN_TM
    n_pad = _round_up(n, tm)
    b = (a if n_pad == n
         else jnp.zeros((n_pad, n_pad), dtype).at[:n, :n].set(a))

    d = jnp.zeros((n_pad,), dtype)
    e = jnp.zeros((n_pad,), dtype)
    tau_full = jnp.zeros((n_pad,), dtype)

    groups, k = _win_schedule(n, nb, group)
    for g in sorted(groups):
        t0 = (g * group) // tm
        ks = jnp.asarray(groups[g], dtype=jnp.int32)
        b, tau_full, d, e = _win_group(b, tau_full, d, e, ks,
                                       nb=nb, t0=t0, interpret=interpret)
    return _win_finish(b, tau_full, d, e, k=k, n=n)


def _hbm_bytes() -> float:
    """Usable device memory for the rolled-vs-windowed dispatch.  Queried
    from the device when available (v4 has 32 GB, v5p 95 GB — a 16 GB
    constant would force the windowed path too early there)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit", 0)
        if limit and limit > 0:
            return float(limit)
    except Exception:
        pass
    return 16e9


def _rolled_peak_bytes(n: int, itemsize: int = 4) -> float:
    """Empirical whole-solve peak of the rolled path: ~15 f32 n²
    buffer-equivalents once XLA scan double-buffering and stage temps are
    counted (measured on v5e: n=8192 fits a 16 GB chip comfortably,
    n=16384 hits RESOURCE_EXHAUSTED)."""
    return 15.0 * n * n * itemsize


def _needs_windowed(n: int, hbm_bytes: float) -> bool:
    """The pure memory rule of the rolled-vs-windowed dispatch, split out
    so the boundary is unit-testable against a mocked device memory
    (tests/test_windowed_trd.py)."""
    return _rolled_peak_bytes(n) > 0.9 * hbm_bytes


def _windowed_eligible(a, n: int) -> bool:
    """The windowed path needs the Pallas kernels (TPU backend, f32,
    real).  Measured on v5e: the rolled fused path is FASTER at every
    size it fits (XLA's in-program matvec streams at ~70% of HBM
    roofline; the packed-triangle symv kernel runs at ~1/3 of that, so
    halving traffic still loses) — windowed is the *memory* path: ~1·n²
    live for the reduction itself (in-place V storage) vs the rolled
    whole-solve peak of `_rolled_peak_bytes`, so it is chosen only when
    that rolled peak would pressure the HBM."""
    from eigenexa_tpu.ops import pallas_kernels as pk

    if a.dtype != jnp.float32 or n < 512:
        return False
    if pk._DISABLED or not pk._HAS_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    return _needs_windowed(n, _hbm_bytes())


def tridiagonalize(a: jnp.ndarray, nb: int = 64,
                   bucket: int = 0, impl: str = "auto",
                   donate: bool = False) -> TridiagResult:
    """Reduce symmetric/Hermitian A (n×n) to real tridiagonal T = Qᴴ A Q.

    Q = H_0·H_1·…·H_{n-3}; reflector k is stored in column k of the
    returned v (global indexing).  Driver analogue: src/eigen_trd.F:82
    (real) / src/eigen_hrd.F:1 (complex).

    NOTE: the windowed implementation DONATES the input buffer (its
    working matrix aliases `a`, reference in-place analogue:
    eigen_trd.F:349) — on TPU the caller must not reuse `a` after a
    windowed call.  The solver facade always passes the scaled temporary
    a_s, so driver users are unaffected.

    The whole loop is traced into one XLA program (the
    `_tridiagonalize_fused` jit below): an eager loop would dispatch ~6
    programs per panel, and per-dispatch latency on a tunneled TPU
    dominates the n=2048 solve.  Panels whose bucket-padded trailing shape
    coincides are run as ONE ``lax.scan`` (the working matrix keeps the
    padded shape and is rolled up-left by nb after each panel), so trace
    and compile cost scale with the number of BUCKETS (~8), not panels
    (n/nb) — the panel math is transparent to trailing zeros, and the
    padding trades ≲12% extra GEMM flops for a compile time independent
    of n/nb (reference contrast: cyclic(1) MPI ranks never re-"compile",
    but an XLA program is per-shape).
    """
    n = a.shape[0]
    if impl == "auto":
        impl = TRD_IMPL
    if impl == "auto":
        impl = "windowed" if _windowed_eligible(a, n) else "rolled"
    if impl == "windowed":
        group = _round_up(max(4 * nb, _round_up(n, _WIN_TM) // 8), _WIN_TM)
        if not donate:
            # the windowed jit donates its input (working buffer aliases
            # it); keep the public default non-destructive via a copy —
            # same peak as the pre-donation behavior, while donate=True
            # callers (the solver's large-n staged path, which passes the
            # scaled temporary) save one n² buffer
            a = a + jnp.zeros((), a.dtype)
        return _tridiagonalize_windowed(
            a, nb, group, interpret=jax.default_backend() != "tpu")
    if bucket <= 0:
        bucket = max(4 * nb, _round_up(n // 8, nb) if n >= 8 * nb else nb)
    return _tridiagonalize_fused(a, nb, bucket)


@functools.partial(jax.jit, static_argnames=("nb", "bucket"))
def _tridiagonalize_fused(a: jnp.ndarray, nb: int,
                          bucket: int) -> TridiagResult:
    n = a.shape[0]
    dtype = a.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    d = jnp.zeros((n,), rdtype)
    e = jnp.zeros((max(n - 1, 1),), rdtype)
    v_full = jnp.zeros((n, n), dtype)
    tau_full = jnp.zeros((n,), dtype)

    # panel schedule: consecutive panels sharing a bucket-padded trailing
    # shape form one group -> one lax.scan per group
    groups = []  # [(padded shape, [global column offsets])]
    m_act, k = n, 0
    while m_act > nb:
        s = (_round_up(m_act, bucket) if m_act > 4 * nb
             else _round_up(m_act, nb))
        if groups and groups[-1][0] == s:
            groups[-1][1].append(k)
        else:
            groups.append((s, [k]))
        k += nb
        m_act -= nb

    b = a
    if groups and groups[0][0] != n:
        s0 = groups[0][0]
        b = jnp.zeros((s0, s0), dtype).at[:n, :n].set(a)

    for s, offs in groups:
        if b.shape[0] > s:
            b = b[:s, :s]  # active block is top-left; tail is zero/dead

        def body(bc, _):
            u_p, w_p, tau_p, e_p = tridiag_panel(bc, nb)
            diag = _panel_diag(bc, u_p, w_p, nb)
            from eigenexa_tpu.ops.pallas_kernels import rank2k_update

            b2 = rank2k_update(bc[nb:, nb:], u_p[nb:], w_p[nb:])
            # roll the trailing matrix up-left, keeping the padded shape
            # (the freed border becomes zeros, which every panel op treats
            # as inert)
            bn = jnp.zeros_like(bc).at[: -nb, : -nb].set(b2)
            return bn, (u_p, tau_p, e_p, diag)

        b, (us, taus, es, diags) = lax.scan(body, b, None, length=len(offs))
        for j, kg in enumerate(offs):
            d = lax.dynamic_update_slice(d, diags[j], (kg,))
            e = lax.dynamic_update_slice(e, es[j], (kg,))
            v_full = v_full.at[kg:, kg : kg + nb].set(us[j][: n - kg])
            tau_full = lax.dynamic_update_slice(tau_full, taus[j], (kg,))

    k = sum(len(offs) for _, offs in groups) * nb

    # remainder block (m <= nb): factor its columns; no trailing update
    m = n - k
    if m > 1:
        if b.shape[0] > m:
            b = b[:m, :m]
        u_p, w_p, tau_p, e_p, diag = _remainder_step(b, m)
        d = lax.dynamic_update_slice(d, diag, (k,))
        e = lax.dynamic_update_slice(e, e_p[: m - 1], (k,))
        v_full = v_full.at[k:, k:].set(u_p)
        tau_full = lax.dynamic_update_slice(tau_full, tau_p, (k,))
    elif m == 1:
        d = d.at[k].set(jnp.real(b[0, 0]))

    return TridiagResult(d=d, e=e[: max(n - 1, 1)][: n - 1], v=v_full,
                         tau=tau_full)


# ---------------------------------------------------------------------------
# compact WY: T factor and blocked application (back-transform building block)
# ---------------------------------------------------------------------------

def wy_t_factor(v: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular T with H_0·…·H_{b-1} = I − V·T·Vᴴ (dlarft analogue,
    used by the trbakwy4/hrbakwy4 back-transforms,
    reference: src/trbakwy4_body.F, src/hrbakwy4_body.F).

    Uses the closed form T⁻¹ = diag(1/τ) + strict_upper(VᴴV) and one
    triangular solve — no sequential column loop, MXU-friendly.
    Columns with τ=0 have v=0 and drop out automatically.
    """
    return wy_t_from_gram(jnp.conj(v.T) @ v, tau)


def wy_t_from_gram(g: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """`wy_t_factor` from a precomputed Gram matrix G = VᴴV — the form the
    distributed back-transform needs, where G is assembled by a psum of
    per-shard partial Grams (reference: the reduce_dbl of the SSᵀ=VᵀZ
    products, src/trbakwy4_body.F:235)."""
    nb = tau.shape[0]
    safe_tau = jnp.where(tau != 0, tau, 1.0)
    inv_tau = jnp.where(tau != 0, 1.0 / safe_tau, 1.0)
    t_inv = jnp.triu(g, k=1) + jnp.diag(inv_tau)
    eye = jnp.eye(nb, dtype=g.dtype)
    return jax.scipy.linalg.solve_triangular(t_inv, eye, lower=False)


def apply_wy_left(z: jnp.ndarray, v: jnp.ndarray, t: jnp.ndarray):
    """Z ← (I − V·T·Vᴴ)·Z — one WY block of the back-transform
    (reference: the S=VᵀZ / Z+=V·S̃ GEMM pair,
    src/trbakwy4_body.F:573-625,721).  The large second product streams
    through the fused subtract-matmul kernel (ops/pallas_kernels.py)."""
    from eigenexa_tpu.ops.pallas_kernels import wy_apply

    return wy_apply(z, v, t)
