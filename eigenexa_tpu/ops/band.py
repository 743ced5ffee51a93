"""Blocked Householder band-2 (pentadiagonal) reduction — the PRD kernels.

TPU-first re-design of the reference's penta-diagonalization family
(reference: src/eigen_prd.F:80 driver with MBAND=2 columns per step
`eigen_prd.F:424`, src/eigen_prd_t4x.F:83 two-column reflector generation
(tall-skinny QR of the 2-column panel), src/eigen_prd_t2.F:90 PDSYMV2
two-vector mat-vec, src/eigen_prd_t6_3.F compute_v with the 2x2 coupling
matrix, src/eigen_prd_t5/t7/t8.F panel plumbing).

This is the reduction behind ``eigen_sx`` (src/eigen_sx.F:30): dense
symmetric A -> pentadiagonal P = Q^T A Q in ONE stage, processing two
columns per step so the trailing update is a rank-4 (2x rank-2) GEMM —
twice the arithmetic intensity per panel column of the tridiagonal path.

Design (deliberate, TPU-idiomatic — mirrors ops/householder.py):

* Pair recurrence inside a ``lax.fori_loop`` with static shapes; the two
  reflectors of a pair are generated column-by-column (Householder QR of
  the masked m x 2 panel — the eigen_prd_t4x TSQR analogue) and combined
  into one block reflector H = I - V T V^H (2x2 T).
* latrd-style U/W panels: after j pairs, A_cur = B - U W^H - W U^H with
  the panel-start trailing matrix B frozen; the flops-dominant trailing
  update is one dense rank-2nb GEMM pair on the MXU (eigen_common_2update,
  src/eigen_t1.F:68, shared with TRD in the reference too).
* Band entries (d, e1, e2) are extracted at panel end from
  B - U W^H - W U^H — later reflectors cannot touch them (their masks start
  two rows below), so the extraction is exact.
* Reflector storage matches TridiagResult: column k of `v` holds the
  reflector annihilating A[k+3:, k] (pivot row k+2, zeros in rows <= k+1),
  so the WY back-transform (solvers/trbak.py) applies unchanged with
  MBAND=2 semantics (reference: eigen_common_trbakwy handles iblk=1 or 2,
  src/trbakwy4.F:77).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from eigenexa_tpu.ops.householder import householder_vector


class BandResult(NamedTuple):
    d: jnp.ndarray    # (n,)   real diagonal of the pentadiagonal P
    e1: jnp.ndarray   # (n-1,) first sub-diagonal (real)
    e2: jnp.ndarray   # (n-2,) second sub-diagonal (real)
    v: jnp.ndarray    # (n, n) Householder vectors; column k zeroes
                      #        A[k+3:, k] (pivot row k+2)
    tau: jnp.ndarray  # (n,)   reflector scales (0 -> identity)


def pair_reflectors(x0, x1, c0, idx):
    """Generate the band-2 reflector pair for columns (c0, c0+1) — the
    tall-skinny-QR scheme of the reference's eigen_prd_compute_u
    (src/eigen_prd_t4x.F:83; numerical-sensitivity note
    ReleaseNotes.txt:29-31):

    1. **CholeskyQR2 pre-orthogonalization**: the second column is
       orthogonalized against the first through Gram coefficients,
       TWICE (the reference's itr=1,2 Gram/modified-Cholesky loop,
       eigen_prd_t4x.F:140-283) — after two passes the pair is
       orthogonal to O(ε) even when the columns are nearly parallel
       (one explicit projection leaves O(ε·κ)).
    2. Reflector 0 from the (untouched) first column.
    3. **Analytic H0 application** to the orthogonalized second column:
       by orthogonality v0ᴴ·a1 = −β0·a1[p0]/conj(α0−β0) exactly — no
       cancellation-prone inner product (the reference's
       `s = sgm(2)*u_t(5)/bet(2)` rank-1 fix-up, eigen_prd_t4x.F:305).
    4. Reflector 1 from the result.

    An inaccurate second reflector leaves non-pentadiagonal residue that
    the band extraction silently drops — this scheme bounds that residue
    by O(ε·‖A‖) instead of O(ε·κ·‖A‖), which is what keeps the
    eigen_sx eigenvalue error from growing with n.

    Returns (v_pair (m, 2), tau0, tau1, t (2, 2)) with
    H0·H1 = I − V·T·Vᴴ (upper-triangular 2×2 T).
    """
    dtype = x0.dtype
    mask0 = idx > c0 + 1          # support of v0 (pivot row c0+2)
    mask1 = idx > c0 + 2          # support of v1 (pivot row c0+3)
    a0 = jnp.where(mask0, x0, 0)
    a1 = jnp.where(mask0, x1, 0)  # common region includes row c0+2
    t11 = jnp.real(jnp.vdot(a0, a0))
    safe_t11 = jnp.where(t11 > 0, t11, 1.0)
    for _ in range(2):            # CholeskyQR2: twice is enough
        s12 = jnp.vdot(a0, a1) / safe_t11
        a1 = a1 - jnp.where(t11 > 0, s12, 0.0) * a0

    v0, tau0, beta0 = householder_vector(a0, mask0)
    # analytic H0ᴴ·a1 via exact pair orthogonality (a0ᴴ·a1 = 0):
    # v0ᴴ·a1 = −β0·a1[p0]/conj(α0−β0)
    p0 = jnp.minimum(c0 + 2, idx.shape[0] - 1)
    alpha0 = a0[p0]
    denom0 = jnp.where(tau0 != 0, alpha0 - beta0.astype(dtype), 1.0)
    vha1 = -beta0.astype(dtype) * a1[p0] / jnp.conj(denom0)
    c1 = a1 - jnp.conj(tau0) * vha1 * v0
    v1, tau1, _ = householder_vector(c1, mask1)

    v_pair = jnp.stack([v0, v1], axis=1)
    t01 = -tau0 * tau1 * jnp.vdot(v0, v1)
    t = jnp.array([[1.0, 0.0], [0.0, 0.0]], dtype) * tau0 \
        + jnp.array([[0.0, 0.0], [0.0, 1.0]], dtype) * tau1 \
        + jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype) * t01
    return v_pair, tau0, tau1, t


def _pair_body(j, carry, b, nb):
    """One 2-column step of the band-2 panel recurrence.

    b: (m, m) trailing matrix frozen at panel start.
    carry: (u_panel (m,nb), w_panel (m,nb), tau (nb,)).
    Columns c0=2j, c0+1 see previous in-panel pairs through the U/W
    correction (A_cur = B - U W^H - W U^H).
    """
    u_p, w_p, tau_p = carry
    m = b.shape[0]
    dtype = b.dtype
    c0 = 2 * j

    cols = lax.dynamic_slice(b, (0, c0), (m, 2))              # (m, 2)
    w_rows = lax.dynamic_slice(w_p, (c0, 0), (2, nb))         # (2, nb)
    u_rows = lax.dynamic_slice(u_p, (c0, 0), (2, nb))
    cols = cols - u_p @ jnp.conj(w_rows).T - w_p @ jnp.conj(u_rows).T

    idx = jnp.arange(m)
    v_pair, tau0, tau1, t = pair_reflectors(
        cols[:, 0], cols[:, 1], c0, idx)

    # P = A_cur · V · T  (the PDSYMV2 analogue: both vectors in one pass —
    # reference: eigen_prd_au, src/eigen_prd_t2.F:90)
    av = b @ v_pair \
        - u_p @ (jnp.conj(w_p).T @ v_pair) \
        - w_p @ (jnp.conj(u_p).T @ v_pair)
    p = av @ t
    # S = T^H V^H P (2x2 Hermitian);  W = P − ½·V·S  so that
    # H^H A H = A − V W^H − W V^H   (the 2x2 coupling matrix `c` of
    # eigen_prd_compute_v, reference: src/eigen_prd.F:363)
    s = jnp.conj(t).T @ (jnp.conj(v_pair).T @ p)
    w_pair = p - 0.5 * v_pair @ s

    u_p = lax.dynamic_update_slice(u_p, v_pair, (0, c0))
    w_p = lax.dynamic_update_slice(w_p, w_pair, (0, c0))
    tau_p = lax.dynamic_update_slice(tau_p, jnp.stack([tau0, tau1]), (c0,))
    return u_p, w_p, tau_p


def band2_panel(b: jnp.ndarray, nb: int):
    """Factor `nb` (even) columns of the trailing matrix b (m x m) as
    band-2 reflector pairs.  Returns (u_panel, w_panel, tau)."""
    m = b.shape[0]
    dtype = b.dtype
    init = (
        jnp.zeros((m, nb), dtype),
        jnp.zeros((m, nb), dtype),
        jnp.zeros((nb,), dtype),
    )
    body = functools.partial(_pair_body, b=b, nb=nb)
    return lax.fori_loop(0, nb // 2, body, init)


def _extract_band(b, u_p, w_p, nb: int):
    """(d, e1, e2) for the panel columns from A_cur = B − U W^H − W U^H.

    Safe at panel end: later reflectors act on rows two below these
    entries (the similarity transform preserves them exactly)."""
    def corr(row_off):
        # sum_l U[j+off,l]·conj(W[j,l]) + W[j+off,l]·conj(U[j,l]) for j<nb
        u_hi = u_p[row_off:row_off + nb]
        w_hi = w_p[row_off:row_off + nb]
        return jnp.sum(
            u_hi * jnp.conj(w_p[:nb]) + w_hi * jnp.conj(u_p[:nb]), axis=1
        )

    d = jnp.real(jnp.diagonal(b)[:nb] - corr(0))
    e1 = jnp.real(jnp.diagonal(b, -1)[:nb] - corr(1))
    e2 = jnp.real(jnp.diagonal(b, -2)[:nb] - corr(2))
    return d, e1, e2


@functools.partial(jax.jit, static_argnames=("nb",))
def _band2_step(b, nb: int):
    """One panel + rank-2nb trailing update (the PRD analogue of
    eigen_common_2update, src/eigen_t1.F:68)."""
    from eigenexa_tpu.ops.pallas_kernels import rank2k_update

    u_p, w_p, tau_p = band2_panel(b, nb)
    b2 = rank2k_update(b[nb:, nb:], u_p[nb:], w_p[nb:])
    d, e1, e2 = _extract_band(b, u_p, w_p, nb)
    return b2, u_p, w_p, tau_p, d, e1, e2


@functools.partial(jax.jit, static_argnames=("m",))
def _band2_remainder(b, m: int):
    """Final block: pad by two zero rows/cols so the (d,e1,e2) extraction
    for the last columns stays in-bounds, factor everything."""
    mp = b.shape[0]                       # m + pad (>= m + 2, even)
    u_p, w_p, tau_p = band2_panel(b, mp - mp % 2)
    d, e1, e2 = _extract_band(b, u_p, w_p, m)
    return u_p, w_p, tau_p, d, e1, e2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# windowed (no-roll) band-2 reduction — the TPU/f32 fast path
# ---------------------------------------------------------------------------

def _pair_win(b, j0, t0: int, nb: int, interpret: bool):
    """Band-2 pair recurrence in the fixed-buffer windowed frame (see
    ops/householder._panel_win for the scheme).  Real f32 only; the
    two-vector mat-vec runs through the lower-triangle symv kernel
    (nc=2 — the PDSYMV2 analogue, src/eigen_prd_t2.F:90)."""
    from eigenexa_tpu.ops.pallas_kernels import symv_lower

    n_pad = b.shape[0]
    dtype = b.dtype
    idx = jnp.arange(n_pad)
    init = (
        jnp.zeros((n_pad, nb), dtype),
        jnp.zeros((n_pad, nb), dtype),
        jnp.zeros((nb,), dtype),
    )
    z32 = jnp.int32(0)

    def body(jc, carry):
        u_p, w_p, tau_p = carry
        jc = jc.astype(jnp.int32)  # fori index is int64 under x64
        c0 = j0 + 2 * jc
        cols = lax.dynamic_slice(b, (z32, c0), (n_pad, 2))
        # u_p/w_p rows are global in the windowed frame
        w_rows = lax.dynamic_slice(w_p, (c0, z32), (2, nb))
        u_rows = lax.dynamic_slice(u_p, (c0, z32), (2, nb))
        cols = cols - u_p @ w_rows.T - w_p @ u_rows.T
        v_pair, tau0, tau1, t = pair_reflectors(
            cols[:, 0], cols[:, 1], c0, idx)
        av = symv_lower(b, v_pair, t0=t0, interpret=interpret)
        av = av - u_p @ (w_p.T @ v_pair) - w_p @ (u_p.T @ v_pair)
        p = av @ t
        s = t.T @ (v_pair.T @ p)
        w_pair = p - 0.5 * v_pair @ s
        w_pair = jnp.where((idx >= j0)[:, None], w_pair, 0.0)
        u_p = lax.dynamic_update_slice(u_p, v_pair, (z32, 2 * jc))
        w_p = lax.dynamic_update_slice(w_p, w_pair, (z32, 2 * jc))
        tau_p = lax.dynamic_update_slice(
            tau_p, jnp.stack([tau0, tau1]), (2 * jc,))
        return u_p, w_p, tau_p

    return lax.fori_loop(0, nb // 2, body, init)


@functools.partial(jax.jit, static_argnames=("nb", "t0", "interpret"),
                   donate_argnums=(0, 1, 2, 3, 4))
def _band2_win_group(b, tau_full, d, e1, e2, ks, nb: int, t0: int,
                     interpret: bool):
    """One window group of the no-roll PRD (donated carries — see
    householder._win_group for the per-group dispatch rationale)."""
    from eigenexa_tpu.ops.pallas_kernels import rank2k_update_window

    z32 = jnp.int32(0)

    def body(carry, j0):
        bc, tf, dc, e1c, e2c = carry
        u_p, w_p, tau_p = _pair_win(bc, j0, t0, nb, interpret)
        # band extraction from the (nb+2)-sized diagonal block of the
        # frozen bc plus the panel correction (exact at panel end —
        # later reflectors start two rows below these entries)
        dg = lax.dynamic_slice(bc, (j0, j0), (nb + 2, nb + 2))

        def corr(off):
            u_hi = lax.dynamic_slice(u_p, (j0 + off, z32), (nb, nb))
            w_hi = lax.dynamic_slice(w_p, (j0 + off, z32), (nb, nb))
            u_lo = lax.dynamic_slice(u_p, (j0, z32), (nb, nb))
            w_lo = lax.dynamic_slice(w_p, (j0, z32), (nb, nb))
            return jnp.sum(u_hi * w_lo + w_hi * u_lo, axis=1)

        d_p = jnp.diagonal(dg)[:nb] - corr(0)
        e1_p = jnp.diagonal(dg, -1)[:nb] - corr(1)
        e2_p = jnp.diagonal(dg, -2)[:nb] - corr(2)
        bc = rank2k_update_window(bc, u_p, w_p, t0=t0,
                                  interpret=interpret)
        # store V in place of the just-processed (dead) panel columns
        bc = lax.dynamic_update_slice(bc, u_p, (z32, j0))
        tf = lax.dynamic_update_slice(tf, tau_p, (j0,))
        dc = lax.dynamic_update_slice(dc, d_p, (j0,))
        e1c = lax.dynamic_update_slice(e1c, e1_p, (j0,))
        e2c = lax.dynamic_update_slice(e2c, e2_p, (j0,))
        return (bc, tf, dc, e1c, e2c), None

    (b, tau_full, d, e1, e2), _ = lax.scan(
        body, (b, tau_full, d, e1, e2), ks)
    return b, tau_full, d, e1, e2


@functools.partial(jax.jit, static_argnames=("k", "n"),
                   donate_argnums=(0,))
def _band2_win_finish(b, tau_full, d, e1, e2, k: int, n: int) -> BandResult:
    """Remainder pair panel (m ≤ nb+2) + in-place V store + slicing."""
    n_pad = b.shape[0]
    dtype = b.dtype
    m = n - k
    if m > 0:
        mp = _round_up(m + 2, 2)
        bp = jnp.zeros((mp, mp), dtype).at[:m, :m].set(
            lax.slice(b, (k, k), (n, n))[:m, :m])
        u_p, w_p, tau_p, d_p, e1_p, e2_p = _band2_remainder(bp, m)
        d = d.at[k : k + m].set(d_p[:m])
        if m > 1:
            e1 = e1.at[k : k + m - 1].set(e1_p[: m - 1])
        if m > 2:
            e2 = e2.at[k : k + m - 2].set(e2_p[: m - 2])
        vcol = jnp.zeros((n_pad, m), dtype).at[k:n, :].set(u_p[:m, :m])
        b = b.at[:, k:n].set(vcol)
        tau_full = tau_full.at[k : k + m].set(tau_p[:m])
    return BandResult(d=d[:n], e1=e1[: max(n - 1, 1)][: n - 1],
                      e2=e2[: max(n - 2, 1)][: n - 2],
                      v=b[:n, :n], tau=tau_full[:n])


def _band2_windowed(a: jnp.ndarray, nb: int, group: int,
                    interpret: bool) -> BandResult:
    """No-roll PRD: one fixed (n_pad, n_pad) working buffer, lower-triangle
    windowed symv, in-place rank-2k — the band-2 twin of
    ops/householder._tridiagonalize_windowed (same memory/traffic
    argument; reference in-place analogue: eigen_prd.F:341).

    Like the tridiagonal twin: reflectors are stored IN PLACE in the dead
    (already-processed) columns of the working buffer (the reference
    keeps V inside the factored matrix too, src/eigen_prd_t7.F panel
    load/restore) — peak memory ~1·n² + O(n·nb) — and the orchestration
    is EAGER per window group with donated carries (a single fused
    program at n=32768 crashes the TPU worker; see
    householder._tridiagonalize_windowed).  The input buffer is CONSUMED;
    band2_reduce copies unless donate=True.
    """
    from eigenexa_tpu.ops.householder import _WIN_TM as tm

    n = a.shape[0]
    dtype = a.dtype
    n_pad = _round_up(n, tm)
    b = (a if n_pad == n
         else jnp.zeros((n_pad, n_pad), dtype).at[:n, :n].set(a))

    d = jnp.zeros((n_pad,), dtype)
    e1 = jnp.zeros((n_pad,), dtype)
    e2 = jnp.zeros((n_pad,), dtype)
    tau_full = jnp.zeros((n_pad,), dtype)

    groups: dict = {}
    m_act, k = n, 0
    while m_act > nb + 2:
        groups.setdefault(k // group, []).append(k)
        k += nb
        m_act -= nb

    for g in sorted(groups):
        t0 = (g * group) // tm
        ks = jnp.asarray(groups[g], dtype=jnp.int32)
        b, tau_full, d, e1, e2 = _band2_win_group(
            b, tau_full, d, e1, e2, ks, nb=nb, t0=t0, interpret=interpret)
    return _band2_win_finish(b, tau_full, d, e1, e2, k=k, n=n)


def band2_reduce(a: jnp.ndarray, nb: int = 64,
                 bucket: int = 0, impl: str = "auto",
                 donate: bool = False) -> BandResult:
    """Reduce symmetric/Hermitian A (n x n) to real pentadiagonal
    P = Q^H A Q (driver analogue: src/eigen_prd.F:80 -> _stub:159 ->
    _body:341).

    Same bucketed-trailing-shape scheme as ops/householder.tridiagonalize,
    and like it the whole panel loop is traced into ONE XLA program
    (dispatch latency through a tunneled TPU dominates eager loops).
    """
    from eigenexa_tpu.ops import householder as hh

    n = a.shape[0]
    if nb % 2:
        nb += 1
    if impl == "auto":
        impl = hh.TRD_IMPL
    if impl == "auto":
        impl = "windowed" if hh._windowed_eligible(a, n) else "rolled"
    if impl == "windowed":
        tm = hh._WIN_TM
        group = _round_up(max(4 * nb, _round_up(n, tm) // 8), tm)
        if not donate:
            # windowed jit donates its input; public default stays
            # non-destructive (see ops/householder.tridiagonalize)
            a = a + jnp.zeros((), a.dtype)
        return _band2_windowed(
            a, nb, group, interpret=jax.default_backend() != "tpu")
    if bucket <= 0:
        bucket = max(4 * nb, _round_up(n // 8, nb) if n >= 8 * nb else nb)
    return _band2_reduce_fused(a, nb, bucket)


@functools.partial(jax.jit, static_argnames=("nb", "bucket"))
def _band2_reduce_fused(a: jnp.ndarray, nb: int, bucket: int) -> BandResult:
    n = a.shape[0]
    dtype = a.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    d = jnp.zeros((n,), rdtype)
    e1 = jnp.zeros((max(n - 1, 1),), rdtype)
    e2 = jnp.zeros((max(n - 2, 1),), rdtype)
    v_full = jnp.zeros((n, n), dtype)
    tau_full = jnp.zeros((n,), dtype)

    # panel schedule: group consecutive panels whose bucket-padded trailing
    # shape coincides -> one lax.scan per group (compile cost scales with
    # the number of buckets, not panels; see ops/householder.py)
    groups = []  # [(padded shape, [global column offsets])]
    m_act, k = n, 0
    while m_act > nb + 2:
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

    from eigenexa_tpu.ops.pallas_kernels import rank2k_update

    for s, offs in groups:
        if b.shape[0] > s:
            b = b[:s, :s]  # active block is top-left; tail is zero/dead

        def body(bc, _):
            u_p, w_p, tau_p = band2_panel(bc, nb)
            d_p, e1_p, e2_p = _extract_band(bc, u_p, w_p, nb)
            b2 = rank2k_update(bc[nb:, nb:], u_p[nb:], w_p[nb:])
            bn = jnp.zeros_like(bc).at[:-nb, :-nb].set(b2)
            return bn, (u_p, tau_p, d_p, e1_p, e2_p)

        b, (us, taus, ds, e1s, e2s) = lax.scan(body, b, None,
                                               length=len(offs))
        for j, kg in enumerate(offs):
            d = lax.dynamic_update_slice(d, ds[j], (kg,))
            e1 = lax.dynamic_update_slice(e1, e1s[j], (kg,))
            e2 = lax.dynamic_update_slice(e2, e2s[j], (kg,))
            v_full = v_full.at[kg:, kg : kg + nb].set(us[j][: n - kg])
            tau_full = lax.dynamic_update_slice(tau_full, taus[j], (kg,))

    k = sum(len(offs) for _, offs in groups) * nb

    # remainder (m <= nb+2): two zero pad rows/cols keep extraction
    # in-bounds; masks make out-of-range reflectors exact no-ops
    m = n - k
    if m > 0:
        mp = _round_up(m + 2, 2)
        bp = jnp.zeros((mp, mp), dtype)
        bp = bp.at[:m, :m].set(b[:m, :m])
        u_p, w_p, tau_p, d_p, e1_p, e2_p = _band2_remainder(bp, m)
        d = lax.dynamic_update_slice(d, d_p, (k,))
        if n - k > 1:
            e1 = lax.dynamic_update_slice(e1, e1_p[: m - 1], (k,))
        if n - k > 2:
            e2 = lax.dynamic_update_slice(e2, e2_p[: m - 2], (k,))
        v_full = v_full.at[k:, k:].set(u_p[: n - k, : n - k])
        tau_full = lax.dynamic_update_slice(tau_full, tau_p[:m], (k,))

    return BandResult(d=d, e1=e1[: max(n - 1, 1)][: n - 1],
                      e2=e2[: max(n - 2, 1)][: n - 2],
                      v=v_full, tau=tau_full)


def assemble_band2(d, e1, e2) -> jnp.ndarray:
    """Dense pentadiagonal matrix from its three bands (test helper)."""
    n = d.shape[0]
    t = jnp.diag(d)
    if n > 1:
        t = t + jnp.diag(e1, 1) + jnp.diag(e1, -1)
    if n > 2:
        t = t + jnp.diag(e2, 2) + jnp.diag(e2, -2)
    return t
