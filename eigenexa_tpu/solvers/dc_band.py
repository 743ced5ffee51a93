"""Divide & conquer for the symmetric PENTADIAGONAL eigenproblem.

TPU-native re-design of the reference's banded D&C subsystem that powers
``eigen_sx`` (reference: dcx.F:81 -> MY_PDSxEDC my_pdsxedc.F:27 with
half-bandwidth HBW=2 -> MY_PDLAED0 my_pdlaed0.F:18, which performs HBW
successive rank-1 merges per join; leaf solve via LAPACK_EIGEN2,
src/lapack_eigen.F).

Mathematical scheme (band-2 Cuppen): a cut at position p removes the three
band entries crossing it — e1[p-1] = T[p-1,p], e2[p-2] = T[p-2,p],
e2[p-1] = T[p-1,p+1].  The crossing block is restored by TWO symmetric
rank-1 updates with small-support vectors

    u1 = a·δ_{p-2} + b·δ_{p-1} + c·δ_p     (a·c = e2[p-2], b·c = e1[p-1])
    u2 = f·δ_{p-1} + h·δ_{p+1}             (f·h = e2[p-1])

so  T = blockdiag(T1', T2') + u1·u1ᵀ + u2·u2ᵀ, where T1'/T2' carry the
compensating in-block modifications (d[p-2]-=a², d[p-1]-=b²+f², d[p]-=c²,
d[p+1]-=h², e1[p-2]-=a·b).  Each join therefore runs the standard rank-1
secular merge twice (dc_host.merge_batch_np), with the second z-vector
expressed in the basis produced by the first merge.

Like dc_tree's host path, the O(m²) secular/deflation math runs on the
host in true f64 and only the O(m³) eigenvector GEMM cascades run on the
device — two cascades per level here (one block-diagonal, one full),
matching the reference's HBW-times-the-work structure.

Boundary-row bookkeeping: each block carries its FIRST TWO and LAST TWO
eigenvector rows in f64 (the band-2 generalization of dc_tree's
row0/row1), which is exactly what the two z-vectors need.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eigenexa_tpu.ops.secular import rank1_merge_core
from eigenexa_tpu.solvers.dc_host import merge_batch

# canonical f64: float64 under x64, float32 otherwise.  Using
# canonicalize_dtype (not a literal jnp.float64) means x64-off runs get the
# same truncation WITHOUT the per-op "requested f64 will be truncated"
# UserWarning.  Callers that need true f64 enable x64 before importing
# (bench.py, tests/conftest.py do).
F64 = jax.dtypes.canonicalize_dtype("float64")


def _pad_sizes(n: int, leaf: int) -> Tuple[int, int]:
    levels = 0
    m = leaf
    while m < n:
        m *= 2
        levels += 1
    return m, levels


def _host_leaf_eigh_band2(db, e1b, e2b):
    """Host leaf eigendecomposition of pentadiagonal blocks (scipy
    eig_banded — the LAPACK_EIGEN2 analogue, src/lapack_eigen.F)."""
    import scipy.linalg

    bsz, s = db.shape
    w = np.empty((bsz, s))
    q = np.empty((bsz, s, s))
    band = np.zeros((3, s))
    for b in range(bsz):
        band[0] = db[b]
        if s > 1:
            band[1, : s - 1] = e1b[b]
        if s > 2:
            band[2, : s - 2] = e2b[b]
        w[b], q[b] = scipy.linalg.eig_banded(band[: min(3, s)], lower=True)
    return w, q


@functools.partial(jax.jit, static_argnames=("s",))
def _apply_blockdiag_gemm(q2, cud, s: int):
    """Q_pair <- blockdiag(Q_l, Q_r) @ C  (two half-height GEMMs)."""

    def one(qpair, cub):
        top = qpair[0] @ cub[:s, :]
        bot = qpair[1] @ cub[s:, :]
        return jnp.concatenate([top, bot], axis=0)

    return jax.vmap(one)(q2, cud)


@jax.jit
def _apply_full_gemm(q, c2d):
    """Q <- Q @ C2 (batched full GEMM for the second merge of each join)."""
    return jnp.einsum("bij,bjk->bik", q, c2d)


def _cut_vectors(e1_pad, e2_pad, p):
    """(a, b, c, f, h) for the two rank-1 restore vectors at cut p
    (vectorized over an array of cut positions)."""
    th1 = e1_pad[p - 1]          # T[p-1, p]
    th2a = e2_pad[p - 2]         # T[p-2, p]
    th2b = e2_pad[p - 1]         # T[p-1, p+1]
    mag = np.hypot(th1, th2a)
    c = np.sqrt(mag)
    safe = np.where(c > 0, c, 1.0)
    a = np.where(c > 0, th2a / safe, 0.0)
    b = np.where(c > 0, th1 / safe, 0.0)
    f = np.sqrt(np.abs(th2b))
    h = np.where(th2b >= 0, f, -f)
    return a, b, c, f, h


def solve_band2_dc(
    d: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    leaf: int = 32,
    vec_dtype=None,
    n_iter: int = 16,
    impl: str = None,
    work_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition T = S·diag(w)·Sᵀ of the pentadiagonal
    (d, e1, e2).  Returns ascending (w (n,), S (n, n) in vec_dtype).

    impl: 'jax' (fully jitted two-merge tree, ONE XLA program — default on
    CPU and for f32 vectors, mirroring dc_tree.solve_tridiag_dc's
    dispatch), 'level' (eager per-level dispatch with panel-chunked top
    merges — the large-n TPU path, auto above dc_tree.FUSED_TREE_MAX_N;
    NOT traceable) or 'host' (numpy secular core + device GEMM cascades —
    the TPU-f64 path)."""
    from eigenexa_tpu.solvers.dc_tree import FUSED_TREE_MAX_N

    vec_dtype = vec_dtype or d.dtype
    on_cpu = jax.default_backend() == "cpu"
    f32_vecs = jnp.dtype(vec_dtype) == jnp.dtype(jnp.float32)
    n = d.shape[0]
    if impl is None:
        if on_cpu or f32_vecs:
            impl = ("level" if (not on_cpu and n > FUSED_TREE_MAX_N)
                    else "jax")
        else:
            impl = "host"
    if impl in ("jax", "level"):
        if work_dtype is None:
            work_dtype = (jnp.dtype(jnp.float32)
                          if (not on_cpu and f32_vecs)
                          else jax.dtypes.canonicalize_dtype(np.float64))
        work_dtype = jnp.dtype(work_dtype)
        if n == 1:
            return d.astype(work_dtype), jnp.ones((1, 1), vec_dtype)
        leaf = max(4, min(leaf, n))
        solve = (_solve_band2_level if impl == "level"
                 else _solve_band2_fused)
        return solve(
            jnp.asarray(d), jnp.asarray(e1), jnp.asarray(e2),
            leaf=leaf, vec_dtype=jnp.dtype(vec_dtype),
            n_iter=min(n_iter, 16) if work_dtype == jnp.dtype(
                jnp.float32) else n_iter,
            work_dtype=work_dtype)
    d = np.asarray(d, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    n = d.shape[0]
    if n == 1:
        return jnp.asarray(d), jnp.ones((1, 1), vec_dtype)
    leaf = max(4, min(leaf, n))
    m, levels = _pad_sizes(n, leaf)

    # pad with a decoupled, scale-relative ascending diagonal (see
    # dc_tree.py for why pads must be scale-relative)
    span = np.abs(d).max() + (np.abs(e1).max() if n > 1 else 0.0) \
        + (np.abs(e2).max() if n > 2 else 0.0)
    base = max(span, 1e-30)
    d_pad = np.concatenate([d, 2.0 * base + (base / m) * np.arange(m - n)])
    e1_pad = np.concatenate([e1, np.zeros(m - n + 1)])  # len m
    e2_pad = np.concatenate([e2, np.zeros(m - n + 2)])  # len m

    # all cuts (every leaf boundary is cut exactly once across the levels);
    # apply the compensating in-block modifications up front
    cuts = np.arange(leaf, m, leaf)
    a_all, b_all, c_all, f_all, h_all = _cut_vectors(e1_pad, e2_pad, cuts)
    d_mod = d_pad.copy()
    e1_mod = e1_pad.copy()
    d_mod[cuts - 2] -= a_all * a_all
    d_mod[cuts - 1] -= b_all * b_all + f_all * f_all
    d_mod[cuts] -= c_all * c_all
    d_mod[cuts + 1] -= h_all * h_all
    e1_mod[cuts - 2] -= a_all * b_all

    # leaves (intra-block bands only)
    nblk = m // leaf
    d_blocks = d_mod.reshape(nblk, leaf)
    i1 = (np.arange(nblk)[:, None] * leaf
          + np.arange(leaf - 1)[None, :]).reshape(-1)
    e1_blocks = e1_mod[i1].reshape(nblk, leaf - 1)
    i2 = (np.arange(nblk)[:, None] * leaf
          + np.arange(leaf - 2)[None, :]).reshape(-1)
    e2_blocks = e2_pad[i2].reshape(nblk, leaf - 2)
    w, q_np = _host_leaf_eigh_band2(d_blocks, e1_blocks, e2_blocks)

    rows_lo = q_np[:, :2, :].copy()     # (B, 2, s) first two rows, f64
    rows_hi = q_np[:, -2:, :].copy()    # (B, 2, s) last two rows, f64
    np_vdt = np.dtype(vec_dtype)
    q = jnp.asarray(q_np.astype(np_vdt))

    for lvl in range(levels):
        s = leaf * (2 ** lvl)
        bsz = w.shape[0]
        cut_pos = np.arange(s, m, 2 * s)          # one cut per pair
        ci = (cut_pos // leaf) - 1                # index into *_all
        a, b, c = a_all[ci], b_all[ci], c_all[ci]
        f, h = f_all[ci], h_all[ci]

        d2 = w.reshape(bsz // 2, 2 * s)
        rl = rows_lo.reshape(bsz // 2, 2, 2, s)   # [pair, block01, row01, s]
        rh = rows_hi.reshape(bsz // 2, 2, 2, s)

        # ---- merge 1: u1 = a·δ_{p-2} + b·δ_{p-1} + c·δ_p ----------------
        # rows p-2, p-1 = last two rows of LEFT block; row p = first row of
        # RIGHT block (in the pair's 2s coordinates)
        z1 = np.concatenate(
            [a[:, None] * rh[:, 0, 0, :] + b[:, None] * rh[:, 0, 1, :],
             c[:, None] * rl[:, 1, 0, :]], axis=1)
        lam1, c1 = merge_batch(d2, z1, np.ones(bsz // 2), n_iter)

        # boundary rows through merge 1 (host, O(s²) per pair)
        def _through(rows_left, rows_right, cmat):
            # rows_left: (B,2,s) occupying coords [:s]; rows_right coords
            # [s:]; returns (B, 2, 2s) rows in the merged basis
            top = np.einsum("bis,bsm->bim", rows_left, cmat[:, :s, :])
            bot = np.einsum("bis,bsm->bim", rows_right, cmat[:, s:, :])
            return top, bot

        lo_l, _ = _through(rl[:, 0], np.zeros_like(rl[:, 0]), c1)
        hi_l, _ = _through(rh[:, 0], np.zeros_like(rh[:, 0]), c1)
        _, lo_r = _through(np.zeros_like(rl[:, 1]), rl[:, 1], c1)
        _, hi_r = _through(np.zeros_like(rh[:, 1]), rh[:, 1], c1)
        lo1 = lo_l + np.zeros_like(lo_l)   # rows 0,1 of pair through C1
        hi1 = hi_r + np.zeros_like(hi_r)   # rows 2s-2, 2s-1 through C1
        # row p-1 (= last row of left) and row p+1 (= 2nd row of right)
        row_pm1 = hi_l[:, 1, :]
        row_pp1 = lo_r[:, 1, :]

        # ---- merge 2: u2 = f·δ_{p-1} + h·δ_{p+1} ------------------------
        z2 = f[:, None] * row_pm1 + h[:, None] * row_pp1
        lam2, c2 = merge_batch(lam1, z2, np.ones(bsz // 2), n_iter)

        # device: two GEMM cascades (block-diag C1, then full C2)
        cud = jnp.asarray(c1.astype(np_vdt))
        c2d = jnp.asarray(c2.astype(np_vdt))
        q2 = q.reshape(bsz // 2, 2, s, s)
        q = _apply_blockdiag_gemm(q2, cud, s)
        q = _apply_full_gemm(q, c2d)

        # new boundary rows through C2 (host f64)
        rows_lo = np.einsum("bis,bsm->bim", lo1, c2)
        rows_hi = np.einsum("bis,bsm->bim", hi1, c2)
        w = lam2

    w = w.reshape(m)
    q = q.reshape(m, m)
    return jnp.asarray(w[:n]), q[:n, :n]


# ---------------------------------------------------------------------------
# fully-traceable (jitted) implementation — the TPU-f32 / CPU default
# ---------------------------------------------------------------------------

def _cut_vectors_jnp(e1_pad, e2_pad, p, wdt):
    """jnp twin of _cut_vectors (vectorized over cut positions)."""
    th1 = e1_pad[p - 1]
    th2a = e2_pad[p - 2]
    th2b = e2_pad[p - 1]
    mag = jnp.hypot(th1, th2a)
    c = jnp.sqrt(mag)
    safe = jnp.where(c > 0, c, 1.0)
    a = jnp.where(c > 0, th2a / safe, 0.0).astype(wdt)
    b = jnp.where(c > 0, th1 / safe, 0.0).astype(wdt)
    f = jnp.sqrt(jnp.abs(th2b))
    h = jnp.where(th2b >= 0, f, -f).astype(wdt)
    return a, b, c.astype(wdt), f.astype(wdt), h


def _leaf_eigh_band2_jax(db, e1b, e2b, wdt):
    """Traceable leaf solve: assemble dense pentadiagonal blocks, batched
    eigh (the LAPACK_EIGEN2 analogue on device)."""
    bsz, s = db.shape

    def assemble(dv, e1v, e2v):
        t = jnp.diag(dv)
        if s > 1:
            t = t + jnp.diag(e1v, 1) + jnp.diag(e1v, -1)
        if s > 2:
            t = t + jnp.diag(e2v, 2) + jnp.diag(e2v, -2)
        return t

    t = jax.vmap(assemble)(db.astype(wdt), e1b.astype(wdt),
                           e2b.astype(wdt))
    return jnp.linalg.eigh(t)


def _merge_level_band2_chunked(w, q, rows_lo, rows_hi, a, b, c, f, h,
                               vec_dtype, n_iter, work_dtype, panel: int):
    """_merge_level_band2 with both rank-1 merges built in column panels
    (secular.rank1_merge_apply_parts): the (2s)² C matrices of the two
    merges are never materialized — per-merge transient O(2s·panel).
    Used by the per-level orchestration at the top of very large trees
    (the band-2 twin of dc_tree._merge_level_chunked)."""
    from eigenexa_tpu.ops.secular import rank1_merge_apply_parts

    wdt = work_dtype
    bsz, s = w.shape
    d2 = w.reshape(bsz // 2, 2, s)
    q2 = q.reshape(bsz // 2, 2, s, s)
    rl = rows_lo.reshape(bsz // 2, 2, 2, s)
    rh = rows_hi.reshape(bsz // 2, 2, 2, s)
    one = jnp.ones((), wdt)

    def merge_one(dpair, qpair, rlp, rhp, ab, bb, cb, fb, hb):
        dm = jnp.concatenate([dpair[0], dpair[1]]).astype(wdt)
        z1 = jnp.concatenate([ab * rhp[0, 0] + bb * rhp[0, 1],
                              cb * rlp[1, 0]])
        lam1, (top1, bot1, lo1, hi1, pm1, pp1) = rank1_merge_apply_parts(
            dm, z1, one,
            parts=((qpair[0], 0), (qpair[1], s),
                   (rlp[0], 0), (rhp[1], s),
                   (rhp[0, 1][None, :], 0), (rlp[1, 1][None, :], s)),
            n_iter=n_iter, work_dtype=wdt, panel=panel)
        q1 = jnp.concatenate([top1, bot1], axis=0)      # (2s, 2s) vec
        z2 = fb * pm1[0] + hb * pp1[0]
        lam2, (qn, lo2, hi2) = rank1_merge_apply_parts(
            lam1, z2, one,
            parts=((q1, 0), (lo1, 0), (hi1, 0)),
            n_iter=n_iter, work_dtype=wdt, panel=panel)
        return lam2, qn, lo2, hi2

    return jax.vmap(merge_one)(d2, q2, rl, rh, a, b, c, f, h)


_merge_level_band2_chunked_jit = functools.partial(
    jax.jit,
    static_argnames=("vec_dtype", "n_iter", "work_dtype", "panel"),
)(_merge_level_band2_chunked)


def _merge_level_band2(w, q, rows_lo, rows_hi, a, b, c, f, h,
                       vec_dtype, n_iter, work_dtype):
    """One level: join pairs with TWO rank-1 merges (HBW=2 structure,
    reference: my_pdlaed0.F:18 performing HBW merges per join).

    w: (B, s) ascending per block; q: (B, s, s) vec_dtype;
    rows_lo/rows_hi: (B, 2, s) first-two/last-two eigenvector rows in the
    working dtype; a..h: (B/2,) cut-vector coefficients."""
    wdt = work_dtype
    bsz, s = w.shape
    d2 = w.reshape(bsz // 2, 2, s)
    q2 = q.reshape(bsz // 2, 2, s, s)
    rl = rows_lo.reshape(bsz // 2, 2, 2, s)
    rh = rows_hi.reshape(bsz // 2, 2, 2, s)
    one = jnp.ones((), wdt)

    def merge_one(dpair, qpair, rlp, rhp, ab, bb, cb, fb, hb):
        dm = jnp.concatenate([dpair[0], dpair[1]]).astype(wdt)
        # merge 1: u1 = a·δ_{p-2} + b·δ_{p-1} + c·δ_p  (pair coords, p = s)
        z1 = jnp.concatenate([ab * rhp[0, 0] + bb * rhp[0, 1],
                              cb * rlp[1, 0]])
        core1 = rank1_merge_core(dm, z1, one, n_iter=n_iter,
                                 work_dtype=wdt)
        c1 = jnp.zeros_like(core1.c).at[core1.perm, :].set(core1.c)
        # boundary rows through C1 (block-diagonal split: left rows live in
        # coords [:s], right rows in [s:])
        lo1 = rlp[0] @ c1[:s]          # pair rows 0,1
        hi1 = rhp[1] @ c1[s:]          # pair rows 2s-2, 2s-1
        row_pm1 = rhp[0, 1] @ c1[:s]   # row p-1 (last row of left)
        row_pp1 = rlp[1, 1] @ c1[s:]   # row p+1 (2nd row of right)
        # merge 2: u2 = f·δ_{p-1} + h·δ_{p+1} in the merged basis
        z2 = fb * row_pm1 + hb * row_pp1
        core2 = rank1_merge_core(core1.lam, z2, one, n_iter=n_iter,
                                 work_dtype=wdt)
        c2 = jnp.zeros_like(core2.c).at[core2.perm, :].set(core2.c)
        cc = c1 @ c2                    # (2s, 2s) combined, work dtype
        cu = cc.astype(vec_dtype)
        top = qpair[0] @ cu[:s, :]
        bot = qpair[1] @ cu[s:, :]
        return (core2.lam, jnp.concatenate([top, bot], axis=0),
                lo1 @ c2, hi1 @ c2)

    return jax.vmap(merge_one)(d2, q2, rl, rh, a, b, c, f, h)


_merge_level_band2_jit = functools.partial(
    jax.jit, static_argnames=("vec_dtype", "n_iter", "work_dtype")
)(_merge_level_band2)

# per-level orchestration thresholds (the band-2 twins of
# dc_tree._LEVEL_CHUNK_MIN / _LEVEL_CHUNK_PANEL)
_LEVEL_CHUNK_MIN = 16384
_LEVEL_CHUNK_PANEL = 1024


def _solve_band2_level(d, e1, e2, *, leaf: int, vec_dtype, n_iter: int,
                       work_dtype):
    """Eager per-LEVEL orchestration of the band-2 two-merge tree — one
    jitted program per level (the reference's eager level loop,
    my_pdlaed0.F / FS_PDLAED0.F90:197-246), with panel-chunked merges at
    the top.  The large-n TPU path for eigen_sx; NOT traceable.
    """
    wdt = work_dtype
    d_h = np.asarray(d, np.float64)
    e1_h = np.asarray(e1, np.float64)
    e2_h = np.asarray(e2, np.float64)
    n = d_h.shape[0]
    if not (np.isfinite(d_h).all() and np.isfinite(e1_h).all()
            and np.isfinite(e2_h).all()):
        return (jnp.full((n,), jnp.nan, wdt),
                jnp.full((n, n), jnp.nan, vec_dtype))
    leaf = max(4, min(leaf, n))
    m, levels = _pad_sizes(n, leaf)

    span = np.abs(d_h).max() + (np.abs(e1_h).max() if n > 1 else 0.0) \
        + (np.abs(e2_h).max() if n > 2 else 0.0)
    base = max(span, 1e-30)
    d_pad = np.concatenate([d_h, 2.0 * base
                            + (base / m) * np.arange(m - n)])
    e1_pad = np.concatenate([e1_h, np.zeros(m - n + 1)])
    e2_pad = np.concatenate([e2_h, np.zeros(m - n + 2)])
    cuts = np.arange(leaf, m, leaf)
    a_all, b_all, c_all, f_all, h_all = _cut_vectors(e1_pad, e2_pad, cuts)
    d_mod = d_pad.copy()
    e1_mod = e1_pad.copy()
    d_mod[cuts - 2] -= a_all * a_all
    d_mod[cuts - 1] -= b_all * b_all + f_all * f_all
    d_mod[cuts] -= c_all * c_all
    d_mod[cuts + 1] -= h_all * h_all
    e1_mod[cuts - 2] -= a_all * b_all

    nblk = m // leaf
    np_wdt = np.dtype(wdt)
    d_blocks = jnp.asarray(d_mod.reshape(nblk, leaf).astype(np_wdt))
    i1 = (np.arange(nblk)[:, None] * leaf
          + np.arange(leaf - 1)[None, :]).reshape(-1)
    e1_blocks = jnp.asarray(
        e1_mod[i1].reshape(nblk, leaf - 1).astype(np_wdt))
    i2 = (np.arange(nblk)[:, None] * leaf
          + np.arange(leaf - 2)[None, :]).reshape(-1)
    e2_blocks = jnp.asarray(
        e2_pad[i2].reshape(nblk, leaf - 2).astype(np_wdt))
    w, q = jax.jit(_leaf_eigh_band2_jax, static_argnames=("wdt",))(
        d_blocks, e1_blocks, e2_blocks, wdt=jnp.dtype(wdt))
    rows_lo = q[:, :2, :].astype(wdt)
    rows_hi = q[:, -2:, :].astype(wdt)
    q = q.astype(vec_dtype)

    for lvl in range(levels):
        s = leaf * (2 ** lvl)
        ci = (np.arange(s, m, 2 * s) // leaf) - 1
        coefs = [jnp.asarray(arr[ci].astype(np_wdt))
                 for arr in (a_all, b_all, c_all, f_all, h_all)]
        if 2 * s >= _LEVEL_CHUNK_MIN:
            w, q, rows_lo, rows_hi = _merge_level_band2_chunked_jit(
                w, q, rows_lo, rows_hi, *coefs,
                vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
                work_dtype=jnp.dtype(wdt), panel=_LEVEL_CHUNK_PANEL)
        else:
            w, q, rows_lo, rows_hi = _merge_level_band2_jit(
                w, q, rows_lo, rows_hi, *coefs,
                vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
                work_dtype=jnp.dtype(wdt))
        bsz = w.shape[0]
        rows_lo = rows_lo.reshape(bsz, 2, 2 * s)
        rows_hi = rows_hi.reshape(bsz, 2, 2 * s)

    w = w.reshape(m)
    q = q.reshape(m, m)
    return w[:n], q[:n, :n]


@functools.partial(
    jax.jit,
    static_argnames=("leaf", "vec_dtype", "n_iter", "work_dtype"),
)
def _solve_band2_fused(d, e1, e2, *, leaf: int, vec_dtype, n_iter: int,
                       work_dtype):
    """The whole band-2 pad → leaves → two-merge tree as ONE XLA program
    (same dispatch-latency rationale as dc_tree._solve_tridiag_fused)."""
    wdt = work_dtype
    n = d.shape[0]
    m, levels = _pad_sizes(n, leaf)
    d = d.astype(wdt)
    e1 = e1.astype(wdt)
    e2 = e2.astype(wdt)

    span = (jnp.max(jnp.abs(d))
            + (jnp.max(jnp.abs(e1)) if n > 1 else 0.0)
            + (jnp.max(jnp.abs(e2)) if n > 2 else 0.0))
    base = jnp.maximum(span, jnp.finfo(wdt).tiny)
    d_pad = jnp.concatenate(
        [d, 2.0 * base + (base / m) * jnp.arange(m - n, dtype=wdt)])
    e1_pad = jnp.concatenate([e1, jnp.zeros((m - n + 1,), wdt)])
    e2_pad = jnp.concatenate([e2, jnp.zeros((m - n + 2,), wdt)])

    cuts = jnp.asarray(np.arange(leaf, m, leaf))
    a_all, b_all, c_all, f_all, h_all = _cut_vectors_jnp(
        e1_pad, e2_pad, cuts, wdt)
    d_mod = d_pad
    d_mod = d_mod.at[cuts - 2].add(-a_all * a_all)
    d_mod = d_mod.at[cuts - 1].add(-(b_all * b_all + f_all * f_all))
    d_mod = d_mod.at[cuts].add(-c_all * c_all)
    d_mod = d_mod.at[cuts + 1].add(-h_all * h_all)
    e1_mod = e1_pad.at[cuts - 2].add(-a_all * b_all)

    nblk = m // leaf
    d_blocks = d_mod.reshape(nblk, leaf)
    i1 = (np.arange(nblk)[:, None] * leaf
          + np.arange(leaf - 1)[None, :]).reshape(-1)
    e1_blocks = e1_mod[jnp.asarray(i1)].reshape(nblk, leaf - 1)
    i2 = (np.arange(nblk)[:, None] * leaf
          + np.arange(leaf - 2)[None, :]).reshape(-1)
    e2_blocks = e2_pad[jnp.asarray(i2)].reshape(nblk, leaf - 2)
    w, q = _leaf_eigh_band2_jax(d_blocks, e1_blocks, e2_blocks, wdt)

    rows_lo = q[:, :2, :].astype(wdt)
    rows_hi = q[:, -2:, :].astype(wdt)
    q = q.astype(vec_dtype)

    for lvl in range(levels):
        s = leaf * (2 ** lvl)
        ci = jnp.asarray((np.arange(s, m, 2 * s) // leaf) - 1)
        w, q, rows_lo, rows_hi = _merge_level_band2(
            w, q, rows_lo, rows_hi,
            a_all[ci], b_all[ci], c_all[ci], f_all[ci], h_all[ci],
            vec_dtype=vec_dtype, n_iter=n_iter, work_dtype=wdt)
        bsz = w.shape[0]
        rows_lo = rows_lo.reshape(bsz, 2, 2 * s)
        rows_hi = rows_hi.reshape(bsz, 2, 2 * s)

    w = w.reshape(m)
    q = q.reshape(m, m)
    return w[:n], q[:n, :n]
