"""Host-side (numpy, true float64) twin of the D&C merge core.

Why this exists: the TPU backend compiles the jitted merge graph
(sort + segment ops + secular iteration) pathologically slowly — tens of
minutes for a modest tree — and supports no callbacks, while the actual
work is O(m²) per merge and trivially fast on the host.  So on TPU the
secular/deflation math runs here eagerly (true IEEE f64, better than the
device's emulated f64) and only the O(m³) eigenvector GEMM cascade runs on
the MXU.  The reference makes the same split at larger scale: DLAED4
root-finding is scalar code, the eigenvector update is DGEMM
(FS_PDLAED3.F90:281 vs :743).

Unlike the jitted twin (ops/secular.py), the host has no static-shape
constraint, so deflation COMPACTS: the secular solve runs on the K active
coordinates only (K ≤ m), exactly like dlaed2/dlaed3.  The test suite
asserts host and jitted paths agree to f64 roundoff.
"""

from __future__ import annotations

import numpy as np

TINY = 1e-30


def _rotate_runs_np(ds, zs, tol):
    """Per-run Householder rotation concentrating each run's z-weight into
    its leader (masked analogue of dlaed2's close-eigenvalue Givens chains;
    see ops/secular.py:_rotate_runs)."""
    m = ds.shape[0]
    idx = np.arange(m)
    gap_big = np.concatenate([[True], (ds[1:] - ds[:-1]) > tol])
    leaders = np.maximum.accumulate(np.where(gap_big, idx, 0))
    is_leader = idx == leaders
    run_norm2 = np.zeros(m)
    np.add.at(run_norm2, leaders, zs * zs)
    run_size = np.bincount(leaders, minlength=m)
    norm_r = np.sqrt(run_norm2)[leaders]
    singleton = run_size[leaders] <= 1
    z_lead = zs[leaders]
    sgn = np.where(z_lead >= 0, 1.0, -1.0)
    u = zs + np.where(is_leader, sgn * norm_r, 0.0)
    u = np.where(singleton, 0.0, u)
    u_max = np.zeros(m)
    np.maximum.at(u_max, leaders, np.abs(u))
    u_max = u_max[leaders]
    u_sc = u / np.where(u_max > 0, u_max, 1.0)
    u_n2 = np.zeros(m)
    np.add.at(u_n2, leaders, u_sc * u_sc)
    u_n2 = u_n2[leaders]
    u_hat = u_sc / np.sqrt(np.where(u_n2 > 0, u_n2, 1.0))
    z_new = np.where(singleton, zs, np.where(is_leader, -sgn * norm_r, 0.0))
    return z_new, u_hat, leaders


def _apply_run_rotation_np(mat, u_hat, leaders):
    m = u_hat.shape[0]
    y = mat * u_hat[:, None]
    s = np.zeros_like(mat)
    np.add.at(s, leaders, y)
    return mat - 2.0 * u_hat[:, None] * s[leaders, :]


def _secular_compact(da, z2a, rho, n_iter):
    """All K roots of 1 + ρ Σ z²/(d−λ) for a COMPACT active set (every
    coordinate has z≠0, d strictly increasing).  Returns (shift_d, mu, d1)
    with λ_i = shift_d_i + mu_i and d1[j,i] = da_j − shift_d_i.

    dlaed4 middle way: two adjacent poles kept exact, value+derivative
    matched, quadratic solved; bracket-safeguarded (see ops/secular.py).
    """
    k = da.shape[0]
    sumz2 = z2a.sum()
    a = da
    b = np.concatenate([da[1:], [da[-1] + rho * sumz2 +
                                 max(rho * sumz2, TINY)]])
    has_next = np.concatenate([np.ones(k - 1, bool), [False]])

    mid = 0.5 * (a + b)
    with np.errstate(all="ignore"):
        delta0 = da[:, None] - mid[None, :]
        f_mid = 1.0 + rho * np.sum(
            z2a[:, None] / np.where(delta0 == 0, np.inf, delta0), axis=0
        )
    take_lo = (f_mid >= 0.0) | (~has_next)
    shift_d = np.where(take_lo, a, b)
    lo = np.where(take_lo, np.where(f_mid >= 0, 0.0, mid - a), mid - b)
    hi = np.where(take_lo, np.where(f_mid >= 0, mid - a, b - a), 0.0)
    d1 = da[:, None] - shift_d[None, :]
    p1 = a - shift_d
    p2 = np.where(has_next, np.concatenate([da[1:], [0]]) - shift_d,
                  2.0 * (b - shift_d))

    mu = 0.5 * (lo + hi)
    for _ in range(n_iter):
        with np.errstate(all="ignore"):
            delta = d1 - mu[None, :]
            inv = 1.0 / np.where(np.abs(delta) > TINY,
                                 delta, np.where(delta >= 0, TINY, -TINY))
            t = z2a[:, None] * inv
            t2 = t * inv
            # psi_i = sum_{j<=i} t[j,i]: single cumsum pass, no masks
            t_cum = np.cumsum(t, axis=0)
            t2_cum = np.cumsum(t2, axis=0)
            psi = rho * np.diagonal(t_cum)
            psip = rho * np.diagonal(t2_cum)
            phi = rho * t_cum[-1] - psi
            phip = rho * t2_cum[-1] - psip
            f = 1.0 + psi + phi
            fp = psip + phip
            root_above = f < 0.0
            lo = np.where(root_above, mu, lo)
            hi = np.where(root_above, hi, mu)
            g1 = p1 - mu
            g2 = p2 - mu
            s_w = psip * g1 * g1
            c1 = psi - psip * g1
            s_u = np.where(has_next, phip * g2 * g2, 0.0)
            c2 = phi - phip * g2
            c = 1.0 + c1 + c2
            bq = c * (p1 + p2) + s_w + s_u
            cq = c * p1 * p2 + s_w * p2 + s_u * p1
            disc = bq * bq - 4.0 * c * cq
            sq = np.sqrt(np.maximum(disc, 0.0))
            sgn_b = np.where(bq >= 0, 1.0, -1.0)
            denom = bq + sgn_b * sq
            r1 = np.where(np.abs(c) > TINY,
                          denom / (2.0 * np.where(np.abs(c) > TINY, c, 1.0)),
                          np.inf)
            r2 = np.where(np.abs(denom) > TINY, 2.0 * cq / denom, np.inf)
            newton = mu - f / np.where(fp > 0, fp, 1.0)

        in2 = (r2 > lo) & (r2 < hi) & np.isfinite(r2) & (disc >= 0)
        in1 = (r1 > lo) & (r1 < hi) & np.isfinite(r1) & (disc >= 0)
        cand = np.where(in2, r2, np.where(in1, r1, newton))
        cand = np.where(np.isfinite(cand), cand, 0.5 * (lo + hi))
        cand = np.where(cand <= lo, 0.5 * (mu + lo), cand)
        cand = np.where(cand >= hi, 0.5 * (mu + hi), cand)
        mu = cand
    return shift_d, mu, d1


def _zhat_compact(da, d1, mu, rho, z_sign):
    """Gu–Eisenstat recomputed ẑ on the compact active set (K×K paired
    ratio product; each factor O(1) under interlacing)."""
    k = da.shape[0]
    idx = np.arange(k)
    lam_minus_d = -d1 + mu[None, :]
    dd_t = da[None, :] - da[:, None]
    offdiag = idx[None, :] != idx[:, None]
    with np.errstate(all="ignore"):
        ratio = lam_minus_d / np.where(offdiag, dd_t, 1.0)
        prod = np.prod(np.where(offdiag, ratio, 1.0), axis=1)
    diag_term = np.diagonal(lam_minus_d)
    z2h = np.maximum(diag_term * prod / max(rho, TINY), 0.0)
    return z_sign * np.sqrt(z2h)


def merge_core_np(d, z, rho, n_iter: int = 12):
    """Single-problem host merge of diag(d)+ρ·z·zᵀ (any coordinate order).

    Returns (lam (m,) ascending, c (m,m) with rows in SORTED coordinates,
    perm (m,)): eigenvectors of the input matrix are
    (scatter rows of c by perm).
    """
    d = np.asarray(d, np.float64)
    z = np.asarray(z, np.float64)
    rho = float(rho)
    m = d.shape[0]
    eps = np.finfo(np.float64).eps

    perm = np.argsort(d, kind="stable")
    ds = d[perm]
    zs = z[perm]
    scale = max(np.max(np.abs(ds)), rho * np.max(np.abs(zs)) ** 2, TINY)
    tol = 8.0 * eps * scale

    zr, u_hat, leaders = _rotate_runs_np(ds, zs, tol)
    active = (rho * np.abs(zr)) > tol
    aidx = np.nonzero(active)[0]
    k = aidx.shape[0]

    lam = ds.copy()
    c = np.eye(m)
    if k > 0:
        da = ds[aidx]
        za = zr[aidx]
        shift_d, mu, d1 = _secular_compact(da, za * za, rho, n_iter)
        zh = _zhat_compact(da, d1, mu, rho, np.where(za >= 0, 1.0, -1.0))
        with np.errstate(all="ignore"):
            delta = d1 - mu[None, :]
            inv = 1.0 / np.where(np.abs(delta) > TINY, delta,
                                 np.where(delta >= 0, TINY, -TINY))
        u = zh[:, None] * inv
        cnorm = np.sqrt(np.sum(u * u, axis=0))
        u = u / np.where(cnorm > 0, cnorm, 1.0)[None, :]
        # numerically-on-pole demotion (see ops/secular.rank1_merge_core):
        # μ below the 1/δ guard or dead ẑ at the dominant coordinate ⇒
        # unit column at the dominant pole (self when shift at own pole,
        # next-active when the root clings to the upper pole)
        kk = np.arange(k)
        dom = np.where(shift_d == da, kk, np.minimum(kk + 1, k - 1))
        on_pole = (np.abs(mu) <= TINY) | (zh[dom] == 0)
        op = np.nonzero(on_pole)[0]
        if op.size:
            u[:, op] = 0.0
            u[dom[op], op] = 1.0
        lam[aidx] = shift_d + mu
        c[np.ix_(aidx, aidx)] = u

    has_rot = np.any(u_hat != 0.0)
    if has_rot:
        c = _apply_run_rotation_np(c, u_hat, leaders)
    order = np.argsort(lam, kind="stable")
    return lam[order], c[:, order], perm


def merge_batch(d, z, rho, n_iter: int = 12):
    """Batched host merge — native C++ core when available (the DLAED4
    equivalent, eigenexa_tpu/native/secular.cpp), numpy twin otherwise.
    Same contract as :func:`merge_batch_np`."""
    from eigenexa_tpu.native import merge_batch_native

    out = merge_batch_native(d, z, rho, n_iter)
    if out is not None:
        return out
    return merge_batch_np(d, z, rho, n_iter)


def merge_batch_np(d, z, rho, n_iter: int = 12):
    """Batched host merge: inputs (B, m), (B, m), (B,); returns lam (B, m)
    and c_unsorted (B, m, m) with rows scattered back to pre-sort
    coordinate order (ready for the block-diagonal GEMM)."""
    d = np.asarray(d, np.float64)
    z = np.asarray(z, np.float64)
    rho = np.asarray(rho, np.float64)
    bsz, m = d.shape
    lam_out = np.empty((bsz, m))
    c_out = np.empty((bsz, m, m))
    eps = np.finfo(np.float64).eps
    eye = np.eye(m)
    for b in range(bsz):
        scale = max(np.max(np.abs(d[b])),
                    rho[b] * np.max(np.abs(z[b])) ** 2, TINY)
        if rho[b] * np.max(np.abs(z[b])) <= 8.0 * eps * scale:
            # fully-deflated fast path (e.g. zero-coupled padding merges)
            perm = np.argsort(d[b], kind="stable")
            lam_out[b] = d[b][perm]
            c_out[b] = eye[perm].T       # c[perm[i], i] = 1
            continue
        lam, c, perm = merge_core_np(d[b], z[b], rho[b], n_iter)
        lam_out[b] = lam
        c_out[b][perm, :] = c
    return lam_out, c_out
