"""Batched secular-equation machinery for divide & conquer.

TPU-native re-design of the reference's D&C merge kernels
(reference: FS_PDLAED2.F90:123 deflation, FS_PDLAED3.F90:281 DLAED4 secular
roots + eigenvector assembly; ScaLAPACK-derived originals mx_pdlaed2/3.F).

Everything here operates on one merged subproblem of *static* size m with
mask-based deflation (no dynamic K — deflated coordinates stay in place as
exact eigenpairs), and is vmapped over a batch of merges by dc_tree.py.
Scalar/vector math runs in float64 regardless of the matrix dtype — this is
the framework's mixed-precision contract: O(m²) secular work in f64, O(m³)
GEMMs in the storage dtype.

Components:
  * close-eigenvalue deflation as per-run Householder rotations applied via
    segment-sum (the masked analogue of dlaed2's Givens chains)
  * a bracketed-Newton secular solver, all roots in parallel, with the
    shift-and-offset (σ, μ) representation so differences d_j − λ_i are
    computed without cancellation (the dlaed4 contract)
  * Gu–Eisenstat ẑ recomputation in log space, which guarantees numerically
    orthogonal eigenvectors without reorthogonalization
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

F64 = jnp.float64
# Smallest magnitude treated as nonzero.  NOT finfo(f64).tiny: the TPU
# backend emulates f64 as double-single with the f32 exponent range, where
# 1e-308 underflows to exactly 0 and every guard built on it produces NaN.
# Solver inputs are pre-scaled into the safe range (matrix_scaling), so
# 1e-30 is far below any legitimate quantity (and still representable in
# f32, so the same guard serves the f32 working mode).
TINY = 1e-30


def default_work_dtype():
    """f64 when x64 is on, f32 otherwise — via canonicalize_dtype so no
    'requested f64 will be truncated' warning is emitted under x64-off."""
    return jax.dtypes.canonicalize_dtype(np.float64)


class MergeCore(NamedTuple):
    """Result of rank-1 merge in the sorted-coordinate basis."""
    lam: jnp.ndarray      # (m,) merged eigenvalues, ascending
    c: jnp.ndarray        # (m, m) basis transform: Q_new = Q_sortedbasis @ c
    perm: jnp.ndarray     # (m,) sort permutation applied to incoming coords


def _run_leaders(d: jnp.ndarray, tol: jnp.ndarray):
    """Group sorted d into runs of near-equal values; return per-coordinate
    leader index (contiguous segments)."""
    m = d.shape[0]
    idx = jnp.arange(m)
    gap_big = jnp.concatenate(
        [jnp.ones((1,), bool), (d[1:] - d[:-1]) > tol]
    )
    return lax.cummax(jnp.where(gap_big, idx, 0))


def _rotate_runs(d, z, tol):
    """Per-run Householder rotation concentrating each run's z-weight into
    its leader (dlaed2 close-eigenvalue deflation, masked formulation).

    Returns (z_new, u_hat, leaders): the rotation is G = I − 2·Σ_r û_r·û_rᵀ
    with disjoint-support û_r; apply to any matrix M (rows = coordinates)
    via :func:`apply_run_rotation`.
    """
    m = d.shape[0]
    leaders = _run_leaders(d, tol)
    idx = jnp.arange(m)
    is_leader = idx == leaders
    run_norm2 = jax.ops.segment_sum(z * z, leaders, num_segments=m)
    run_size = jax.ops.segment_sum(jnp.ones_like(z), leaders, num_segments=m)
    norm_r = jnp.sqrt(run_norm2)[leaders]          # per-coordinate run ‖z‖
    size_r = run_size[leaders]
    singleton = size_r <= 1.5
    z_lead = z[leaders]
    sgn = jnp.where(z_lead >= 0, 1.0, -1.0)
    u = z + jnp.where(is_leader, sgn * norm_r, 0.0)
    u = jnp.where(singleton, 0.0, u)
    # normalize per run with max-abs pre-scaling: the reflection DIRECTION
    # is magnitude-independent, and a run of uniformly tiny z's must still
    # yield an exactly-unit û — otherwise G is not orthogonal.
    u_max = jax.ops.segment_max(jnp.abs(u), leaders, num_segments=m)[leaders]
    u_sc = u / jnp.where(u_max > 0, u_max, 1.0)
    u_n2 = jax.ops.segment_sum(u_sc * u_sc, leaders, num_segments=m)[leaders]
    u_hat = u_sc / jnp.sqrt(jnp.where(u_n2 > 0, u_n2, 1.0))
    z_new = jnp.where(
        singleton, z, jnp.where(is_leader, -sgn * norm_r, 0.0)
    )
    return z_new, u_hat, leaders


def apply_run_rotation(mat, u_hat, leaders):
    """M ← G·M with G = I − 2·Σ_r û_r û_rᵀ (rows of M are coordinates).
    O(m²) via segment-sum — no dense G is ever materialized."""
    m = u_hat.shape[0]
    y = mat * u_hat[:, None]
    s = jax.ops.segment_sum(y, leaders, num_segments=m)
    return mat - 2.0 * u_hat[:, None] * s[leaders, :]


def _secular_next_active(active):
    """Per-coordinate index of the next active coordinate (> self);
    m+1 when none.  O(m) prep shared by the full and subset root solvers
    (flip+cummin, NOT associative_scan — the latter has pathological
    compile times on the TPU backend)."""
    m = active.shape[0]
    idx = jnp.arange(m)
    tagged = jnp.where(active, idx, m + 1)
    suf = jnp.flip(lax.cummin(jnp.flip(tagged)))
    return jnp.concatenate([suf[1:], jnp.full((1,), m + 1)])


def _secular_roots(d, z2, rho, active, n_iter: int = 40, ridx=None):
    """Roots of 1 + ρ·Σ_j z_j²/(d_j − λ), all in parallel.

    Root i (active) lives in (d_i, next-active d_i') — strict interlacing.
    Returns (shift_d σ, mu, d1) with λ_i = σ_i + μ_i; the (σ, μ) pair is
    the cancellation-free representation dlaed4 mandates for downstream
    d_j − λ_i differences (d1[j, i] = d_j − σ_i).

    `ridx` (optional, (p,) int) restricts the solve to the roots at those
    sorted coordinates — the memory-chunked path: every per-root array is
    (p,) and every matrix (m, p), so a column-panelled caller never holds
    an (m, m) transient (the FS_PDLAED3 DGEMM-pipeline analogue,
    reference: src/FS_PDLAED3.F90:646-765).
    """
    m = d.shape[0]
    idx = jnp.arange(m)
    nxt_all = _secular_next_active(active)
    sumz2 = jnp.sum(jnp.where(active, z2, 0.0))
    # scale-relative slack: λ_max < d_max + ρ‖z‖² strictly, so doubling the
    # update radius always brackets the last root at any matrix scale
    slack = jnp.maximum(rho * sumz2, TINY)

    if ridx is None:
        ridx = idx
    a = d[ridx]
    nxt = nxt_all[ridx]
    has_next = nxt <= m
    nxt_c = jnp.clip(nxt, 0, m - 1)
    b = jnp.where(has_next, d[nxt_c], a + rho * sumz2 + slack)

    zA = jnp.where(active, z2, 0.0)

    def f_at(lam):
        # (m_roots,) -> f values; direct evaluation (bracket midpoints only)
        delta = d[:, None] - lam[None, :]
        inv = jnp.where(jnp.abs(delta) > 0, 1.0 / delta, 0.0)
        return 1.0 + rho * jnp.sum(zA[:, None] * inv, axis=0)

    mid = 0.5 * (a + b)
    f_mid = f_at(mid)
    take_lo = f_mid >= 0.0          # root in (a, mid): shift at a
    # last active root: the upper bound is synthetic (no pole there) — the
    # two-pole model requires the shift to sit on a true pole, so always
    # shift at d_i.
    take_lo = take_lo | ~has_next
    shift_d = jnp.where(take_lo, a, b)
    # mu-frame bracket; with the shift at `a` the root may still be in the
    # upper half (forced-take_lo last root): widen to the full interval.
    lo = jnp.where(take_lo, jnp.where(f_mid >= 0, 0.0, mid - a), mid - b)
    hi = jnp.where(take_lo, jnp.where(f_mid >= 0, mid - a, b - a), 0.0)

    d1 = d[:, None] - shift_d[None, :]          # (m, m) exact-ish diffs

    # dlaed4 "middle way": split the secular sum at the interval into
    #   psi (poles at or below d_i) and phi (poles above); model each with
    # one pole carrying its full weight, matched to value AND derivative at
    # the current iterate.  Gives the cubic convergence of dlaed4 without
    # its branch forest.
    tiny = TINY
    p1 = a - shift_d                           # this root's lower pole
    p2 = jnp.where(has_next, d[nxt_c] - shift_d, 2.0 * (b - shift_d))
    low_mask = (idx[:, None] <= ridx[None, :])  # j <= i : psi part

    def body(_, state):
        mu, lo, hi = state
        delta = d1 - mu[None, :]
        inv = jnp.where(jnp.abs(delta) > tiny, 1.0 / delta, 0.0)
        t = zA[:, None] * inv
        t2 = t * inv
        psi = rho * jnp.sum(jnp.where(low_mask, t, 0.0), axis=0)
        psip = rho * jnp.sum(jnp.where(low_mask, t2, 0.0), axis=0)
        phi = rho * jnp.sum(jnp.where(low_mask, 0.0, t), axis=0)
        phip = rho * jnp.sum(jnp.where(low_mask, 0.0, t2), axis=0)
        f = 1.0 + psi + phi
        fp = psip + phip
        root_above = f < 0.0         # f increasing in lambda
        lo = jnp.where(root_above, mu, lo)
        hi = jnp.where(root_above, hi, mu)
        # one-pole models matched at mu:  psi ~ c1 + s/(p1-x),
        # phi ~ c2 + S/(p2-x)
        g1 = p1 - mu
        g2 = p2 - mu
        s_w = psip * g1 * g1
        c1 = psi - psip * g1
        s_u = jnp.where(has_next, phip * g2 * g2, 0.0)
        c2 = phi - phip * g2
        c = 1.0 + c1 + c2
        # solve c + s_w/(p1-x) + s_u/(p2-x) = 0:
        #   c·x² − (c(p1+p2)+s_w+s_u)·x + (c·p1·p2 + s_w·p2 + s_u·p1) = 0
        bq = c * (p1 + p2) + s_w + s_u
        cq = c * p1 * p2 + s_w * p2 + s_u * p1
        disc = bq * bq - 4.0 * c * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        sgn_b = jnp.where(bq >= 0, 1.0, -1.0)
        denom = bq + sgn_b * sq
        r1 = jnp.where(jnp.abs(c) > tiny,
                       denom / (2.0 * jnp.where(jnp.abs(c) > tiny, c, 1.0)),
                       jnp.inf)
        r2 = jnp.where(jnp.abs(denom) > tiny, 2.0 * cq / denom, jnp.inf)
        in_br = lambda x: (x > lo) & (x < hi) & jnp.isfinite(x)
        newton = mu - f / jnp.where(fp > 0, fp, 1.0)
        cand = jnp.where(
            (disc >= 0) & in_br(r2), r2,
            jnp.where((disc >= 0) & in_br(r1), r1, newton),
        )
        # safeguard: contract toward the violated bound relative to the
        # CURRENT iterate (never global bisection — after convergence from
        # one side the opposite bound can be stale, and a full bisection
        # would throw a converged root away)
        cand = jnp.where(jnp.isfinite(cand), cand, 0.5 * (lo + hi))
        cand = jnp.where(cand <= lo, 0.5 * (mu + lo), cand)
        cand = jnp.where(cand >= hi, 0.5 * (mu + hi), cand)
        return cand, lo, hi

    mu0 = 0.5 * (lo + hi)
    mu, lo, hi = lax.fori_loop(0, n_iter, body, (mu0, lo, hi))
    return shift_d, mu, d1


def _zhat(d, d1, mu, rho, active, z_sign):
    """Gu–Eisenstat recomputed |ẑ| (log-space, masked):
       ẑ_j² = ∏_i (λ_i − d_j) / (ρ·∏_{i≠j} (d_i − d_j)), active i, j.
    All factors are positive under strict interlacing, so the log-sum is
    sign-free (reference analogue: dlaed3's z recomputation inside
    FS_PDLAED3.F90)."""
    m = d.shape[0]
    idx = jnp.arange(m)
    # λ_i − d_j = (d[σ_i] − d_j) + μ_i = −d1[j, i] + μ_i
    lam_minus_d = -(d1) + mu[None, :]           # (m_j, m_i)
    dd_t = d[None, :] - d[:, None]              # [j, i] = d_i − d_j
    # paired product  ẑ_j² = (λ_j − d_j)/ρ · ∏_{i≠j} (λ_i − d_j)/(d_i − d_j)
    # — each ratio is O(1) under interlacing, so the direct product keeps
    # relative error at ~√m·ε (a log-sum would amplify by the |log| factor)
    offdiag = active[None, :] & (idx[None, :] != idx[:, None])
    ratio = lam_minus_d / jnp.where(offdiag, dd_t, 1.0)
    prod = jnp.prod(jnp.where(offdiag, ratio, 1.0), axis=1)
    diag_term = jnp.diagonal(lam_minus_d)       # λ_j − d_j > 0 for active j
    z2h = jnp.maximum(diag_term * prod / rho, 0.0)
    zh = z_sign * jnp.sqrt(z2h)
    return jnp.where(active, zh, 0.0)


def rank1_merge_core(d, z, rho, n_iter: int = 40,
                     work_dtype=None) -> MergeCore:
    """Eigendecomposition of diag(d) + ρ·z·zᵀ (ρ ≥ 0, coordinates in any
    order).  Returns sorted eigenvalues and the orthogonal transform c so
    that  diag(d)+ρzzᵀ = (P G U) diag(λ) (P G U)ᵀ  with c = G·U rows in
    sorted coordinates (P = sort permutation, returned separately).

    Mask-based deflation: |ρ·z_j| below tol and close-d runs deflate in
    place; their columns of c are exact unit vectors.

    `work_dtype` sets the secular working precision (default f64 under
    x64).  f32 working precision is the TPU fast path: the (σ, μ)
    shifted-origin representation keeps d_j − λ_i cancellation-free, so
    eigenvector orthogonality stays at O(ε_f32) — the dlaed4 contract is
    precision-relative, the same reason LAPACK's single-precision sstedc
    works.
    """
    wdt = work_dtype or default_work_dtype()
    m = d.shape[0]
    d = d.astype(wdt)
    z = z.astype(wdt)
    rho = rho.astype(wdt) if hasattr(rho, "astype") else jnp.asarray(
        rho, wdt
    )
    eps = jnp.finfo(wdt).eps

    perm = jnp.argsort(d)
    ds = d[perm]
    zs = z[perm]

    scale = jnp.maximum(jnp.max(jnp.abs(ds)),
                        rho * jnp.max(jnp.abs(zs)) ** 2)
    tol = 8.0 * eps * jnp.maximum(scale, TINY)

    zr, u_hat, leaders = _rotate_runs(ds, zs, tol)
    active = (rho * jnp.abs(zr)) > tol
    z2 = zr * zr

    shift_d, mu, d1 = _secular_roots(ds, z2, rho, active, n_iter)
    z_sign = jnp.where(zr >= 0, 1.0, -1.0)
    zh = _zhat(ds, d1, mu, rho, active, z_sign)

    # ---- numerically-on-pole demotion ----
    # A root can converge numerically ONTO a pole: μ underflows below the
    # 1/δ guard, or the Gu ẑ at its dominant coordinate underflows to 0 —
    # the column formula ẑ_j/(d_j−λ) then loses its dominant entry and
    # builds a GARBAGE direction while λ itself is fine (observed at
    # n=8192: ρ|z| a hair above the deflation tol, μ ~ 1e-295, unit
    # vector at a far coordinate, eigenpair residual O(1); LAPACK's
    # dlaed2 deflates these).  The dominant coordinate is the root's own
    # pole when the shift sits there (λ → d_self), or the NEXT-ACTIVE
    # pole when the shift is at the upper end (λ → d_next, μ → 0⁻); the
    # true eigenvector is the corresponding unit vector + O(ε).
    idx_m = jnp.arange(m)
    nxt_dom = jnp.clip(_secular_next_active(active), 0, m - 1)
    dom = jnp.where(shift_d == ds, idx_m, nxt_dom)
    on_pole = active & ((jnp.abs(mu) <= TINY) | (zh[dom] == 0))
    act_vec = active & ~on_pole

    # eigenvector matrix U in rotated-sorted coordinates
    delta = d1 - mu[None, :]                    # d_j − λ_i, accurate
    act2 = active[:, None] & active[None, :]
    inv = jnp.where(
        act2 & (jnp.abs(delta) > TINY), 1.0 / delta, 0.0
    )
    u = jnp.where(zh[:, None] != 0, zh[:, None] * inv, 0.0)
    cnorm = jnp.sqrt(jnp.sum(u * u, axis=0))
    u = u / jnp.where(cnorm > 0, cnorm, 1.0)[None, :]
    # deflated columns: unit at self; on-pole-demoted: unit at dominant
    tgt = jnp.where(on_pole, dom, idx_m)
    eye_cols = (idx_m[:, None] == tgt[None, :]).astype(wdt)
    u = jnp.where(act_vec[None, :], u, eye_cols)

    lam = jnp.where(active, shift_d + mu, ds)

    # undo the run rotation on the left: c = Gᵀ·U = G·U (G symmetric)
    c = apply_run_rotation(u, u_hat, leaders)

    order = jnp.argsort(lam)
    lam = lam[order]
    c = c[:, order]
    return MergeCore(lam=lam, c=c, perm=perm)


def rank1_merge_apply(d, z, rho, q_rows, aux_rows, row_off, s_rows: int,
                      n_iter: int = 40, work_dtype=None,
                      panel: int = 1024):
    """Memory-chunked rank-1 merge + row-slice application:

        lam, Q_new, Aux_new  with  X_new = X @ C[row_off : row_off+s_rows]

    where C is the (unsorted-row × final-column) eigenvector transform of
    diag(d) + ρ·z·zᵀ — the same math as :func:`rank1_merge_core`, but C
    is NEVER materialized: the secular solve, the ẑ product and the
    eigenvector columns are produced in panels of `panel` columns, each
    panel GEMMed into the output immediately.  Per-call transient is
    O(m·panel) instead of O(m²) — the TPU analogue of FS_PDLAED3's
    pipelined Q2 panel exchange overlapped with DGEMM (reference:
    src/FS_PDLAED3.F90:646-659,743-765), which exists for exactly this
    reason: the top-of-tree merge must not hold the full C per rank.

    q_rows: (r, s_rows) rows of the eigenvector state (storage dtype);
    aux_rows: (ra, s_rows) auxiliary rows (boundary rows, working dtype);
    row_off: the (possibly traced) first unsorted C-row this caller owns.
    """
    lam, (q_new, aux_new) = rank1_merge_apply_parts(
        d, z, rho, ((q_rows, row_off), (aux_rows, row_off)),
        n_iter=n_iter, work_dtype=work_dtype, panel=panel)
    return lam, q_new, aux_new


def rank1_merge_apply_parts(d, z, rho, parts, n_iter: int = 40,
                            work_dtype=None, panel: int = 1024):
    """General form of :func:`rank1_merge_apply`: each part is a
    (rows_matrix (r_i, s_i), row_off_i) pair multiplied by ITS OWN
    unsorted-row slice of C — the shape the merge tree needs, where the
    left block's rows hit C[:s] and the right block's rows hit C[s:]
    (block-diagonal basis application, dlaed3 shape).  Returns
    (lam (m,), tuple of (r_i, m) products, each in its input dtype)."""
    wdt = work_dtype or default_work_dtype()
    m = d.shape[0]
    d = d.astype(wdt)
    z = z.astype(wdt)
    rho = rho.astype(wdt) if hasattr(rho, "astype") else jnp.asarray(
        rho, wdt)
    eps = jnp.finfo(wdt).eps

    panel_eff = min(m, panel)
    while m % panel_eff:
        panel_eff //= 2
    n_pan = m // panel_eff

    perm = jnp.argsort(d)
    inv_perm = jnp.argsort(perm)
    ds = d[perm]
    zs = z[perm]
    scale = jnp.maximum(jnp.max(jnp.abs(ds)),
                        rho * jnp.max(jnp.abs(zs)) ** 2)
    tol = 8.0 * eps * jnp.maximum(scale, TINY)
    zr, u_hat, leaders = _rotate_runs(ds, zs, tol)
    active = (rho * jnp.abs(zr)) > tol
    z2 = zr * zr
    z_sign = jnp.where(zr >= 0, 1.0, -1.0)

    # ---- pass 1: all roots, chunked over sorted-coordinate panels ----
    def root_panel(carry, pk):
        shift_all, mu_all = carry
        ridx = pk + jnp.arange(panel_eff)
        sh, mu, _ = _secular_roots(ds, z2, rho, active, n_iter, ridx=ridx)
        shift_all = lax.dynamic_update_slice(shift_all, sh, (pk,))
        mu_all = lax.dynamic_update_slice(mu_all, mu, (pk,))
        return (shift_all, mu_all), None

    pks = jnp.arange(n_pan, dtype=jnp.int32) * panel_eff
    (shift_all, mu_all), _ = lax.scan(
        root_panel, (jnp.zeros((m,), wdt), jnp.zeros((m,), wdt)), pks)
    lam = jnp.where(active, shift_all + mu_all, ds)
    order = jnp.argsort(lam)

    # ---- ẑ: Gu–Eisenstat product, chunked over root panels ----
    idx = jnp.arange(m)

    def zh_panel(prod, pk):
        rid = pk + jnp.arange(panel_eff)
        # λ_i − d_j, cancellation-free via the (σ, μ) pair
        lam_md = -(ds[:, None] - shift_all[rid][None, :]) \
            + mu_all[rid][None, :]
        dd = ds[rid][None, :] - ds[:, None]
        offd = active[rid][None, :] & (rid[None, :] != idx[:, None])
        ratio = lam_md / jnp.where(offd, dd, 1.0)
        return prod * jnp.prod(jnp.where(offd, ratio, 1.0), axis=1), None

    prod, _ = lax.scan(zh_panel, jnp.ones((m,), wdt), pks)
    diag_term = -(ds - shift_all) + mu_all        # λ_j − d_j
    z2h = jnp.maximum(diag_term * prod / rho, 0.0)
    zh = jnp.where(active, z_sign * jnp.sqrt(z2h), 0.0)
    # numerically-on-pole demotion (see rank1_merge_core): μ below the
    # 1/δ guard or dead ẑ at the dominant coordinate ⇒ unit column at
    # the dominant pole (self when shift at own pole, next-active when
    # the root clings to the upper pole)
    nxt_dom = jnp.clip(_secular_next_active(active), 0, m - 1)
    dom = jnp.where(shift_all == ds, idx, nxt_dom)
    on_pole = active & ((jnp.abs(mu_all) <= TINY) | (zh[dom] == 0))

    # ---- pass 2: final-column panels, GEMMed immediately ----
    row_ids_all = tuple(
        lax.dynamic_slice(inv_perm, (off,), (mat.shape[1],))
        for mat, off in parts)

    def col_panel(carry, pk):
        rid = lax.dynamic_slice(order, (pk,), (panel_eff,))
        sh = shift_all[rid]
        muv = mu_all[rid]
        act_c = active[rid]
        delta = (ds[:, None] - sh[None, :]) - muv[None, :]
        act2 = active[:, None] & act_c[None, :]
        inv = jnp.where(act2 & (jnp.abs(delta) > TINY), 1.0 / delta, 0.0)
        u = jnp.where(zh[:, None] != 0, zh[:, None] * inv, 0.0)
        cnorm = jnp.sqrt(jnp.sum(u * u, axis=0))
        u = u / jnp.where(cnorm > 0, cnorm, 1.0)[None, :]
        tgt_c = jnp.where(on_pole[rid], dom[rid], rid)
        eye_pan = (idx[:, None] == tgt_c[None, :]).astype(wdt)
        u = jnp.where((act_c & ~on_pole[rid])[None, :], u, eye_pan)
        u = apply_run_rotation(u, u_hat, leaders)
        out = []
        for (mat, _off), row_ids, acc in zip(parts, row_ids_all, carry):
            c_rows = u[row_ids, :]                # (s_i, panel)
            prod = mat @ c_rows.astype(mat.dtype)
            out.append(lax.dynamic_update_slice(
                acc, prod, (jnp.int32(0), pk)))
        return tuple(out), None

    init = tuple(jnp.zeros((mat.shape[0], m), mat.dtype)
                 for mat, _off in parts)
    outs, _ = lax.scan(col_panel, init, pks)
    return lam[order], outs
