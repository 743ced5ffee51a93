"""Sturm-sequence bisection for the symmetric tridiagonal eigenproblem.

TPU-native re-design of the reference's bisection kernels
(reference: src/bisect.F:67 `eigen_bisect` — Gershgorin bounds + Sturm
counts with the eigenvalue range split over ranks and OMP-parallel inner
loops; refinement mode sharpens D&C eigenvalues).

Design: one `lax.scan` over the matrix dimension carries the Sturm
recurrence for ALL probe points simultaneously (a (k,)-vector carry), so
each bisection step is a single fused n-step scan on the VPU — the
vectorization axis is the probe set, not the matrix.  All math is f64
(the count is integer-exact, so emulated f64 suffices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# canonical f64: float64 under x64, float32 otherwise.  Using
# canonicalize_dtype (not a literal jnp.float64) means x64-off runs get the
# same truncation WITHOUT the per-op "requested f64 will be truncated"
# UserWarning.  Callers that need true f64 enable x64 before importing
# (bench.py, tests/conftest.py do).
F64 = jax.dtypes.canonicalize_dtype("float64")


def sturm_count(d: jnp.ndarray, e: jnp.ndarray, x: jnp.ndarray):
    """Number of eigenvalues of T(d, e) strictly below each x.

    d: (n,), e: (n-1,), x: (k,) probe points → int32 (k,).
    Uses the LAPACK dlaebz-style pivmin guard against division blowup.
    """
    d = d.astype(F64)
    e = e.astype(F64)
    x = x.astype(F64)
    n = d.shape[0]
    e2 = jnp.concatenate([jnp.zeros((1,), F64), e * e])
    pivmin = jnp.maximum(jnp.max(e2), 1.0) * jnp.asarray(1e-30, F64)

    def step(carry, de):
        q_prev, cnt = carry
        d_i, e2_i = de
        q = d_i - x - e2_i / q_prev
        q = jnp.where(jnp.abs(q) < pivmin, -pivmin, q)
        cnt = cnt + (q < 0).astype(jnp.int32)
        return (q, cnt), None

    init = (jnp.ones_like(x), jnp.zeros(x.shape, jnp.int32))
    (q, cnt), _ = lax.scan(step, init, (d, e2))
    return cnt


def gershgorin_bounds(d: jnp.ndarray, e: jnp.ndarray):
    """(lower, upper) bounds on the spectrum (reference: bisect.F:101-149)."""
    d = d.astype(F64)
    e = e.astype(F64)
    ae = jnp.abs(e)
    r = jnp.concatenate([jnp.zeros((1,), F64), ae]) + jnp.concatenate(
        [ae, jnp.zeros((1,), F64)]
    )
    return jnp.min(d - r), jnp.max(d + r)


def eigvals_bisect(d: jnp.ndarray, e: jnp.ndarray, n_iter: int = 70):
    """All eigenvalues, ascending, by index-targeted bisection.

    Each eigenvalue index i keeps a bracket [a_i, b_i] with
    count(a_i) ≤ i < count(b_i); every iteration probes all midpoints with
    one Sturm scan.  ~`n_iter` halvings of the Gershgorin interval reach
    f64 relative accuracy.
    """
    n = d.shape[0]
    lo, hi = gershgorin_bounds(d, e)
    span = jnp.maximum(hi - lo, jnp.asarray(1e-30, F64))
    lo = lo - 1e-6 * span
    hi = hi + 1e-6 * span
    idx = jnp.arange(n)

    def body(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        cnt = sturm_count(d, e, mid)
        above = cnt > idx          # λ_i < mid
        b = jnp.where(above, mid, b)
        a = jnp.where(above, a, mid)
        return a, b

    a0 = jnp.full((n,), lo)
    b0 = jnp.full((n,), hi)
    a, b = lax.fori_loop(0, n_iter, body, (a0, b0))
    return 0.5 * (a + b)


def sturm_count_band2(d: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray,
                      x: jnp.ndarray):
    """Number of eigenvalues of the pentadiagonal T(d, e1, e2) strictly
    below each probe x — the bisect2 analogue (reference: src/bisect2.F:71,
    pivoting Sturm count for the 5-diagonal at :115).

    Scheme: Gaussian elimination of (T − xI) tracking the 2×2 modified
    trailing window (a, b, c) = (A[k,k], A[k,k+1], A[k+1,k+1]); the
    inertia (count of negative pivots) equals the eigenvalue count below x
    by Sylvester's law.  Tiny pivots are clamped to ±pivmin (the dlaebz
    guard) instead of the reference's pivoting — integer-exact counting
    tolerates the perturbation.
    """
    d = d.astype(F64)
    e1 = e1.astype(F64)
    e2 = e2.astype(F64)
    x = x.astype(F64)
    n = d.shape[0]
    # pad bands so the scan body is uniform: e1[k] couples (k,k+1),
    # e2[k] couples (k,k+2); beyond-range entries are 0
    e1p = jnp.concatenate([e1, jnp.zeros((n - e1.shape[0],), F64)])
    e2p = jnp.concatenate([e2, jnp.zeros((n - e2.shape[0],), F64)])
    d1p = jnp.concatenate([d[1:], jnp.zeros((1,), F64)])
    scale = jnp.maximum(jnp.max(jnp.abs(d)), 1.0) \
        + jnp.max(jnp.abs(e1p)) + jnp.max(jnp.abs(e2p))
    pivmin = scale * jnp.asarray(1e-28, F64)

    def step(carry, bands):
        a, b, c, cnt = carry           # each (k,) over probes
        d_next, e1_next, e2_k = bands
        piv = jnp.where(jnp.abs(a) < pivmin,
                        jnp.where(a >= 0, pivmin, -pivmin), a)
        cnt = cnt + (piv < 0).astype(jnp.int32)
        l1 = b / piv
        l2 = e2_k / piv
        a_new = c - l1 * b
        b_new = e1_next - l1 * e2_k
        c_new = (d_next - x) - l2 * e2_k
        return (a_new, b_new, c_new, cnt), None

    k = x.shape[0]
    a0 = d[0] - x
    b0 = jnp.full((k,), e1p[0])
    c0 = d1p[0] - x if n > 1 else jnp.zeros((k,), F64)
    c0 = jnp.broadcast_to(c0, (k,))
    init = (a0, b0, c0, jnp.zeros((k,), jnp.int32))
    xs = (jnp.concatenate([d[2:], jnp.zeros((2,), F64)]),
          jnp.concatenate([e1p[1:], jnp.zeros((1,), F64)]),
          e2p)
    (a, b, c, cnt), _ = lax.scan(step, init, xs, length=n)
    return cnt


def gershgorin_bounds_band2(d, e1, e2):
    """Spectrum bounds for the pentadiagonal (bisect2 analogue)."""
    d = d.astype(F64)
    n = d.shape[0]
    r = jnp.zeros((n,), F64)
    a1 = jnp.abs(e1.astype(F64))
    a2 = jnp.abs(e2.astype(F64))
    r = r.at[:-1].add(a1).at[1:].add(a1)
    if e2.shape[0] > 0:
        r = r.at[:-2].add(a2).at[2:].add(a2)
    return jnp.min(d - r), jnp.max(d + r)


def eigvals_bisect_band2(d, e1, e2, n_iter: int = 70):
    """All pentadiagonal eigenvalues, ascending, by index-targeted
    bisection (reference: eigen_bisect2, src/bisect2.F:71)."""
    n = d.shape[0]
    lo, hi = gershgorin_bounds_band2(d, e1, e2)
    span = jnp.maximum(hi - lo, jnp.asarray(1e-30, F64))
    lo = lo - 1e-6 * span
    hi = hi + 1e-6 * span
    idx = jnp.arange(n)

    def body(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        cnt = sturm_count_band2(d, e1, e2, mid)
        above = cnt > idx
        b = jnp.where(above, mid, b)
        a = jnp.where(above, a, mid)
        return a, b

    a0 = jnp.full((n,), lo)
    b0 = jnp.full((n,), hi)
    a, b = lax.fori_loop(0, n_iter, body, (a0, b0))
    return 0.5 * (a + b)


def refine_eigenvalues_band2(d, e1, e2, w0, n_iter: int = 45):
    """Bisection refinement of approximate pentadiagonal eigenvalues
    (the reference's mode-X refinement through eigen_bisect2)."""
    w0 = w0.astype(F64)
    n = w0.shape[0]
    gaps = jnp.diff(w0)
    pad = jnp.concatenate(
        [gaps[:1] if n > 1 else jnp.ones((1,), F64), gaps]
    ) if n > 1 else jnp.ones((1,), F64)
    half = jnp.maximum(
        0.5 * jnp.maximum(pad, jnp.concatenate([pad[1:], pad[-1:]])),
        jnp.abs(w0) * 1e-12 + 1e-14,
    )
    idx = jnp.arange(n)
    a0 = w0 - half
    b0 = w0 + half
    valid = (sturm_count_band2(d, e1, e2, a0) <= idx) \
        & (sturm_count_band2(d, e1, e2, b0) > idx)

    def body(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        cnt = sturm_count_band2(d, e1, e2, mid)
        above = cnt > idx
        b = jnp.where(above, mid, b)
        a = jnp.where(above, a, mid)
        return a, b

    a, b = lax.fori_loop(0, n_iter, body, (a0, b0))
    return jnp.where(valid, 0.5 * (a + b), w0)


def refine_eigenvalues(d: jnp.ndarray, e: jnp.ndarray, w0: jnp.ndarray,
                       n_iter: int = 45):
    """Sharpen approximate eigenvalues (the reference's mode=1 refinement,
    bisect.F — refine D&C output).  Brackets are local around each w0."""
    w0 = w0.astype(F64)
    n = w0.shape[0]
    gaps = jnp.diff(w0)
    pad = jnp.concatenate(
        [gaps[:1] if n > 1 else jnp.ones((1,), F64), gaps]
    ) if n > 1 else jnp.ones((1,), F64)
    half = jnp.maximum(
        0.5 * jnp.maximum(
            pad, jnp.concatenate([pad[1:], pad[-1:]])
        ),
        jnp.abs(w0) * 1e-12 + 1e-14,
    )
    idx = jnp.arange(n)
    a0 = w0 - half
    b0 = w0 + half
    # a local bracket is only usable if it actually brackets index i
    valid = (sturm_count(d, e, a0) <= idx) & (sturm_count(d, e, b0) > idx)

    def body(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        cnt = sturm_count(d, e, mid)
        above = cnt > idx
        b = jnp.where(above, mid, b)
        a = jnp.where(above, a, mid)
        return a, b

    a, b = lax.fori_loop(0, n_iter, body, (a0, b0))
    return jnp.where(valid, 0.5 * (a + b), w0)
