"""Tree divide & conquer for the symmetric tridiagonal eigenproblem.

TPU-native re-design of the reference's FS D&C subsystem
(reference: dc2_FS.F:75 → FS_EDC.F90:70 → FS_PDLAED0.F90:62 binary merge
tree; SURVEY.md §3.2).  Key design differences, deliberate and TPU-first:

* **Bottom-up batched tree, not top-down recursion.**  The problem is
  padded to leaf·2^L; every level is ONE vmapped merge over all pairs —
  a single compiled program per level with static shapes, instead of the
  reference's per-node MPI groups (FS_dividing.F90).
* **Mask-based deflation.**  Deflated coordinates keep their slot (exact
  unit eigenvector columns) — no dynamic K, no compaction.  We forgo the
  deflation *flop savings* in the merge GEMM in exchange for dense,
  perfectly-shaped MXU GEMMs; the numerical behavior matches dlaed2.
* **Mixed precision.**  d/z/λ/secular math runs in a working dtype wider
  than or equal to the vector dtype (f64 under x64; f32 on the TPU f32
  path, where thresholds are f32-relative and the (σ, μ) secular
  representation keeps orthogonality at O(ε_work) — ops/secular.py); the
  O(m³) eigenvector GEMM cascade runs in the requested vector dtype.
  Orthogonality comes from the Gu–Eisenstat construction, not from GEMM
  precision.
* Padding coordinates (d beyond n) carry zero coupling, so they deflate
  exactly at every level and fall out of the final slice.

Flop model: Σ_levels B·(2s)³-ish ≈ 4/3·n³ upper bound (no-deflation GEMM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eigenexa_tpu.ops.secular import rank1_merge_core

# canonical f64: float64 under x64, float32 otherwise.  Using
# canonicalize_dtype (not a literal jnp.float64) means x64-off runs get the
# same truncation WITHOUT the per-op "requested f64 will be truncated"
# UserWarning.  Callers that need true f64 enable x64 before importing
# (bench.py, tests/conftest.py do).
F64 = jax.dtypes.canonicalize_dtype("float64")


def _pad_sizes(n: int, leaf: int) -> Tuple[int, int]:
    """Smallest leaf·2^L ≥ n."""
    levels = 0
    m = leaf
    while m < n:
        m *= 2
        levels += 1
    return m, levels


@functools.partial(jax.vmap, in_axes=(0, 0))
def _leaf_eigh(d, e):
    s = d.shape[0]
    t = jnp.zeros((s, s), d.dtype) + jnp.diag(d)
    t = t + jnp.diag(e, 1) + jnp.diag(e, -1)
    return jnp.linalg.eigh(t)


def _leaf_analytic2(db, eb):
    """Closed-form batched 2×2 symmetric eigendecomposition.

    Used on TPU where jnp.linalg.eigh has no usable f64 lowering (the axon
    backend hangs compiling it); with leaf=2 the whole tree is merges, which
    need only the secular machinery.  db: (B, 2), eb: (B, 1).
    """
    # Only +,*,/,sqrt — transcendentals (atan2/hypot/trig) are avoided
    # because the backend's emulated-f64 lowerings of them are unusable.
    from eigenexa_tpu.ops.secular import TINY

    a = db[:, 0]
    c = db[:, 1]
    b = eb[:, 0]
    half = 0.5 * (a + c)
    hd = 0.5 * (a - c)
    rad = jnp.sqrt(hd * hd + b * b)
    # λ1 − a, cancellation-free: −b²/((c−a)/2 + rad) when c ≥ a
    upper = jnp.maximum(-hd + rad, TINY)
    l1ma = jnp.where(c >= a, -(b * b) / upper, -hd - rad)
    w1 = a + l1ma
    w2 = (a + c) - w1
    w = jnp.stack([w1, w2], axis=1)                    # ascending
    # eigenvector for λ1: (b, λ1−a) (never ~0 unless b=0 and a ≤ c)
    vnorm = jnp.sqrt(b * b + l1ma * l1ma)
    degen = vnorm < TINY
    v0 = jnp.where(degen, 1.0, b / jnp.where(degen, 1.0, vnorm))
    v1 = jnp.where(degen, 0.0, l1ma / jnp.where(degen, 1.0, vnorm))
    # orthogonal partner (−v1, v0) pairs with λ2
    q = jnp.stack(
        [jnp.stack([v0, v1], axis=1), jnp.stack([-v1, v0], axis=1)],
        axis=2,
    )  # (B, 2, 2): q[:, :, 0] ~ w1, q[:, :, 1] ~ w2
    return w, q


def _host_leaf_eigh(db, eb):
    """Host (scipy) leaf eigendecomposition — used when impl='host'."""
    import scipy.linalg

    db = np.asarray(db, np.float64)
    eb = np.asarray(eb, np.float64)
    bsz, s = db.shape
    w = np.empty((bsz, s))
    q = np.empty((bsz, s, s))
    for b in range(bsz):
        if s == 1:
            w[b] = db[b]
            q[b] = 1.0
        else:
            w[b], q[b] = scipy.linalg.eigh_tridiagonal(db[b], eb[b])
    return w, q


@functools.partial(jax.jit, static_argnames=("s",))
def _apply_level_gemm(q2, cud, s: int):
    """Batched block-diagonal basis application: the only device work of a
    host-secular merge level (plain GEMMs — compiles fast everywhere)."""

    def one(qpair, cub):
        top = qpair[0] @ cub[:s, :]
        bot = qpair[1] @ cub[s:, :]
        return jnp.concatenate([top, bot], axis=0)

    return jax.vmap(one)(q2, cud)


def _merge_level(d, q, row0, row1, rho, sgn, vec_dtype, n_iter,
                 work_dtype=None):
    """One tree level: merge pairs (2b, 2b+1).

    d: (B, s) sorted per block; q: (B, s, s) in vec_dtype; row0/row1:
    (B, s) — first/last rows of each block's eigenvector matrix carried in
    the working dtype so the rank-1 z-vectors keep full working precision
    even when the O(m³) eigenvector cascade runs in a narrower vec_dtype;
    rho: (B/2,) ≥ 0 couplings; sgn: (B/2,) sign applied to the right z.
    Returns (d', q', row0', row1') with B/2 blocks of size 2s.
    """
    wdt = work_dtype or d.dtype
    bsz, s = d.shape
    d2 = d.reshape(bsz // 2, 2, s)
    q2 = q.reshape(bsz // 2, 2, s, s)
    r0 = row0.reshape(bsz // 2, 2, s)
    r1 = row1.reshape(bsz // 2, 2, s)

    def merge_one(dpair, qpair, r0p, r1p, rho_b, sgn_b):
        dl, dr = dpair[0], dpair[1]
        ql, qr = qpair[0], qpair[1]
        dm = jnp.concatenate([dl, dr]).astype(wdt)
        z = jnp.concatenate([r1p[0], sgn_b * r0p[1]])  # working-dtype rows
        core = rank1_merge_core(dm, z, rho_b, n_iter=n_iter,
                                work_dtype=wdt)
        # scatter rows of c back to pre-sort coordinate order, then apply
        # the block-diagonal basis in two half-height GEMMs (dlaed3 shape)
        c_unsorted = jnp.zeros_like(core.c).at[core.perm, :].set(core.c)
        cu = c_unsorted.astype(vec_dtype)
        top = ql @ cu[:s, :]
        bot = qr @ cu[s:, :]
        # propagate boundary rows in the working dtype (O(m²))
        row0_new = r0p[0] @ c_unsorted[:s, :]
        row1_new = r1p[1] @ c_unsorted[s:, :]
        return core.lam, jnp.concatenate([top, bot], axis=0), row0_new, \
            row1_new

    lam, qm, r0n, r1n = jax.vmap(merge_one)(d2, q2, r0, r1, rho, sgn)
    return lam, qm, r0n, r1n


# one compiled program per tree level (shapes differ per level); without
# this the eager per-op dispatch of a level's merge graph is thousands of
# small kernels
_merge_level_jit = functools.partial(
    jax.jit, static_argnames=("vec_dtype", "n_iter", "work_dtype")
)(_merge_level)


def _merge_level_chunked(d, q, row0, row1, rho, sgn, vec_dtype, n_iter,
                         work_dtype, panel: int):
    """_merge_level with the C transform built in column panels
    (secular.rank1_merge_apply_parts) — per-merge transient O(2s·panel)
    instead of O((2s)²).  Used by the per-level orchestration at the top
    of very large trees (n ≥ 16k), where the materialized C (plus its
    secular intermediates) would pressure HBM."""
    wdt = work_dtype or d.dtype
    bsz, s = d.shape
    d2 = d.reshape(bsz // 2, 2, s)
    q2 = q.reshape(bsz // 2, 2, s, s)
    r0 = row0.reshape(bsz // 2, 2, s)
    r1 = row1.reshape(bsz // 2, 2, s)

    def merge_one(dpair, qpair, r0p, r1p, rho_b, sgn_b):
        from eigenexa_tpu.ops.secular import rank1_merge_apply_parts

        dm = jnp.concatenate([dpair[0], dpair[1]]).astype(wdt)
        z = jnp.concatenate([r1p[0], sgn_b * r0p[1]])
        lam, (top, bot, r0n, r1n) = rank1_merge_apply_parts(
            dm, z, rho_b,
            parts=((qpair[0], 0), (qpair[1], s),
                   (r0p[0][None, :], 0), (r1p[1][None, :], s)),
            n_iter=n_iter, work_dtype=wdt, panel=panel)
        return lam, jnp.concatenate([top, bot], axis=0), r0n[0], r1n[0]

    return jax.vmap(merge_one)(d2, q2, r0, r1, rho, sgn)


# NOTE on memory: the cascade's level input (B, s, s) holds m·s elements
# and its output (B/2, 2s, 2s) holds 2·m·s — the output is TWICE the
# input, so in-place donation across a level is structurally impossible.
# The eager level loop's natural peak is the top level's in+out ≈ 1.5·n²
# in vec_dtype, which fits the 16 GB chip at n=32768 f32 (6.4 GB).
_merge_level_chunked_jit = functools.partial(
    jax.jit, static_argnames=("vec_dtype", "n_iter", "work_dtype", "panel")
)(_merge_level_chunked)

# per-level orchestration: merges at least this wide build C in column
# panels (the single-chip twin of dc_dist._CHUNK_MIN_WIDTH; 16384 keeps
# the n=8192 fused path's behavior unchanged)
_LEVEL_CHUNK_MIN = 16384
_LEVEL_CHUNK_PANEL = 1024

# levels whose merged width is at most this are traced into ONE program
# by the eager orchestration (first-warm cost through the tunnel is ~1 s
# of compile-cache deserialization PER PROGRAM — ~10 small-level
# programs at n=32k were pure overhead; the bundle compiles like the
# n=2048 fused tree)
_LEVEL_FUSE_MAX = 2048


@functools.partial(
    jax.jit,
    static_argnames=("vec_dtype", "n_iter", "work_dtype"))
def _merge_levels_fused(w, q, row0, row1, rhos, sgns, *, vec_dtype,
                        n_iter: int, work_dtype):
    """A run of consecutive merge levels as ONE program (rhos/sgns: tuple
    of per-level coupling arrays — the static pytree structure fixes the
    level count)."""
    for rho, sgn in zip(rhos, sgns):
        w, q, row0, row1 = _merge_level(
            w, q, row0, row1, rho, sgn,
            vec_dtype=vec_dtype, n_iter=n_iter, work_dtype=work_dtype)
    return w, q, row0, row1


def _solve_tridiag_host(d, e, leaf: int, vec_dtype, n_iter: int):
    """Eager host-orchestrated tree: numpy secular merges (true f64, zero
    device-compile cost) + jitted batched GEMM cascade on the device.

    Used on backends where jitting the merge graph is impractical (axon
    compiles it for tens of minutes) and callbacks are unsupported.  Not
    traceable — called outside jit by the solver facade.
    """
    from eigenexa_tpu.solvers.dc_host import merge_batch

    d = np.asarray(d, np.float64)
    e = np.asarray(e, np.float64)
    n = d.shape[0]
    if not (np.isfinite(d).all() and np.isfinite(e).all()):
        # NaN-poisoning contract (reference: eigen_scaling + driver guard,
        # src/eigen_s.F:156-160): non-finite input must yield NaN results,
        # not an exception — scipy's leaf solver would raise otherwise.
        # canonicalize_dtype avoids the "requested f64 will be truncated"
        # UserWarning an explicit jnp f64 request emits when x64 is off
        wdt = jax.dtypes.canonicalize_dtype(np.float64)
        return (jnp.full((n,), jnp.nan, wdt),
                jnp.full((n, n), jnp.nan, vec_dtype))
    leaf = max(2, min(leaf, n))
    m, levels = _pad_sizes(n, leaf)

    span = np.abs(d).max() + (np.abs(e).max() if n > 1 else 0.0)
    base = max(span, 1e-30)
    d_pad = np.concatenate([d, 2.0 * base + (base / m) * np.arange(m - n)])
    e_pad = np.concatenate([e, np.zeros(m - n + 1)])

    cuts = np.arange(leaf, m, leaf)
    rho_all = np.abs(e_pad[cuts - 1])
    d_mod = d_pad.copy()
    d_mod[cuts - 1] -= rho_all
    d_mod[cuts] -= rho_all

    nblk = m // leaf
    d_blocks = d_mod.reshape(nblk, leaf)
    e_idx = (np.arange(nblk)[:, None] * leaf
             + np.arange(leaf - 1)[None, :]).reshape(-1)
    e_blocks = e_pad[e_idx].reshape(nblk, leaf - 1)
    w, q_np = _host_leaf_eigh(d_blocks, e_blocks)
    row0 = q_np[:, 0, :].copy()
    row1 = q_np[:, -1, :].copy()
    np_vdt = np.dtype(vec_dtype)
    q = jnp.asarray(q_np.astype(np_vdt))

    for lvl in range(levels):
        s = leaf * (2**lvl)
        bsz = w.shape[0]
        cut_pos = np.arange(s, m, 2 * s)
        rho = np.abs(e_pad[cut_pos - 1])
        sgn = np.where(e_pad[cut_pos - 1] >= 0, 1.0, -1.0)
        d2 = w.reshape(bsz // 2, 2 * s)
        r0 = row0.reshape(bsz // 2, 2, s)
        r1 = row1.reshape(bsz // 2, 2, s)
        z = np.concatenate([r1[:, 0, :], sgn[:, None] * r0[:, 1, :]], axis=1)
        # the middle-way iteration is cubic; 16 safeguarded steps reach f64
        # roundoff — don't pay the jitted path's conservative default here
        lam, cu = merge_batch(d2, z, rho, min(n_iter, 16))
        cud = jnp.asarray(cu.astype(np_vdt))  # cast on host: halves PCIe
        q2 = q.reshape(bsz // 2, 2, s, s)
        q = _apply_level_gemm(q2, cud, s)
        row0 = np.einsum("bs,bsm->bm", r0[:, 0, :], cu[:, :s, :])
        row1 = np.einsum("bs,bsm->bm", r1[:, 1, :], cu[:, s:, :])
        w = lam

    w = w.reshape(m)
    q = q.reshape(m, m)
    return jnp.asarray(w[:n]), q[:n, :n]


def _solve_tridiag_level(d, e, leaf: int, vec_dtype, n_iter: int,
                         work_dtype, leaf_kind: str):
    """Eager per-LEVEL orchestration: one jitted program per tree level,
    dispatched from the host — the reference's eager level loop
    (src/FS_PDLAED0.F90:197-246 walks the merge tree one level at a time
    for exactly this reason: one giant program does not scale).

    Compile size scales with the number of levels (~log2 n), not with n,
    which is what lets the whole-solve run at n ≥ 16384 on the TPU where
    the fully-fused tree (`_solve_tridiag_fused`) exceeds what the
    toolchain will compile.  All matrix data stays on device (the merges
    are the same `_merge_level_jit` programs the fused path traces); only
    the O(n) cut bookkeeping runs on the host.  NOT traceable — called
    outside jit by the solver facade.
    """
    wdt = work_dtype
    n = d.shape[0]
    d_h = np.asarray(d, np.float64)
    e_h = np.asarray(e, np.float64)
    if not (np.isfinite(d_h).all() and np.isfinite(e_h).all()):
        # NaN-poisoning contract (src/eigen_s.F:156-160)
        return (jnp.full((n,), jnp.nan, wdt),
                jnp.full((n, n), jnp.nan, vec_dtype))
    leaf = max(2, min(leaf, n))
    m, levels = _pad_sizes(n, leaf)

    span = np.abs(d_h).max() + (np.abs(e_h).max() if n > 1 else 0.0)
    base = max(span, 1e-30)
    d_pad = np.concatenate([d_h, 2.0 * base
                            + (base / m) * np.arange(m - n)])
    e_pad = np.concatenate([e_h, np.zeros(m - n + 1)])
    cuts = np.arange(leaf, m, leaf)
    rho_all = np.abs(e_pad[cuts - 1])
    d_mod = d_pad.copy()
    d_mod[cuts - 1] -= rho_all
    d_mod[cuts] -= rho_all

    nblk = m // leaf
    np_wdt = np.dtype(wdt)
    d_blocks = jnp.asarray(d_mod.reshape(nblk, leaf).astype(np_wdt))
    e_idx = (np.arange(nblk)[:, None] * leaf
             + np.arange(max(leaf - 1, 1))[None, :]).reshape(-1)
    e_blocks = jnp.asarray(
        e_pad[e_idx].reshape(nblk, max(leaf - 1, 1))[:, : leaf - 1]
        .astype(np_wdt))
    if leaf_kind == "analytic2":
        w, q = jax.jit(_leaf_analytic2)(d_blocks, e_blocks)
    else:
        w, q = jax.jit(_leaf_eigh)(d_blocks, e_blocks)
    row0 = q[:, 0, :]
    row1 = q[:, -1, :]
    q = q.astype(vec_dtype)

    def _coupling(lvl):
        s = leaf * (2**lvl)
        cut_pos = np.arange(s, m, 2 * s)
        rho = jnp.asarray(np.abs(e_pad[cut_pos - 1]).astype(np_wdt))
        sgn = jnp.asarray(
            np.where(e_pad[cut_pos - 1] >= 0, 1.0, -1.0).astype(np_wdt))
        return rho, sgn

    # bundle the consecutive SMALL levels into one program
    n_small = 0
    while (n_small < levels
           and 2 * leaf * (2**n_small) <= _LEVEL_FUSE_MAX):
        n_small += 1
    if n_small > 0:
        cps = [_coupling(lvl) for lvl in range(n_small)]
        w, q, row0, row1 = _merge_levels_fused(
            w, q, row0, row1,
            tuple(c[0] for c in cps), tuple(c[1] for c in cps),
            vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
            work_dtype=jnp.dtype(wdt))

    for lvl in range(n_small, levels):
        s = leaf * (2**lvl)
        rho, sgn = _coupling(lvl)
        if 2 * s >= _LEVEL_CHUNK_MIN:
            w, q, row0, row1 = _merge_level_chunked_jit(
                w, q, row0, row1, rho, sgn,
                vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
                work_dtype=jnp.dtype(wdt), panel=_LEVEL_CHUNK_PANEL)
        else:
            w, q, row0, row1 = _merge_level_jit(
                w, q, row0, row1, rho, sgn,
                vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
                work_dtype=jnp.dtype(wdt))

    w = w.reshape(m)
    q = q.reshape(m, m)
    return w[:n], q[:n, :n]


# above this n the fully-fused tree exceeds what the TPU toolchain will
# compile (measured r03: n=8192 fused compiles and is cached; n=16384 does
# not finish) — larger problems take the per-level eager orchestration
FUSED_TREE_MAX_N = 8192


def _pick_impl(on_cpu: bool, f32_vecs: bool, n: int) -> str:
    """The impl-dispatch rule of solve_tridiag_dc, split out pure so the
    FUSED_TREE_MAX_N boundary is unit-testable without a TPU backend
    (tests/test_dc_tree.py): CPU → fused 'jax' tree at any n; TPU f32 →
    fused up to FUSED_TREE_MAX_N, per-level above; TPU f64 → host
    secular core (the emulated-f64 merge graph has pathological compile
    times)."""
    if on_cpu or f32_vecs:
        return "level" if (not on_cpu and n > FUSED_TREE_MAX_N) else "jax"
    return "host"


def solve_tridiag_dc(
    d: jnp.ndarray,
    e: jnp.ndarray,
    leaf: int = 32,
    vec_dtype=None,
    n_iter: int = 40,
    leaf_kind: str = None,
    impl: str = None,
    work_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition T = S·diag(w)·Sᵀ of the tridiagonal (d, e).

    Returns ascending (w (n,), S (n, n)).  `vec_dtype` controls the GEMM
    cascade precision (defaults to d.dtype); `work_dtype` the secular
    precision: f64 under x64 by default, but f32 on TPU when the vectors
    are f32 — accuracy thresholds are dtype-relative (ev_test/w_test use
    the matrix dtype's ε), and the (σ, μ) secular representation keeps
    orthogonality at O(ε_work) (see ops/secular.py).

    leaf_kind: 'eigh' (LAPACK-style dense leaves) or 'analytic2'
    (closed-form 2×2 leaves) — jax impl only.
    impl: 'jax' (fully jitted merges — default everywhere except the
    TPU f64 path and TPU n > FUSED_TREE_MAX_N; one compiled program for
    the whole tree, all data stays on device), 'level' (eager per-level
    dispatch of the same device merges — the large-n TPU path; NOT
    traceable) or 'host' (eager: numpy secular core on host, device GEMM
    cascade — the TPU f64 path, where the emulated-f64 merge graph has
    pathological compile times; NOT traceable under jit).
    """
    n = d.shape[0]
    vec_dtype = vec_dtype or d.dtype
    on_cpu = jax.default_backend() == "cpu"
    f32_vecs = jnp.dtype(vec_dtype) == jnp.dtype(jnp.float32)
    if impl is None:
        impl = _pick_impl(on_cpu, f32_vecs, n)
    if work_dtype is None:
        work_dtype = (jnp.dtype(jnp.float32) if (not on_cpu and f32_vecs)
                      else jax.dtypes.canonicalize_dtype(np.float64))
    work_dtype = jnp.dtype(work_dtype)
    if work_dtype == jnp.dtype(jnp.float32):
        # the middle-way iteration is cubic; 16 safeguarded steps overshoot
        # f32 roundoff already
        n_iter = min(n_iter, 16)
    if n == 1:
        return d.astype(work_dtype), jnp.ones((1, 1), vec_dtype)
    if impl == "host":
        return _solve_tridiag_host(d, e, leaf, vec_dtype, n_iter)
    if leaf_kind is None:
        leaf_kind = "eigh" if on_cpu else "analytic2"
    if leaf_kind == "analytic2":
        leaf = 2
    leaf = max(2, min(leaf, n))
    if impl == "level":
        return _solve_tridiag_level(
            d, e, leaf=leaf, vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
            work_dtype=work_dtype, leaf_kind=leaf_kind)
    return _solve_tridiag_fused(
        d, e, leaf=leaf, vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter,
        work_dtype=work_dtype, leaf_kind=leaf_kind,
    )


@functools.partial(
    jax.jit,
    static_argnames=("leaf", "vec_dtype", "n_iter", "work_dtype",
                     "leaf_kind"),
)
def _solve_tridiag_fused(d, e, *, leaf: int, vec_dtype, n_iter: int,
                         work_dtype, leaf_kind: str):
    """The whole pad → leaves → merge-tree pipeline as ONE XLA program.

    Per-level dispatch latency through a tunneled TPU is ~tens of ms; at
    n=2048 the 10 separate level/glue dispatches cost more than the D&C
    math itself.  All shapes are static functions of (n, leaf)."""
    n = d.shape[0]
    m, levels = _pad_sizes(n, leaf)

    wdt = work_dtype
    d = d.astype(wdt)
    e = e.astype(wdt)
    # pad: decoupled ascending diagonal beyond n.  Pad values must be
    # SCALE-RELATIVE: absolute-scale pads would inflate the deflation
    # tolerances of any merge whose block mixes real and pad coordinates.
    span = jnp.max(jnp.abs(d)) + (jnp.max(jnp.abs(e)) if n > 1 else 0.0)
    base = jnp.maximum(span, jnp.finfo(wdt).tiny)
    d_pad = jnp.concatenate(
        [d, 2.0 * base + (base / m) * jnp.arange(m - n, dtype=wdt)]
    )
    e_pad = jnp.concatenate([e, jnp.zeros((m - n + 1,), wdt)])  # len m

    # cut couplings: boundary p couples (p-1, p) via e_pad[p-1]; every leaf
    # boundary is cut at exactly one level.  Cuppen modification: subtract
    # |e| from both adjacent diagonals at every cut.
    cuts = np.arange(leaf, m, leaf)
    rho_all = jnp.abs(e_pad[cuts - 1])
    sgn_all = jnp.where(e_pad[cuts - 1] >= 0, 1.0, -1.0)
    d_mod = d_pad
    d_mod = d_mod.at[cuts - 1].add(-rho_all)
    d_mod = d_mod.at[cuts].add(-rho_all)

    # leaves
    nblk = m // leaf
    d_blocks = d_mod.reshape(nblk, leaf)
    # intra-leaf e: block b uses e_pad[b·leaf + (0..leaf-2)]
    e_idx = (
        np.arange(nblk)[:, None] * leaf + np.arange(leaf - 1)[None, :]
    )
    e_blocks = e_pad[jnp.asarray(e_idx.reshape(-1))].reshape(nblk, leaf - 1)
    if leaf_kind == "analytic2":
        w, q = _leaf_analytic2(d_blocks, e_blocks)
    else:
        w, q = _leaf_eigh(d_blocks, e_blocks)
    row0 = q[:, 0, :]          # f64 boundary rows before the cast
    row1 = q[:, -1, :]
    q = q.astype(vec_dtype)

    # merge levels: level ℓ joins blocks of size leaf·2^ℓ at cut positions
    # leaf·2^ℓ·(2b+1)
    for lvl in range(levels):
        s = leaf * (2**lvl)
        cut_pos = np.arange(s, m, 2 * s)  # one cut per pair
        rho = jnp.abs(e_pad[cut_pos - 1])
        sgn = jnp.where(e_pad[cut_pos - 1] >= 0, 1.0, -1.0)
        w, q, row0, row1 = _merge_level_jit(
            w, q, row0, row1, rho, sgn,
            vec_dtype=jnp.dtype(vec_dtype), n_iter=n_iter, work_dtype=wdt
        )

    w = w.reshape(m)
    q = q.reshape(m, m)
    return w[:n], q[:n, :n]
