"""Pallas TPU kernels for the solver's HBM-bound hot ops.

The framework's two flop/byte-dominant updates are *subtract-matmul*
shaped: ``OUT = B − P·Qᵀ`` where B is O(m²) and P/Q are skinny O(m·k)
panels:

* the rank-2k trailing update of the Householder reduction
  ``A ← A − U·Wᴴ − W·Uᴴ`` (reference: eigen_common_2update,
  src/eigen_t1.F:68) — expressed as one product with the panel
  concatenation P=[U W], Q=[W U] so K = 2·nb (=128 at the default
  nb=64, exactly one MXU pass);
* the WY back-transform block ``Z ← Z − V·(T·(VᴴZ))`` (reference:
  the dgemm pair in src/trbakwy4_body.F:573-625,721) whose second
  GEMM is B=Z, P=V, Q=(T·S)ᵀ.

Why a kernel instead of XLA: as separate ops, XLA materializes the
matmul product to HBM and re-reads it (plus B) for the subtract —
≥3 full O(m²) HBM passes.  This kernel streams each B tile through
VMEM once: read B-tile + panel tiles, one MXU contraction, fused
subtract, write — the HBM-bandwidth floor for the op.

Everything here is single-chip; the distributed path shards the
enclosing GEMMs with the SPMD partitioner and each shard-local update
calls the same kernel.  f32 only on the MXU (f64 / complex fall back
to the concat-GEMM jnp path, which is itself the best XLA formulation:
one dot instead of two plus a fusable epilogue).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas import is gated: CPU-only deployments may lack the TPU plugin
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# force-disable switch for A/B benchmarking (env: EIGENEXA_NO_PALLAS=1)
_DISABLED = os.environ.get("EIGENEXA_NO_PALLAS", "0") == "1"

_LANE = 128  # last-dim lane width (pallas_guide.md: tiling constraints)


def set_enabled(flag: bool) -> None:
    """Enable/disable the Pallas kernels (A/B benchmarking).

    `_pallas_eligible` is read at trace time, so already-compiled shapes
    would keep their previous kernel choice; clearing the jit caches here
    makes the toggle take effect for every shape, not just unseen ones.
    """
    global _DISABLED
    _DISABLED = not flag
    _sub_matmul_pallas.clear_cache()
    # callers that traced through sub_matmul are keyed only by shape/dtype —
    # flush them too so the toggle reaches already-seen shapes
    from eigenexa_tpu.ops import band, householder

    householder._tridiag_step.clear_cache()
    householder._remainder_step.clear_cache()
    householder._tridiagonalize_fused.clear_cache()
    householder._win_group.clear_cache()
    householder._win_finish.clear_cache()
    band._band2_step.clear_cache()
    band._band2_remainder.clear_cache()
    band._band2_reduce_fused.clear_cache()
    band._band2_win_group.clear_cache()
    band._band2_win_finish.clear_cache()
    _symv_pallas.clear_cache()
    _sub_matmul_window_pallas.clear_cache()


def _sub_matmul_kernel(b_ref, p_ref, q_ref, o_ref):
    """One (TM, TN) output tile: o = b − p·qᵀ, subtract fused into the
    MXU epilogue (single HBM pass over B)."""
    prod = jax.lax.dot_general(
        p_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = b_ref[:] - prod


def _largest_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sub_matmul_pallas(b, p, q, interpret: bool = False):
    m, n = b.shape
    k = p.shape[1]
    tm = _largest_tile(m, (256, 128, 64, 32, 16, 8))
    tn = _largest_tile(n, (256, 128))
    grid = (m // tm, n // tn)
    return pl.pallas_call(
        _sub_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), b.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            # the 0 literal must be i32: under jax_enable_x64 a Python 0
            # lifts to i64 and Mosaic fails to legalize the index map
            pl.BlockSpec((tm, k), lambda i, j: (i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, k), lambda i, j: (j, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(b, p, q)


def _pad_k(x, k_pad: int):
    k = x.shape[1]
    if k == k_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, k_pad - k)))


def _shape_eligible(b, p) -> bool:
    """Shape/dtype gates shared by the compiled and interpret paths: the
    kernel tiles m/n statically and skips the conj (real f32 only), so an
    unaligned or non-f32 operand must take the jnp fallback in BOTH modes
    (an interpret=True call with unaligned m would otherwise divide by a
    zero tile)."""
    if b.dtype != jnp.float32 or p.dtype != jnp.float32:
        return False
    m, n = b.shape
    if m < 8 or _largest_tile(m, (256, 128, 64, 32, 16, 8)) == 0:
        return False
    if n < _LANE or n % _LANE != 0:
        return False
    # panels must fit VMEM next to the output tile: k ≤ 1024 keeps
    # (256·k + 256·k + 256·256)·4B ≤ ~2.3 MB per program
    if p.shape[1] > 1024:
        return False
    return True


def _pallas_eligible(b, p, q) -> bool:
    if _DISABLED or not _HAS_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    return _shape_eligible(b, p)


def sub_matmul(b, p, q, interpret: bool = False):
    """``B − P·conj(Q)ᵀ`` with the subtract fused into the product.

    Pallas MXU kernel on TPU/f32; elsewhere a single XLA dot with a
    fusable subtract epilogue.  B: (m, n); P: (m, k); Q: (n, k).
    """
    if interpret:
        if not _HAS_PALLAS or not _shape_eligible(b, p):
            return b - p @ jnp.conj(q).T
    elif not _pallas_eligible(b, p, q):
        return b - p @ jnp.conj(q).T
    k_pad = -(-p.shape[1] // _LANE) * _LANE
    return _sub_matmul_pallas(
        b, _pad_k(p, k_pad), _pad_k(q, k_pad), interpret=interpret
    )


# ---------------------------------------------------------------------------
# symmetric matvec on the lower triangle (TRD panel symv)
# ---------------------------------------------------------------------------

# symv/window tile edge.  The kernel is bounded by per-program overhead
# (~1 µs on v5e), so larger tiles amortize it at the cost of coarser
# window granularity.  Measured on v5e at n=8192 (scripts/bench_symv.py,
# in-program chained): tm=256 → 274 GB/s triangle rate; tm=512 →
# 366 GB/s, at which point the single-vector symv beats XLA's full-read
# matvec 1.25× per column and the two-vector pair pass 2.5×.  Env
# override EIGENEXA_WIN_TM for A/B (must divide the padded problem
# size; ops/householder._WIN_TM aliases this value).
_SYMV_TM = int(os.environ.get("EIGENEXA_WIN_TM", "512"))


def _symv_decode(r, c, nw):
    """Packed-triangle grid decode: pair row r with row nw-1-r so a
    rectangular ((nw+1)//2, nw+1) grid enumerates exactly the lower
    tiles (i, j<=i).  `dead` marks the duplicate half of a self-paired
    middle row (odd nw).

    All integer math is explicit i32: under jax_enable_x64 a Python int
    inside ``jnp.where`` becomes a weak i64 whose convert Mosaic lowers
    with infinite recursion (index maps are lowered by Mosaic too)."""
    one = jnp.int32(1)
    nw1 = jnp.int32(nw - 1)
    lower = c <= r
    i = jnp.where(lower, r, nw1 - r)
    j = jnp.where(lower, c, i - (c - r - one))
    dead = jnp.logical_and(jnp.logical_not(lower), r + r == nw1)
    return i, j, dead


@functools.partial(jax.jit, static_argnames=("t0", "nc", "interpret"))
def _symv_pallas(b, xt, t0: int, nc: int, interpret: bool = False):
    """Q = B·X reading only lower-triangle tiles of the window
    [t0·TM:, t0·TM:] of symmetric B — each tile contributes A_ij·x_j to
    q_i and A_ijᵀ·x_i to q_j, halving the HBM traffic of the
    bandwidth-bound symv (the flop- and byte-dominant op of the
    one-stage Householder reduction, reference: the distributed symv of
    src/eigen_trd_t2.F:161; the nc=2 case is the PDSYMV2 two-vector
    pass of src/eigen_prd_t2.F:90).

    xt/q use a transposed (nc, m) layout so VMEM buffers keep a full
    ≥128-lane last dim (an (m, nc) layout would pad the lane dim 128×).
    q columns below the window come back zero.
    """
    tm = _SYMV_TM
    m = b.shape[0]
    nw = m // tm - t0

    def kernel(b_ref, xj_ref, xi_ref, q_ref):
        r = pl.program_id(0)
        c = pl.program_id(1)
        i, j, dead = _symv_decode(r, c, nw)

        @pl.when(jnp.logical_and(r == 0, c == 0))
        def _():
            q_ref[:] = jnp.zeros_like(q_ref)

        @pl.when(jnp.logical_not(dead))
        def _():
            a = b_ref[:]                      # (tm, tm)
            xj = xj_ref[:]                    # (nc, tm)
            qi = jax.lax.dot_general(         # (A·x_j)ᵀ rows
                xj, a, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            q_ref[:, pl.ds((t0 + i) * tm, tm)] += qi

            @pl.when(j < i)
            def _():
                xi = xi_ref[:]
                qj = jax.lax.dot_general(     # (Aᵀ·x_i)ᵀ rows
                    xi, a, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                q_ref[:, pl.ds((t0 + j) * tm, tm)] += qj

    # i32 constants are built INSIDE each map: outside they'd be captured
    # tracers (pallas rejects those), and Python literals would go weak-i64
    # under x64 (Mosaic recurses lowering the convert)
    def bmap(r, c):
        z = jnp.int32(0)
        i, j, dead = _symv_decode(r, c, nw)
        i = jnp.where(dead, z, i)
        j = jnp.where(dead, z, j)
        return (jnp.int32(t0) + i, jnp.int32(t0) + j)

    def xjmap(r, c):
        z = jnp.int32(0)
        i, j, dead = _symv_decode(r, c, nw)
        j = jnp.where(dead, z, j)
        return (z, jnp.int32(t0) + j)

    def ximap(r, c):
        z = jnp.int32(0)
        i, j, dead = _symv_decode(r, c, nw)
        i = jnp.where(dead, z, i)
        return (z, jnp.int32(t0) + i)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nc, m), jnp.float32),
        grid=((nw + 1) // 2, nw + 1),
        in_specs=[
            pl.BlockSpec((tm, tm), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tm), xjmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tm), ximap, memory_space=pltpu.VMEM),
        ],
        # index-map literals must be i32: under jax_enable_x64 a Python 0
        # becomes a weak i64 and Mosaic fails to legalize the return
        out_specs=pl.BlockSpec((nc, m),
                               lambda r, c: (jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(b, xt, xt)


def _symv_eligible(b, t0: int) -> bool:
    m = b.shape[0]
    if b.dtype != jnp.float32 or b.ndim != 2 or m != b.shape[1]:
        return False
    if m % _SYMV_TM != 0 or m // _SYMV_TM - t0 < 1:
        return False
    return True


def symv_lower(b, x, t0: int = 0, interpret: bool = False):
    """``B·x`` for symmetric B stored full, reading only the lower
    triangle of the window ``[t0·256:, t0·256:]`` (Pallas on TPU/f32).
    x may be (m,) or (m, nc) with small nc (the band-2 pair recurrence
    passes nc=2 — the PDSYMV2 analogue).

    Fallback is a plain full dot.  Rows of the result below the window
    are zeros on the kernel path and whatever the full product gives on
    the fallback path — callers mask them either way (the TRD panel
    recurrence only consumes rows > current column).
    """
    vec = x.ndim == 1
    nc = 1 if vec else x.shape[1]
    if interpret:
        if not _HAS_PALLAS or not _symv_eligible(b, t0) or nc > 8:
            return b @ x
    elif (_DISABLED or not _HAS_PALLAS
          or jax.default_backend() != "tpu" or not _symv_eligible(b, t0)
          or nc > 8):
        return b @ x
    xt = x.reshape(1, -1) if vec else x.T
    q = _symv_pallas(b, xt, t0, nc, interpret=interpret)
    return q.reshape(-1) if vec else q.T


# ---------------------------------------------------------------------------
# windowed in-place subtract-matmul (no-roll TRD trailing update)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("t0", "interpret"),
                   donate_argnums=(0,))
def _sub_matmul_window_pallas(b, p, q, t0: int, interpret: bool = False):
    """B[w:, w:] -= P[w:]·Q[w:]ᵀ in place (w = t0·256), aliasing the
    output onto B so the solver's working matrix is updated without a
    second n² buffer.  Tiles outside the window keep their (stale)
    contents — the windowed TRD never reads them as data."""
    tm = _SYMV_TM
    m = b.shape[0]
    k = p.shape[1]
    nw = m // tm - t0

    return pl.pallas_call(
        _sub_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, m), b.dtype),
        grid=(nw, nw),
        in_specs=[
            pl.BlockSpec((tm, tm), lambda i, j: (t0 + i, t0 + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (t0 + i, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (t0 + j, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tm), lambda i, j: (t0 + i, t0 + j),
                               memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(b, p, q)


def rank2k_update_window(b, u, w, t0: int = 0, interpret: bool = False):
    """In-place windowed twin of :func:`rank2k_update`:
    ``B[w:, w:] −= U·Wᵀ + W·Uᵀ`` with B's buffer reused for the output
    (w = t0·256).  Real f32 only (the windowed TRD path); no conj."""
    p = jnp.concatenate([u, w], axis=1)
    q = jnp.concatenate([w, u], axis=1)
    if interpret:
        if not _HAS_PALLAS or not _symv_eligible(b, t0):
            return _rank2k_window_jnp(b, p, q, t0)
    elif (_DISABLED or not _HAS_PALLAS
          or jax.default_backend() != "tpu" or not _symv_eligible(b, t0)
          or p.shape[1] > 1024):
        return _rank2k_window_jnp(b, p, q, t0)
    k_pad = -(-p.shape[1] // _LANE) * _LANE
    return _sub_matmul_window_pallas(
        b, _pad_k(p, k_pad), _pad_k(q, k_pad), t0, interpret=interpret
    )


def _rank2k_window_jnp(b, p, q, t0: int):
    """jnp fallback: full-buffer subtract (u/w are zero above the active
    column anyway, so touching the stale border is harmless)."""
    del t0
    return b - p @ q.T


def rank2k_update(b, u, w, interpret: bool = False):
    """``B − U·conj(W)ᵀ − W·conj(U)ᵀ`` as one fused pass
    (reference: eigen_common_2update, src/eigen_t1.F:68).

    The two rank-nb products become a single rank-2nb contraction via
    panel concatenation — one MXU pass at the default nb=64 (K=128).
    """
    p = jnp.concatenate([u, w], axis=1)
    q = jnp.concatenate([w, u], axis=1)
    return sub_matmul(b, p, q, interpret=interpret)


def wy_apply(z, v, t, interpret: bool = False):
    """``Z − V·(T·(VᴴZ))`` — one WY back-transform block
    (reference: src/trbakwy4_body.F:573-625,721).

    The reduction S=VᴴZ is a plain XLA dot (it reads Z once and writes
    only O(nb·nvec)); the large second product streams Z through the
    fused subtract kernel instead of materializing V·(T·S).
    """
    s = jnp.conj(v).T @ z
    y = t @ s                     # (nb, nvec), small
    return sub_matmul(z, v, jnp.conj(y).T, interpret=interpret)
