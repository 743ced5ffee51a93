"""WY-blocked Householder back-transform (trbakwy4 analogue).

Reference: eigen_common_trbakwy (src/trbakwy4.F:77) applies the TRD
reflectors to the D&C eigenvectors in blocks of m_b=128 with
bcast/reduce-overlap machinery.  On TPU the whole loop is a chain of MXU
GEMMs under one jit — XLA overlaps collectives with compute in the
distributed path, so the reference's hand-tuned overlap auto-tuner
(trbakwy4_body.F:160-190) has no analogue here by design.

Flop model: 2·nvec·n² (reference: src/eigen_s.F:248).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from eigenexa_tpu.ops.householder import wy_t_factor, apply_wy_left


# above this many WY blocks the Python-unrolled program (one GEMM pair per
# block, each a distinct shape) becomes a compile-size hazard — switch to
# the chunk+scan formulation (measured: 64 blocks/n=8192 compiles fine)
_UNROLL_MAX_BLOCKS = 64


def back_transform(z: jnp.ndarray, v: jnp.ndarray, tau: jnp.ndarray,
                   nb: int = 128, donate: bool = False) -> jnp.ndarray:
    """Z ← Q·Z where Q = H_0·…·H_{n-3} from `tridiagonalize`.

    `z` is (n, nvec) — the eigenvectors of the tridiagonal matrix; returns
    eigenvectors of the original A.  Blocks are applied in reverse order so
    the product telescopes as Q = B_0·(B_1·(…·(B_L·Z))).

    Two formulations, dispatched by block count:

    * unrolled (≤ _UNROLL_MAX_BLOCKS): row slices are static (Python
      loop), so each block's GEMMs only touch the nonzero rows of V —
      the true 2·nvec·n² flop count.
    * chunk+scan (large n): blocks are grouped into ~8 static row-extent
      chunks; within a chunk a ``lax.scan`` applies fixed-shape blocks
      (compile size scales with chunk count, not n/nb).  Rows between
      the chunk start and a block's own start are structurally zero in
      V, so the extra GEMM rows are exact no-ops costing ~12% flops.
    """
    n = z.shape[0]
    nblocks = (max(n - 1, 0) + nb - 1) // nb
    if nblocks <= _UNROLL_MAX_BLOCKS:
        return _back_transform_unrolled(z, v, tau, nb=nb)
    if not donate:
        # the chunked jits donate z (their working eigenvector buffer
        # aliases it — one n² saved at the sizes this path serves); the
        # public default stays non-destructive via a copy
        z = z + jnp.zeros((), z.dtype)
    # the row-chunked program peaks at ~3×Z + V (Z, a row-slice and its
    # ping-pong partner all live at the full-height chunk); when that
    # exceeds the device memory (n=32768 f32 full spectrum: 18.6 GB on a
    # 15.75 GB chip, measured by the XLA compile-time OOM), split the
    # eigenvector COLUMNS and run the same program per column block —
    # peak drops to pieces + V + working ≈ 2×Z·(1+1/c) + V
    from eigenexa_tpu.ops.householder import _hbm_bytes

    if 3 * z.nbytes + v.nbytes > 0.85 * _hbm_bytes():
        return _back_transform_colchunked(z, v, tau, nb=nb)
    return _back_transform_chunked(z, v, tau, nb=nb)


def _back_transform_colchunked(z, v, tau, nb: int, n_cchunks: int = 8):
    """Eager column-chunked TRBAK, IN PLACE on a donated Z: the WY blocks
    act independently on each eigenvector column, so each call of
    `_bt_cols_inplace` slices one column block out of Z, runs the
    row-chunked application on it, and writes it back — the output
    aliases the donated Z, so ONE n·nvec buffer serves the whole stage
    and peak memory is Z + V + an O(n·nvec/c) working block.  (A
    concatenate-the-pieces formulation peaks at input+output+V ≈ 3·n²
    and RESOURCE_EXHAUSTs the 16 GB chip at n=32768 full-spectrum —
    measured.)  The column offset is a traced scalar: one compiled
    program serves every block.  The reference's trbakwy4 equally tiles
    Z columns per process column (src/trbakwy4.F:77)."""
    nvec = z.shape[1]
    cw = -(-nvec // n_cchunks)
    c0 = 0
    while c0 < nvec:
        w = min(cw, nvec - c0)  # tail block may be narrower (2nd compile)
        z = _bt_cols_inplace(z, v, tau, jnp.int32(c0), cw=w, nb=nb)
        c0 += w
    return z


@functools.partial(jax.jit, static_argnames=("cw", "nb"),
                   donate_argnums=(0,))
def _bt_cols_inplace(z, v, tau, c0, cw: int, nb: int):
    """Apply the full WY chain to columns [c0, c0+cw) of Z in place."""
    zc = lax.dynamic_slice(z, (jnp.int32(0), c0), (z.shape[0], cw))
    zc = _bt_rows(zc, v, tau, nb, 8)
    return lax.dynamic_update_slice(z, zc, (jnp.int32(0), c0))


@functools.partial(jax.jit, static_argnames=("nb",))
def _back_transform_unrolled(z, v, tau, nb: int):
    n = z.shape[0]
    # cover n-1 reflector columns: for real input tau[n-2]=0 (no-op), but
    # the Hermitian path uses reflector n-2 as the phase rotation that makes
    # the last sub-diagonal real (zlarfg convention) — it must be applied.
    blocks = list(range(0, max(n - 1, 0), nb))
    for k in reversed(blocks):
        b = min(nb, max(n - 1 - k, 0))
        if b <= 0:
            continue
        vb = v[k:, k : k + b]          # rows < k+1 are structurally zero
        tb = tau[k : k + b]
        t = wy_t_factor(vb, tb)
        zk = apply_wy_left(z[k:, :], vb, t)
        z = z.at[k:, :].set(zk)
    return z


@functools.partial(jax.jit, static_argnames=("nb", "n_chunks"),
                   donate_argnums=(0,))
def _back_transform_chunked(z, v, tau, nb: int, n_chunks: int = 8):
    """jit wrapper over `_bt_rows` (donates z)."""
    return _bt_rows(z, v, tau, nb, n_chunks)


def _bt_rows(z, v, tau, nb: int, n_chunks: int):
    """Blocks grouped into n_chunks static row extents; within a chunk
    every block slice is STATIC (row start coarsened to the chunk start),
    so the program has only n_chunks distinct GEMM shapes — compile size
    bounded — while all slices stay static (a lax.scan variant with
    dynamic lane-dim slices of V measured ~8× slower on the chip)."""
    n = z.shape[0]
    nfull = max(n - 1, 0) // nb          # full-width blocks
    # remainder block first (it is applied first in reverse order)
    k_rem = nfull * nb
    b_rem = max(n - 1 - k_rem, 0)
    if b_rem > 0:
        vb = v[k_rem:, k_rem : k_rem + b_rem]
        t = wy_t_factor(vb, tau[k_rem : k_rem + b_rem])
        z = z.at[k_rem:, :].set(apply_wy_left(z[k_rem:, :], vb, t))
    if nfull == 0:
        return z

    per = -(-nfull // n_chunks)          # blocks per chunk (ceil)
    chunks = [(c * per, min((c + 1) * per, nfull))
              for c in range(-(-nfull // per))]
    for b0, b1 in reversed(chunks):
        row0 = b0 * nb                   # static row extent of this chunk
        zc = z[row0:, :]
        for bi in reversed(range(b0, b1)):
            k = bi * nb                  # static column offset
            vb = v[row0:, k : k + nb]
            t = wy_t_factor(vb, tau[k : k + nb])
            zc = apply_wy_left(zc, vb, t)
        z = z.at[row0:, :].set(zc)
    return z
