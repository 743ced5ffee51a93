"""Distributed divide & conquer for the reduced tridiagonal problem.

TPU-native re-design of the FS D&C subsystem (reference:
src/FS_PDLAED0.F90:62 binary merge tree over the process grid;
src/FS_dividing.F90:22-55 per-node sub-grids and MERGE_GROUPs;
src/FS_REDUCE_ZD.F90:98 group-scoped z/d reduction;
src/FS_PDLAED3.F90:281,646-765 secular roots + eigenvector GEMM with
panel exchange; src/FS2eigen_PDLASRT.F90:237 final redistribution).

Design (deliberately different from the reference's choreography):

* **Rows never move.**  Each of the P = px·py devices permanently owns a
  contiguous block of n_pad/P tridiagonal coordinates (= eigenvector
  ROWS).  In phase 1 ("local", blocks smaller than a shard) every level
  is an embarrassingly-parallel vmapped batch of merges with zero
  communication — the analogue of the FS leaf DSTEDC + deep tree levels
  that fit inside one rank.  In phase 2 ("group", blocks spanning 2^t
  shards) each merge group doubles per level like the FS bt_node tree,
  and the ONLY communication is the group-scoped allreduce of the O(m)
  z/d/boundary-row vectors (grouped_allreduce — recursive-doubling XOR
  butterfly, the MPI_Group_Allreduce analogue).  The reference instead
  pipelines Q2 eigenvector panels between ranks (FS_PDLAED3.F90:646);
  keeping rows pinned makes that exchange unnecessary at the cost of
  replicating the O(m²) secular->C construction inside the group — an
  MXU-friendly trade (C is built by cheap VPU ops; the O(m³/P) GEMM is
  what scales).
* **Weak-scaling memory**: the eigenvector state is always
  (n_pad/P) × width per device — n_pad² / P total, like the reference's
  block-cyclic Q.  The transient C matrix is O(width²) per device at the
  top level; chunking C by column panels (the FS_PDLAED3 DGEMM pipeline
  analogue) is the known follow-up for n ≳ 32k.
* Same mask-deflation, padding and mixed-precision contracts as the
  single-device tree (solvers/dc_tree.py) — the two share the leaf and
  local-merge kernels, so single-device and distributed results agree to
  roundoff and are each bitwise-reproducible per mesh.

Requires P to be a power of two — exactly the FS subsystem's constraint
(FS_init splits off a 2^⌊log2 P⌋ subcommunicator, src/FS_libs.F90:183);
other device counts take the replicated fallback the same way non-member
ranks sit out the FS tree.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eigenexa_tpu.parallel.collectives import grouped_allreduce
from eigenexa_tpu.parallel.mesh import mesh_shape
from eigenexa_tpu.ops.secular import rank1_merge_apply, rank1_merge_core
from eigenexa_tpu.solvers.dc_tree import (
    _leaf_analytic2,
    _leaf_eigh,
    _merge_level,
    _pad_sizes,
)


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def _tree_sizes(n: int, p: int, leaf: int) -> Tuple[int, int, int]:
    """(n_pad, levels, rloc): n_pad = leaf·2^L ≥ max(n, leaf·p)."""
    m, levels = _pad_sizes(max(n, leaf * p), leaf)
    return m, levels, m // p


# group merges whose width 2s reaches this size build C in column panels
# (rank1_merge_apply) instead of materializing the (2s)² transient — the
# FS_PDLAED3 DGEMM-pipeline analogue.  Width of one panel: _CHUNK_PANEL.
_CHUNK_MIN_WIDTH = 4096
_CHUNK_PANEL = 512


def _dc_tree_shard(d_mod, e_pad, *, leaf: int, leaf_kind: str, n_iter: int,
                   work_dtype, vec_dtype, px: int, py: int, rloc: int,
                   chunk_min: int = _CHUNK_MIN_WIDTH,
                   chunk_panel: int = _CHUNK_PANEL):
    """shard_map body: the full merge tree for this shard's rows.

    d_mod/e_pad: (n_pad,) replicated (Cuppen-modified diagonal and padded
    off-diagonal, built by the caller).  Returns (w (n_pad,) replicated,
    q_loc (rloc, n_pad) — this shard's eigenvector rows).
    """
    p = px * py
    r = lax.axis_index("x") * py + lax.axis_index("y")
    g_off = r * rloc
    wdt = work_dtype

    # ---- leaves (FS_PDLAED0.F90:178 local DSTEDC analogue) ----
    nblk = rloc // leaf
    my_d = lax.dynamic_slice(d_mod, (g_off,), (rloc,)).reshape(nblk, leaf)
    bidx = (jnp.arange(nblk)[:, None] * leaf
            + jnp.arange(max(leaf - 1, 1))[None, :])
    my_e = e_pad[g_off + bidx.reshape(-1)].reshape(nblk, max(leaf - 1, 1))
    if leaf == 1:
        w = my_d
        q = jnp.ones((nblk, 1, 1), wdt)
    elif leaf_kind == "analytic2":
        w, q = _leaf_analytic2(my_d, my_e[:, : leaf - 1])
    else:
        w, q = _leaf_eigh(my_d, my_e[:, : leaf - 1])
    row0 = q[:, 0, :]
    row1 = q[:, -1, :]
    q = q.astype(vec_dtype)

    # ---- phase 1: shard-local merge levels (zero communication) ----
    lvl = 0
    while (1 << lvl) < nblk:
        s = leaf * (1 << lvl)
        npair = nblk >> (lvl + 1)
        cut = g_off + s + jnp.arange(npair) * (2 * s)
        rho = jnp.abs(e_pad[cut - 1])
        sgn = jnp.where(e_pad[cut - 1] >= 0, 1.0, -1.0)
        w, q, row0, row1 = _merge_level(
            w, q, row0, row1, rho, sgn,
            vec_dtype=vec_dtype, n_iter=n_iter, work_dtype=wdt,
        )
        lvl += 1

    # shard now owns exactly its rows of one block of width rloc
    q_loc = q.reshape(rloc, rloc)
    w = w.reshape(rloc)
    row0 = row0.reshape(rloc)
    row1 = row1.reshape(rloc)

    # ---- phase 2: group merge levels (FS_PDLAED1.F90:84 analogue) ----
    levels2 = int(np.log2(p))
    for t in range(levels2):
        s = rloc * (1 << t)          # child block width
        gsz = 1 << (t + 1)           # shards per merged block
        within = r % gsz
        gid = r // gsz
        left = within < (gsz >> 1)
        half_off = jnp.where(left, 0, s)
        cutp = gid * (2 * s) + s     # global boundary coordinate
        rho = jnp.abs(e_pad[cutp - 1])
        sgn = jnp.where(e_pad[cutp - 1] >= 0, 1.0, -1.0)

        # --- group-scoped z/d assembly (FS_PDLAEDZ + FS_REDUCE_ZD) ---
        # one leader per half contributes; the butterfly allreduce
        # replicates the assembled (2s,) vectors across the group
        lead = (within == 0) | (within == (gsz >> 1))
        dm_c = lax.dynamic_update_slice(jnp.zeros((2 * s,), wdt), w,
                                        (half_off,))
        dm = grouped_allreduce(jnp.where(lead, dm_c, 0), gsz, px, py)
        z_half = jnp.where(left, row1, sgn * row0)
        z_c = lax.dynamic_update_slice(jnp.zeros((2 * s,), wdt), z_half,
                                       (half_off,))
        z = grouped_allreduce(jnp.where(lead, z_c, 0), gsz, px, py)

        # --- secular solve, replicated within the group (FS_PDLAED3) ---
        if 2 * s >= chunk_min:
            # memory-scalable top of tree: C produced in column panels and
            # GEMMed immediately — per-device transient O(2s·panel), never
            # O((2s)²) (the FS_PDLAED3 pipelined-DGEMM analogue,
            # src/FS_PDLAED3.F90:646-765)
            lam, q_loc, rows2 = rank1_merge_apply(
                dm, z, rho, q_loc, jnp.stack([row0, row1]), half_off, s,
                n_iter=n_iter, work_dtype=wdt, panel=chunk_panel)
        else:
            core = rank1_merge_core(dm, z, rho, n_iter=n_iter,
                                    work_dtype=wdt)
            c_uns = jnp.zeros_like(core.c).at[core.perm, :].set(core.c)
            # --- eigenvector GEMM: my rows × my child's C row-slice ---
            c_slice = lax.dynamic_slice(c_uns, (half_off, 0), (s, 2 * s))
            q_loc = q_loc @ c_slice.astype(vec_dtype)
            # --- boundary rows of the merged block ---
            rows2 = jnp.stack([row0, row1]) @ c_slice  # (2, 2s) in wdt
            lam = core.lam

        # --- boundary rows of the merged block, re-replicated ---
        row0 = grouped_allreduce(
            jnp.where(within == 0, rows2[0], 0), gsz, px, py
        )
        row1 = grouped_allreduce(
            jnp.where(within == gsz - 1, rows2[1], 0), gsz, px, py
        )
        w = lam

    return w, q_loc


def comm_model_dc(n_pad: int, p: int, wdt_itemsize: int,
                  vec_itemsize: int):
    """CommStats for one distributed-tree run: phase-2 group butterflies
    (z, d, two boundary rows — FS_REDUCE_ZD traffic) plus the final
    embed/reshard all-to-all (dc_redist analogue)."""
    from eigenexa_tpu.parallel.collectives import CommStats

    st = CommStats()
    if p > 1 and _is_pow2(p):
        rloc = 0
        levels2 = int(np.log2(p))
        for t in range(levels2):
            gsz = 1 << (t + 1)
            width = (n_pad // p) * (1 << (t + 1))
            steps = int(np.log2(gsz))
            st.record("reduce", 4 * width * wdt_itemsize * steps, 4 * steps)
    st.record("redist", n_pad * n_pad * vec_itemsize, 1)
    return st


def _prepare_tree(d, e, n_pad: int, leaf: int, wdt):
    """Padding + Cuppen cut modification, shared convention with
    dc_tree._solve_tridiag_fused (scale-relative pad ramp, |e| subtracted
    at both sides of every cut)."""
    n = d.shape[0]
    d = d.astype(wdt)
    e = e.astype(wdt)
    span = jnp.max(jnp.abs(d)) + (jnp.max(jnp.abs(e)) if n > 1 else 0.0)
    base = jnp.maximum(span, jnp.finfo(wdt).tiny)
    d_pad = jnp.concatenate(
        [d, 2.0 * base + (base / n_pad) * jnp.arange(n_pad - n, dtype=wdt)]
    )
    e_pad = jnp.concatenate([e, jnp.zeros((n_pad - n + 1,), wdt)])
    cuts = np.arange(leaf, n_pad, leaf)
    rho_all = jnp.abs(e_pad[cuts - 1])
    d_mod = d_pad.at[cuts - 1].add(-rho_all).at[cuts].add(-rho_all)
    return d_mod, e_pad


def solve_tridiag_dist(
    d: jnp.ndarray,
    e: jnp.ndarray,
    mesh: Mesh,
    big_n: int,
    vec_dtype,
    leaf: int = 0,
    n_iter: int = 0,
    chunk_min: int = _CHUNK_MIN_WIDTH,
    chunk_panel: int = _CHUNK_PANEL,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed T = S·diag(w)·Sᵀ with S laid out for the distributed
    back-transform.

    Returns (w (n,) replicated, s_pad (big_n, big_n) sharded P('x','y'))
    with S in rows/cols [:n] and zero padding elsewhere — the embed +
    reshard is the dc_redist / FS2eigen_PDLASRT analogue, lowered by XLA
    to one all-to-all.
    """
    n = d.shape[0]
    px, py = mesh_shape(mesh)
    p = px * py

    on_cpu = jax.default_backend() == "cpu"
    f32_vecs = jnp.dtype(vec_dtype) == jnp.dtype(jnp.float32)
    wdt = (jnp.dtype(jnp.float32) if (not on_cpu and f32_vecs)
           else jax.dtypes.canonicalize_dtype(np.float64))
    if n_iter <= 0:
        n_iter = 16 if wdt == jnp.dtype(jnp.float32) else 40
    if leaf <= 0:
        leaf = 32 if on_cpu else 2
    leaf_kind = "eigh" if on_cpu else "analytic2"
    if leaf_kind == "analytic2":
        leaf = 2

    if not (_is_pow2(p) and _is_pow2(px) and _is_pow2(py)) or p == 1:
        # non-power-of-2 device counts sit out the distributed tree, like
        # FS non-member ranks (src/FS_libs.F90:183-208): replicated solve
        from eigenexa_tpu.solvers.dc_tree import solve_tridiag_dc

        w, s = solve_tridiag_dc(d, e, vec_dtype=vec_dtype, impl="jax")
        s_pad = jnp.zeros((big_n, big_n), vec_dtype).at[:n, :n].set(s)
        s_pad = jax.lax.with_sharding_constraint(
            s_pad, NamedSharding(mesh, P("x", "y"))
        )
        return w, s_pad

    n_pad, _, rloc = _tree_sizes(n, p, leaf)
    d_mod, e_pad = _prepare_tree(d, e, n_pad, leaf, wdt)

    w_full, q = jax.shard_map(
        functools.partial(
            _dc_tree_shard, leaf=leaf, leaf_kind=leaf_kind, n_iter=n_iter,
            work_dtype=wdt, vec_dtype=jnp.dtype(vec_dtype),
            px=px, py=py, rloc=rloc,
            chunk_min=chunk_min, chunk_panel=chunk_panel,
        ),
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P(("x", "y"), None)),
        check_vma=False,
    )(d_mod, e_pad)

    w = w_full[:n]
    s_pad = jnp.zeros((big_n, big_n), vec_dtype).at[:n, :n].set(q[:n, :n])
    s_pad = jax.lax.with_sharding_constraint(
        s_pad, NamedSharding(mesh, P("x", "y"))
    )
    return w, s_pad
