"""Distributed divide & conquer for the reduced PENTADIAGONAL problem.

The rows-pinned distributed twin of solvers/dc_band.py — the missing
piece that made `distributed_eigen_sx`'s reduced solve replicated.
Reference analogue: the banded D&C my_pdlaed0.F:18 (HBW=2 successive
rank-1 merges per join) distributed over the grid, organized like the
FS merge tree (src/FS_PDLAED0.F90:62, src/FS_dividing.F90:22-55).

Design mirrors solvers/dc_dist.py exactly (see its docstring for the
rows-pinned rationale):

* phase 1 — shard-local levels: the batched two-merge level of
  dc_band._merge_level_band2, zero communication;
* phase 2 — group-doubling levels: the ONLY communication is the
  group-scoped butterfly allreduce of the O(s) d / boundary-row-pair
  vectors (grouped_allreduce = the MPI_Group_Allreduce analogue,
  src/MPI_Allreduce_group.F90:644).  Each join runs TWO rank-1 merges;
  both use the column-panelled C application
  (secular.rank1_merge_apply_parts — the FS_PDLAED3 pipelined-DGEMM
  analogue) above `chunk_min` width, so the top of the tree never
  materializes an O((2s)²) transient per device.
* boundary ROW PAIRS (first-two/last-two eigenvector rows per block,
  the band-2 z-vector ingredients) are carried replicated within each
  merge group: they are produced by the same parts-application as the
  eigenvector GEMM, from group-replicated inputs, so no extra
  butterflies are needed after the initial row assembly.

Requires P = 2^k (FS constraint, src/FS_libs.F90:183); other device
counts take the replicated fallback like FS non-member ranks.
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
from eigenexa_tpu.ops.secular import (rank1_merge_apply_parts,
                                      rank1_merge_core)
from eigenexa_tpu.solvers.dc_band import (_cut_vectors_jnp,
                                          _leaf_eigh_band2_jax,
                                          _merge_level_band2)
from eigenexa_tpu.solvers.dc_dist import (_CHUNK_MIN_WIDTH, _CHUNK_PANEL,
                                          _is_pow2, _tree_sizes)


def _dc_band_tree_shard(d_mod, e1_mod, e2_pad, a_all, b_all, c_all,
                        f_all, h_all, *, leaf: int, n_iter: int,
                        work_dtype, vec_dtype, px: int, py: int,
                        rloc: int, chunk_min: int, chunk_panel: int):
    """shard_map body: the full band-2 merge tree for this shard's rows.

    Inputs are (n_pad,)/(n_cuts,) replicated; returns (w (n_pad,)
    replicated, q_loc (rloc, n_pad) — this shard's eigenvector rows).
    """
    p = px * py
    r = lax.axis_index("x") * py + lax.axis_index("y")
    g_off = r * rloc
    wdt = work_dtype

    # ---- leaves (LAPACK_EIGEN2 analogue on device) ----
    nblk = rloc // leaf
    my_d = lax.dynamic_slice(d_mod, (g_off,), (rloc,)).reshape(nblk, leaf)
    i1 = (jnp.arange(nblk)[:, None] * leaf
          + jnp.arange(leaf - 1)[None, :]).reshape(-1)
    my_e1 = e1_mod[g_off + i1].reshape(nblk, leaf - 1)
    i2 = (jnp.arange(nblk)[:, None] * leaf
          + jnp.arange(leaf - 2)[None, :]).reshape(-1)
    my_e2 = e2_pad[g_off + i2].reshape(nblk, leaf - 2)
    w, q = _leaf_eigh_band2_jax(my_d, my_e1, my_e2, wdt)
    rows_lo = q[:, :2, :].astype(wdt)
    rows_hi = q[:, -2:, :].astype(wdt)
    q = q.astype(vec_dtype)

    # ---- phase 1: shard-local two-merge levels (zero communication) ----
    lvl = 0
    while (1 << lvl) < nblk:
        s = leaf * (1 << lvl)
        npair = nblk >> (lvl + 1)
        cut = g_off + s + jnp.arange(npair) * (2 * s)
        ci = (cut // leaf) - 1
        w, q, rows_lo, rows_hi = _merge_level_band2(
            w, q, rows_lo, rows_hi,
            a_all[ci], b_all[ci], c_all[ci], f_all[ci], h_all[ci],
            vec_dtype=vec_dtype, n_iter=n_iter, work_dtype=wdt)
        bsz = w.shape[0]
        rows_lo = rows_lo.reshape(bsz, 2, 2 * s)
        rows_hi = rows_hi.reshape(bsz, 2, 2 * s)
        lvl += 1

    q_loc = q.reshape(rloc, rloc)
    w = w.reshape(rloc)
    rows_lo = rows_lo.reshape(2, rloc)
    rows_hi = rows_hi.reshape(2, rloc)

    # ---- phase 2: group merge levels ----
    levels2 = int(np.log2(p))
    for t in range(levels2):
        s = rloc * (1 << t)
        gsz = 1 << (t + 1)
        within = r % gsz
        gid = r // gsz
        left = within < (gsz >> 1)
        half_off = jnp.where(left, 0, s)
        cutp = gid * (2 * s) + s
        ci = (cutp // leaf) - 1
        ab, bb, cb = a_all[ci], b_all[ci], c_all[ci]
        fb, hb = f_all[ci], h_all[ci]

        # --- group-replicated d and boundary-row-pair assembly ---
        lead = (within == 0) | (within == (gsz >> 1))
        dm_c = lax.dynamic_update_slice(jnp.zeros((2 * s,), wdt), w,
                                        (half_off,))
        dm = grouped_allreduce(jnp.where(lead, dm_c, 0), gsz, px, py)
        zz = jnp.zeros((), half_off.dtype)   # match half_off's int width
        lo_c = lax.dynamic_update_slice(
            jnp.zeros((2, 2 * s), wdt), rows_lo, (zz, half_off))
        lo_all = grouped_allreduce(jnp.where(lead, lo_c, 0), gsz, px, py)
        hi_c = lax.dynamic_update_slice(
            jnp.zeros((2, 2 * s), wdt), rows_hi, (zz, half_off))
        hi_all = grouped_allreduce(jnp.where(lead, hi_c, 0), gsz, px, py)

        coord = jnp.arange(2 * s)
        in_left = coord < s
        # merge 1: u1 = a·δ_{p-2} + b·δ_{p-1} + c·δ_p in pair coords
        # (p = s): rows p-2, p-1 are the LEFT block's last two rows,
        # row p the RIGHT block's first row
        z1 = jnp.where(in_left, ab * hi_all[0] + bb * hi_all[1],
                       cb * lo_all[0])
        one = jnp.ones((), wdt)
        lo_left = lo_all[:, :s]              # left block's first two rows
        hi_right = hi_all[:, s:]             # right block's last two rows
        pm1 = hi_all[1, :s][None, :]         # row p-1 (left's last row)
        pp1 = lo_all[1, s:][None, :]         # row p+1 (right's 2nd row)

        if 2 * s >= chunk_min:
            lam1, (q_loc, lo1, hi1, pm1n, pp1n) = rank1_merge_apply_parts(
                dm, z1, one,
                parts=((q_loc, half_off), (lo_left, 0), (hi_right, s),
                       (pm1, 0), (pp1, s)),
                n_iter=n_iter, work_dtype=wdt, panel=chunk_panel)
            z2 = fb * pm1n[0] + hb * pp1n[0]
            lam2, (q_loc, lo2, hi2) = rank1_merge_apply_parts(
                lam1, z2, one,
                parts=((q_loc, 0), (lo1, 0), (hi1, 0)),
                n_iter=n_iter, work_dtype=wdt, panel=chunk_panel)
        else:
            core1 = rank1_merge_core(dm, z1, one, n_iter=n_iter,
                                     work_dtype=wdt)
            c1 = jnp.zeros_like(core1.c).at[core1.perm, :].set(core1.c)
            q_loc = q_loc @ lax.dynamic_slice(
                c1, (half_off, zz), (s, 2 * s)).astype(vec_dtype)
            lo1 = lo_left @ c1[:s]
            hi1 = hi_right @ c1[s:]
            z2 = fb * (pm1 @ c1[:s])[0] + hb * (pp1 @ c1[s:])[0]
            core2 = rank1_merge_core(core1.lam, z2, one, n_iter=n_iter,
                                     work_dtype=wdt)
            c2 = jnp.zeros_like(core2.c).at[core2.perm, :].set(core2.c)
            q_loc = q_loc @ c2.astype(vec_dtype)
            lo2 = lo1 @ c2
            hi2 = hi1 @ c2
            lam2 = core2.lam

        rows_lo = lo2
        rows_hi = hi2
        w = lam2

    return w, q_loc


def solve_band2_dist(
    d: jnp.ndarray,
    e1: jnp.ndarray,
    e2: jnp.ndarray,
    mesh: Mesh,
    big_n: int,
    vec_dtype,
    leaf: int = 0,
    n_iter: int = 0,
    chunk_min: int = _CHUNK_MIN_WIDTH,
    chunk_panel: int = _CHUNK_PANEL,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed pentadiagonal T = S·diag(w)·Sᵀ with S laid out for the
    distributed back-transform (the band-2 twin of
    dc_dist.solve_tridiag_dist; same embed+reshard contract)."""
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
        leaf = 32
    leaf = max(4, leaf)

    if not (_is_pow2(p) and _is_pow2(px) and _is_pow2(py)) or p == 1:
        # FS non-member behavior: replicated solve (src/FS_libs.F90:183)
        from eigenexa_tpu.solvers.dc_band import solve_band2_dc

        w, s = solve_band2_dc(d, e1, e2, vec_dtype=vec_dtype, impl="jax")
        s_pad = jnp.zeros((big_n, big_n), vec_dtype).at[:n, :n].set(s)
        s_pad = jax.lax.with_sharding_constraint(
            s_pad, NamedSharding(mesh, P("x", "y")))
        return w, s_pad

    n_pad, _, rloc = _tree_sizes(n, p, leaf)
    d_mod, e1_mod, e2_pad, coefs = _prepare_band_tree(
        d, e1, e2, n_pad, leaf, wdt)

    w_full, q = jax.shard_map(
        functools.partial(
            _dc_band_tree_shard, leaf=leaf, n_iter=n_iter,
            work_dtype=wdt, vec_dtype=jnp.dtype(vec_dtype),
            px=px, py=py, rloc=rloc,
            chunk_min=chunk_min, chunk_panel=chunk_panel,
        ),
        mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P(), P(("x", "y"), None)),
        check_vma=False,
    )(d_mod, e1_mod, e2_pad, *coefs)

    w = w_full[:n]
    s_pad = jnp.zeros((big_n, big_n), vec_dtype).at[:n, :n].set(q[:n, :n])
    s_pad = jax.lax.with_sharding_constraint(
        s_pad, NamedSharding(mesh, P("x", "y")))
    return w, s_pad


def _prepare_band_tree(d, e1, e2, n_pad: int, leaf: int, wdt):
    """Padding + the band-2 cut modifications (shared convention with
    dc_band._solve_band2_fused: scale-relative pad ramp; per cut the two
    restore vectors' compensations applied to d and e1)."""
    n = d.shape[0]
    d = d.astype(wdt)
    e1 = e1.astype(wdt)
    e2 = e2.astype(wdt)
    span = (jnp.max(jnp.abs(d))
            + (jnp.max(jnp.abs(e1)) if n > 1 else 0.0)
            + (jnp.max(jnp.abs(e2)) if n > 2 else 0.0))
    base = jnp.maximum(span, jnp.finfo(wdt).tiny)
    d_pad = jnp.concatenate(
        [d, 2.0 * base + (base / n_pad) * jnp.arange(n_pad - n, dtype=wdt)])
    e1_pad = jnp.concatenate([e1, jnp.zeros((n_pad - n + 1,), wdt)])
    e2_pad = jnp.concatenate([e2, jnp.zeros((n_pad - n + 2,), wdt)])
    cuts = jnp.asarray(np.arange(leaf, n_pad, leaf))
    a_all, b_all, c_all, f_all, h_all = _cut_vectors_jnp(
        e1_pad, e2_pad, cuts, wdt)
    d_mod = d_pad
    d_mod = d_mod.at[cuts - 2].add(-a_all * a_all)
    d_mod = d_mod.at[cuts - 1].add(-(b_all * b_all + f_all * f_all))
    d_mod = d_mod.at[cuts].add(-c_all * c_all)
    d_mod = d_mod.at[cuts + 1].add(-h_all * h_all)
    e1_mod = e1_pad.at[cuts - 2].add(-a_all * b_all)
    return d_mod, e1_mod, e2_pad, (a_all, b_all, c_all, f_all, h_all)
