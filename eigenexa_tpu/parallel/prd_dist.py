"""Distributed band-2 (pentadiagonal) reduction — the PRD on the mesh.

The shard_map realization of the reference's distributed
penta-diagonalization, the MBAND=2 twin of trd_dist.trd_panel_shard:

* pair recurrence with per-pair row/column collectives
  (reference: src/eigen_prd.F:341 panel loop processing MBAND=2 columns
  per step `eigen_prd.F:424`; src/eigen_prd_t4x.F:83 two-column
  reflector generation);
* the TWO-VECTOR mat-vec: both reflectors of a pair go through ONE pass
  over the trailing matrix, and their row→column redistribution is a
  single two-vector datacast (reference: eigen_prd_au PDSYMV2,
  src/eigen_prd_t2.F:90, and datacast_dbl2, src/comm.F:1569 — the
  whole reason the penta path halves the reduction's matrix traffic);
* rank-2nb trailing update from row- and column-replicated panels
  (reference: src/eigen_t1.F:68, shared with TRD).

Layout contract matches trd_panel_shard: block-sharded ('x','y') matrix,
full-matrix masked updates (processed rows/cols are structurally zero in
U/W), every collective through parallel/collectives.py.  The driver must
pad so that m_x and m_y are even (pairs never straddle a shard
boundary) — parallel/distributed.py pads to lcm(2·px, 2·py, nb).

Band extraction: the three bands are read off the FINAL updated matrix —
a similarity transform with reflectors whose support starts two rows
below an already-produced band entry preserves it exactly (same argument
as ops/band._extract_band, made at the end instead of per panel).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from eigenexa_tpu.parallel.collectives import (
    bcast_from_owner,
    datacast_block,
    psum_grid,
    psum_x,
    psum_y,
)
from eigenexa_tpu.parallel.trd_dist import _dist_householder


def prd_panel_shard(a_loc, nb: int):
    """shard_map body: band-2 reduce the (padded) block-sharded matrix.

    a_loc: (m_x, m_y) local block of the N×N matrix (N = m_x·px = m_y·py,
    m_x and m_y even, nb even).  Returns (d (N,), e1 (N,), e2 (N,),
    tau (N,) — replicated; v_loc (m_x, N) — this shard's reflector rows,
    column k holding the reflector that zeroes A[k+3:, k] with pivot row
    k+2, the MBAND=2 storage convention of ops/band.BandResult).
    """
    px = lax.axis_size("x")
    py = lax.axis_size("y")
    ix = lax.axis_index("x")
    iy = lax.axis_index("y")
    m_x, m_y = a_loc.shape
    n_tot = m_x * px
    dtype = a_loc.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    g_x = ix * m_x + jnp.arange(m_x)
    row0_x = ix * m_x
    col0_y = iy * m_y

    def pair_body(j, st):
        a_cur, u_p, w_p, tau_all, ps = st
        c0 = ps + 2 * j
        # --- columns c0, c0+1 bcast from their y-owner (both live on one
        #     shard: m_y is even and c0 is even) — the bcastw_dbl
        #     two-vector bcast (src/comm.F:1065) ---
        own_y = (c0 >= col0_y) & (c0 < col0_y + m_y)
        c_ly = jnp.clip(c0 - col0_y, 0, m_y - 2)
        cols_loc = lax.dynamic_slice(a_cur, (0, c_ly), (m_x, 2))
        cols = bcast_from_owner(cols_loc, own_y, "y")
        # --- rows c0, c0+1 of U/W from the x-owner (m_x even) ---
        own_x = (c0 >= row0_x) & (c0 < row0_x + m_x)
        c_lx = jnp.clip(c0 - row0_x, 0, m_x - 2)
        uw_rows = bcast_from_owner(
            jnp.concatenate(
                [lax.dynamic_slice(u_p, (c_lx, 0), (2, nb)),
                 lax.dynamic_slice(w_p, (c_lx, 0), (2, nb))], axis=1),
            own_x, "x")                      # (2, 2nb)
        u_rows = uw_rows[:, :nb]
        w_rows = uw_rows[:, nb:]
        cols = cols - u_p @ jnp.conj(w_rows).T - w_p @ jnp.conj(u_rows).T

        # --- two reflectors, TSQR-style (eigen_prd_compute_u,
        #     src/eigen_prd_t4x.F:83): CholeskyQR2 Gram orthogonalization
        #     of the pair + analytic H0 application — see
        #     ops/band.pair_reflectors for the numerical argument ---
        mask0 = g_x > c0 + 1
        a0 = jnp.where(mask0, cols[:, 0], 0)
        a1 = jnp.where(mask0, cols[:, 1], 0)
        t11 = psum_x(jnp.sum(jnp.real(jnp.conj(a0) * a0)))
        safe_t11 = jnp.where(t11 > 0, t11, 1.0)
        for _ in range(2):            # CholeskyQR2: twice is enough
            s12 = psum_x(jnp.sum(jnp.conj(a0) * a1)) / safe_t11
            a1 = a1 - jnp.where(t11 > 0, s12, 0.0 * s12) * a0
        v0, tau0, beta0 = _dist_householder(a0, g_x, c0 + 2)
        piv = psum_x(jnp.stack([
            jnp.sum(jnp.where(g_x == c0 + 2, a0, 0)),
            jnp.sum(jnp.where(g_x == c0 + 2, a1, 0))]))
        # v0ᴴ·a1 = −β0·a1[p0]/conj(α0−β0) by pair orthogonality (the
        # reference's s = sgm(2)·u_t(5)/bet(2) fix-up, eigen_prd_t4x.F:305)
        denom0 = jnp.where(tau0 != 0, piv[0] - beta0.astype(dtype), 1.0)
        vha1 = -beta0.astype(dtype) * piv[1] / jnp.conj(denom0)
        c1 = a1 - jnp.conj(tau0) * vha1 * v0
        v1, tau1, _ = _dist_householder(c1, g_x, c0 + 3)
        v_pair = jnp.stack([v0, v1], axis=1)          # (m_x, 2)
        v01 = psum_x(jnp.sum(jnp.conj(v0) * v1))
        t01 = -tau0 * tau1 * v01
        t = jnp.array([[1.0, 0.0], [0.0, 0.0]], dtype) * tau0 \
            + jnp.array([[0.0, 0.0], [0.0, 1.0]], dtype) * tau1 \
            + jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype) * t01

        # --- av = A·[v0 v1]: ONE pass over the trailing matrix for both
        #     vectors (PDSYMV2) after ONE two-vector datacast
        #     (datacast_dbl2, src/comm.F:1569) ---
        v_y = datacast_block(v_pair, "x", "y", m_y)   # (m_y, 2)
        av = psum_y(a_cur @ v_y)
        av = jnp.where((g_x >= ps)[:, None], av, 0)
        # panel corrections, inner products reduced along x
        cuv = psum_x(jnp.concatenate(
            [jnp.conj(u_p.T) @ v_pair, jnp.conj(w_p.T) @ v_pair], axis=0))
        av = av - u_p @ cuv[nb:] - w_p @ cuv[:nb]
        p = av @ t
        # S = Tᴴ Vᴴ P (2×2), reduced along x; W = P − ½·V·S
        # (the 2×2 coupling matrix, src/eigen_prd.F:363)
        s = jnp.conj(t).T @ psum_x(jnp.conj(v_pair).T @ p)
        w_pair = p - 0.5 * v_pair @ s
        w_pair = jnp.where((g_x >= ps)[:, None], w_pair, 0)

        u_p = lax.dynamic_update_slice(u_p, v_pair, (0, 2 * j))
        w_p = lax.dynamic_update_slice(w_p, w_pair, (0, 2 * j))
        tau_all = lax.dynamic_update_slice(
            tau_all, jnp.stack([tau0, tau1]), (c0,))
        return a_cur, u_p, w_p, tau_all, ps

    def panel_step(carry, ps):
        a_cur, v_loc, tau_all = carry
        u_p = lax.pcast(jnp.zeros((m_x, nb), dtype), ("x",), to="varying")
        w_p = lax.pcast(jnp.zeros((m_x, nb), dtype), ("x",), to="varying")
        _, u_p, w_p, tau_all, _ = lax.fori_loop(
            0, nb // 2, pair_body, (a_cur, u_p, w_p, tau_all, ps)
        )
        u_y = datacast_block(u_p, "x", "y", m_y)
        w_y = datacast_block(w_p, "x", "y", m_y)
        a_new = a_cur - u_p @ jnp.conj(w_y.T) - w_p @ jnp.conj(u_y.T)
        v_loc = lax.dynamic_update_slice(v_loc, u_p, (0, ps))
        return (a_new, v_loc, tau_all), None

    n_panels = n_tot // nb
    ps_arr = jnp.arange(n_panels) * nb
    carry0 = (
        a_loc,
        lax.pcast(jnp.zeros((m_x, n_tot), dtype), ("x",), to="varying"),
        jnp.zeros((n_tot,), dtype),
    )
    (a_fin, v_loc, tau_all), _ = lax.scan(panel_step, carry0, ps_arr)

    # --- band extraction from the final matrix (diag + two sub-diags);
    #     each entry lives on exactly one shard — assemble by grid psum
    #     (eigen_prd_final analogue, src/eigen_prd_t8.F) ---
    def band(off):
        own = (g_x - off >= col0_y) & (g_x - off < col0_y + m_y) & \
            (g_x >= off)
        c_loc = jnp.clip(g_x - off - col0_y, 0, m_y - 1)
        vals = jnp.take_along_axis(a_fin, c_loc[:, None], axis=1)[:, 0]
        picked = jnp.where(own, jnp.real(vals), 0)
        return psum_grid(jnp.zeros((n_tot,), rdtype).at[g_x].add(picked))

    d = band(0)
    e1 = band(1)    # e1[i] = A[i, i-1] for i ≥ 1, i.e. e1 shifted by one
    e2 = band(2)
    # shift to the (d, e1, e2) convention of ops/band.BandResult:
    # e1[k] = T[k+1, k], e2[k] = T[k+2, k]
    e1 = jnp.concatenate([e1[1:], jnp.zeros((1,), rdtype)])
    e2 = jnp.concatenate([e2[2:], jnp.zeros((2,), rdtype)])
    return d, e1, e2, tau_all, v_loc


def comm_model_prd(n_pad: int, nb: int, px: int, py: int, itemsize: int):
    """CommStats for one prd_panel_shard run — every collective in the
    pair recurrence × its trip count (the COMM_STAT accounting of
    src/eigen_devel.F:98-117).  Half the per-column collective count of
    the tridiagonal path: one round of collectives serves TWO columns."""
    from eigenexa_tpu.parallel.collectives import CommStats

    st = CommStats()
    m_x = n_pad // px
    pairs = n_pad // 2
    panels = n_pad // nb
    # per pair: 2-col bcast (y), uw-rows bcast (x), Gram/CQR2 + pivot
    # scalar reduces (t11, 2×s12, 2-elem pivots), 2-vector datacast,
    # av reduce (y), cuv reduce (x), s reduce (x)
    st.record("bcast", pairs * 2 * (m_x + 2 * nb) * itemsize, 2 * pairs)
    st.record("reduce", pairs * (6 + 2 * m_x + 4 * nb + 4) * itemsize,
              8 * pairs)
    st.record("redist", pairs * 2 * n_pad * itemsize, pairs)
    # per panel: U/W panel datacasts
    st.record("redist", panels * 2 * n_pad * nb * itemsize, 2 * panels)
    # final three band assemblies
    st.record("reduce", 3 * n_pad * itemsize, 3)
    return st
