"""Distributed blocked Householder tridiagonalization + WY back-transform.

The shard_map realization of the reference's 2D-grid TRD pipeline:

* panel recurrence with per-column row/column collectives
  (reference: src/eigen_trd.F:349 panel loop; src/eigen_trd_t4.F:81
  compute_u norm reductions; src/eigen_trd_t2.F:161 distributed symv with
  reductions along x and y plus the ``datacast`` row↔column transpose,
  src/comm.F:1377);
* rank-2nb trailing update from row- and column-replicated panels
  (reference: src/eigen_t1.F:68);
* WY back-transform with x-axis reductions of the VᵀZ inner products
  (reference: src/trbakwy4_body.F:573-625,721 and the reduce_dbl calls at
  :235,287).

Layout (deliberate TPU-first difference): the reference uses cyclic(1) so
the *shrinking* trailing window stays load-balanced across MPI ranks.  Here
the matrix is **block**-sharded over the ('x','y') mesh and every panel
applies a *full-matrix masked* update: U rows ≤ k and W rows < panel-start
are structurally zero, so processed rows/columns are never touched, every
shard does identical dense MXU work each panel (perfect balance), and no
cyclic index algebra is needed.  The cost is ~3× the 4/3·n³ reference flop
model in trailing-update GEMMs — flops are the cheap resource on the MXU;
the per-column latency (collectives) and HBM traffic are what this design
minimizes.  All collectives go through parallel/collectives.py, mirroring
how every kernel in the reference communicates only via comm_mod.

Everything here runs INSIDE ``jax.shard_map`` over a mesh with axes
('x','y'); the driver in parallel/distributed.py does the padding,
sharding, and stage composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from eigenexa_tpu.parallel.collectives import (
    bcast_from_owner,
    datacast_block,
    pmax,
    psum_grid,
    psum_x,
    psum_y,
)


def _dist_householder(col, g_x, pivot):
    """Householder reflector of a column sharded along 'x'.

    col: (m_x,) local rows of the current column; g_x global row indices;
    `pivot` the (traced) global pivot row — k+1 for the tridiagonal
    reduction, k+2/k+3 for the two reflectors of a band-2 pair.  The tail
    is rows > pivot.  Returns (v local shard, tau, beta) with tau/beta
    replicated — the distributed twin of ops.householder.householder_vector
    (reference: eigen_trd_compute_u, src/eigen_trd_t4.F:81: local partial
    norms + reduce along the column communicator).
    """
    dtype = col.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    own_piv = g_x == pivot
    alpha = psum_x(jnp.sum(jnp.where(own_piv, col, 0)))
    tail_mask = g_x > pivot
    tail = jnp.where(tail_mask, col, 0)
    scale = jnp.maximum(
        pmax(jnp.max(jnp.abs(tail)), "x"), jnp.finfo(rdtype).tiny
    )
    xnorm = jnp.sqrt(psum_x(jnp.sum(jnp.abs(tail / scale) ** 2))) * scale
    alphr = jnp.real(alpha)
    alphi = jnp.imag(alpha)
    mag = jnp.sqrt(alphr * alphr + alphi * alphi + xnorm * xnorm)
    beta = jnp.where(alphr >= 0, -mag, mag)
    active = (xnorm > 0) | (alphi != 0)
    safe_beta = jnp.where(active, beta, jnp.asarray(1.0, rdtype))
    tau = jnp.where(
        active, (safe_beta.astype(dtype) - alpha) / safe_beta, 0.0
    ).astype(dtype)
    denom = jnp.where(active, alpha - safe_beta.astype(dtype), 1.0)
    v = jnp.where(tail_mask, col / denom, 0.0)
    v = jnp.where(own_piv, jnp.where(active, 1.0, 0.0).astype(dtype), v)
    beta_out = jnp.where(active, beta, alphr)
    return v.astype(dtype), tau, beta_out.astype(rdtype)


def trd_panel_shard(a_loc, nb: int):
    """shard_map body: tridiagonalize the (padded) block-sharded matrix.

    a_loc: (m_x, m_y) local block of the N×N matrix (N = m_x·px = m_y·py).
    Returns (d (N,), e (N,), tau (N,) — replicated; v_loc (m_x, N) — the
    Householder panel rows owned by this shard).

    One ``lax.scan`` over panels; inside, a ``fori_loop`` over the nb
    columns with the reference's per-column communication pattern:
    column bcast along y → row bcast of panel rows along x → reductions of
    Householder norms along x → datacast of v to the column layout →
    symv partial sums reduced along y → coupling reductions along x.
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

    def col_body(j, st):
        # a_cur is threaded through the loop state (NOT closed over): it is
        # the scan carry, frozen within a panel but updated between panels
        a_cur, u_p, w_p, tau_all, e_all, ps = st
        k = ps + j
        # --- column k of A, bcast from its y-owner (src/comm.F:726) ---
        own_y = (k >= col0_y) & (k < col0_y + m_y)
        k_ly = jnp.clip(k - col0_y, 0, m_y - 1)
        col_loc = lax.dynamic_index_in_dim(a_cur, k_ly, axis=1,
                                           keepdims=False)
        col = bcast_from_owner(col_loc, own_y, "y")
        # --- rows k of the U/W panels, bcast from the x-owner ---
        own_x = (k >= row0_x) & (k < row0_x + m_x)
        k_lx = jnp.clip(k - row0_x, 0, m_x - 1)
        uw_row = bcast_from_owner(
            jnp.concatenate([u_p[k_lx], w_p[k_lx]]), own_x, "x"
        )
        # in-panel rank-2 corrections (eigen_trd_local_2update analogue,
        # src/eigen_trd_t5.F:71)
        col = col - u_p @ jnp.conj(uw_row[nb:]) - w_p @ jnp.conj(uw_row[:nb])
        v, tau, beta = _dist_householder(col, g_x, k + 1)
        # --- datacast v (x-layout) -> v_y (y-layout), src/comm.F:1377 ---
        v_y = datacast_block(v, "x", "y", m_y)
        # --- q = A·v: local GEMV + reduce along y (eigen_trd_au,
        #     src/eigen_trd_t2.F:161) ---
        q = psum_y(a_cur @ v_y)
        q = jnp.where(g_x >= ps, q, 0)
        # panel corrections: q -= U·(Wᴴv) + W·(Uᴴv), inner products reduced
        # along x (eigen_trd_compute_v couplings, src/eigen_trd_t6_3.F:85)
        cuv = psum_x(
            jnp.concatenate([jnp.conj(u_p.T) @ v, jnp.conj(w_p.T) @ v])
        )
        q = q - u_p @ cuv[nb:] - w_p @ cuv[:nb]
        vq = psum_x(jnp.sum(jnp.conj(v) * q))
        w = tau * q - (tau * jnp.conj(tau) * 0.5) * vq * v
        u_p = lax.dynamic_update_index_in_dim(u_p, v, j, axis=1)
        w_p = lax.dynamic_update_index_in_dim(w_p, w, j, axis=1)
        tau_all = tau_all.at[k].set(tau)
        e_all = e_all.at[k].set(beta)
        return a_cur, u_p, w_p, tau_all, e_all, ps

    def panel_step(carry, ps):
        a_cur, v_loc, tau_all, e_all = carry
        # initial panels are written with 'x'-varying columns inside the
        # loop; mark them varying up front so the carry types match
        u_p = lax.pcast(jnp.zeros((m_x, nb), dtype), ("x",), to="varying")
        w_p = lax.pcast(jnp.zeros((m_x, nb), dtype), ("x",), to="varying")
        _, u_p, w_p, tau_all, e_all, _ = lax.fori_loop(
            0, nb, col_body, (a_cur, u_p, w_p, tau_all, e_all, ps)
        )
        # rank-2nb trailing update from row- and column-replicated panels
        # (eigen_common_2update, src/eigen_t1.F:68); the column copies are
        # one datacast each (the reference's bcastw_dbl of the panel)
        u_y = datacast_block(u_p, "x", "y", m_y)
        w_y = datacast_block(w_p, "x", "y", m_y)
        a_new = a_cur - u_p @ jnp.conj(w_y.T) - w_p @ jnp.conj(u_y.T)
        v_loc = lax.dynamic_update_slice(v_loc, u_p, (0, ps))
        return (a_new, v_loc, tau_all, e_all), None

    n_panels = n_tot // nb
    ps_arr = jnp.arange(n_panels) * nb
    carry0 = (
        a_loc,
        lax.pcast(jnp.zeros((m_x, n_tot), dtype), ("x",), to="varying"),
        jnp.zeros((n_tot,), dtype),
        jnp.zeros((n_tot,), rdtype),
    )
    (a_fin, v_loc, tau_all, e_all), _ = lax.scan(panel_step, carry0, ps_arr)

    # d = diag of the fully-updated matrix (eigen_trd_final analogue,
    # src/eigen_trd_t8.F:167): each diagonal element lives on exactly one
    # shard; a grid psum assembles the replicated vector.
    own_col = (g_x >= col0_y) & (g_x < col0_y + m_y)
    c_loc = jnp.clip(g_x - col0_y, 0, m_y - 1)
    vals = jnp.take_along_axis(a_fin, c_loc[:, None], axis=1)[:, 0]
    diag_vals = jnp.where(own_col, jnp.real(vals), 0)
    d = psum_grid(jnp.zeros((n_tot,), rdtype).at[g_x].add(diag_vals))
    return d, e_all, tau_all, v_loc


def comm_model_trd(n_pad: int, nb: int, px: int, py: int,
                   itemsize: int):
    """CommStats for one trd_panel_shard run — every collective in the
    panel recurrence × its trip count (the COMM_STAT accounting the
    reference accumulates at each comm.F call site,
    src/eigen_devel.F:98-117)."""
    from eigenexa_tpu.parallel.collectives import CommStats

    st = CommStats()
    m_x = n_pad // px
    m_y = n_pad // py
    cols = n_pad
    panels = n_pad // nb
    # per column: col bcast (y), uw-row bcast (x), 3 scalar reduces,
    # v datacast, q reduce (y), cuv reduce (x), vq reduce (x)
    st.record("bcast", cols * (m_x + 2 * nb) * itemsize, 2 * cols)
    st.record("reduce", cols * (3 + m_x + 2 * nb + 1) * itemsize, 4 * cols)
    st.record("redist", cols * n_pad * itemsize, cols)
    # per panel: U/W panel datacasts
    st.record("redist", panels * 2 * n_pad * nb * itemsize, 2 * panels)
    # final diagonal assembly
    st.record("reduce", n_pad * itemsize, 1)
    return st


def comm_model_trbak(n_pad: int, nvec_loc: int, nb: int, itemsize: int):
    """CommStats for one trbak_shard run (the reduce_dbl traffic of
    src/trbakwy4_body.F:235,287)."""
    from eigenexa_tpu.parallel.collectives import CommStats

    st = CommStats()
    blocks = max((n_pad - 1 + nb - 1) // nb, 0)
    st.record("reduce", blocks * (nb * nb + nb * nvec_loc) * itemsize,
              2 * blocks)
    return st


def trbak_shard(z_loc, v_loc, tau, nb: int):
    """shard_map body: WY back-transform Z ← Q·Z on the mesh.

    z_loc: (m_x, nvec_y) block of Z (rows over 'x', cols over 'y');
    v_loc: (m_x, N) local reflector rows; tau: (N,) replicated.
    Per reflector block: Gram + VᴴZ inner products reduced along 'x'
    (reference: the reduce_dbl calls in src/trbakwy4_body.F:235,287), then
    a local MXU GEMM — the reference's bcast of the V panel is free here
    because every shard already owns its rows of V.

    Full-width blocks run under ONE ``lax.scan`` (every block already
    touches all m_x local rows, so the scan body has fixed shapes and
    costs no extra flops); only the remainder block is peeled.  Compile
    size is therefore independent of n/nb — required for n ≥ 16k traces.
    """
    from eigenexa_tpu.ops.householder import wy_t_from_gram

    n_tot = v_loc.shape[1]

    def apply_block(z_loc, vb, tb):
        gram = psum_x(jnp.conj(vb.T) @ vb)
        t = wy_t_from_gram(gram, tb)
        s = psum_x(jnp.conj(vb.T) @ z_loc)
        return z_loc - vb @ (t @ s)

    nfull = max(n_tot - 1, 0) // nb
    k_rem = nfull * nb
    b_rem = max(n_tot - 1 - k_rem, 0)
    if b_rem > 0:                       # remainder applies first (reverse)
        z_loc = apply_block(
            z_loc,
            lax.slice_in_dim(v_loc, k_rem, k_rem + b_rem, axis=1),
            lax.slice_in_dim(tau, k_rem, k_rem + b_rem),
        )
    if nfull == 0:
        return z_loc

    def body(z_loc, k):
        vb = lax.dynamic_slice(
            v_loc, (jnp.int32(0), k), (v_loc.shape[0], nb))
        tb = lax.dynamic_slice(tau, (k,), (nb,))
        return apply_block(z_loc, vb, tb), None

    ks = jnp.arange(nfull - 1, -1, -1, dtype=jnp.int32) * nb
    z_loc, _ = lax.scan(body, z_loc, ks)
    return z_loc
