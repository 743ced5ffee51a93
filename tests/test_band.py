"""Band-2 (pentadiagonal) path: reduction, banded D&C, Sturm, eigen_sx.

Mirrors the reference's eigen_sx verification (benchmark ev_test/w_test
on the eigen_sx driver — SURVEY.md §3.3, §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from eigenexa_tpu.ops.band import band2_reduce, assemble_band2
from eigenexa_tpu.ops.sturm import (
    eigvals_bisect_band2,
    sturm_count_band2,
)
from eigenexa_tpu.solvers.dc_band import solve_band2_dc


def _rand_sym(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, n))
    return jnp.asarray((u + u.T) / 2.0)


def _rand_penta(n, seed=1):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal(n)
    e1 = rng.standard_normal(n - 1)
    e2 = rng.standard_normal(n - 2)
    return jnp.asarray(d), jnp.asarray(e1), jnp.asarray(e2)


@pytest.mark.parametrize("n,nb", [(16, 4), (33, 8), (64, 8), (96, 32)])
def test_band2_reduce_similarity(n, nb):
    """Q^T A Q equals the pentadiagonal assembled from (d, e1, e2)."""
    from eigenexa_tpu.solvers.trbak import back_transform

    a = _rand_sym(n)
    res = band2_reduce(a, nb=nb)
    q = back_transform(jnp.eye(n, dtype=a.dtype), res.v, res.tau, nb=16)
    # orthogonality of Q
    qq = np.asarray(q.T @ q) - np.eye(n)
    assert np.abs(qq).max() < 1e-12 * n
    p = np.asarray(q.T @ a @ q)
    p_ref = np.asarray(assemble_band2(res.d, res.e1, res.e2))
    assert np.abs(p - p_ref).max() < 1e-11 * max(
        1.0, np.abs(p_ref).max()
    )
    # entries outside the band really are zero in Q^T A Q
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) > 2
    assert np.abs(p[mask]).max() < 1e-11


def test_band2_reduce_eigvals_preserved():
    n = 48
    a = _rand_sym(n, seed=3)
    res = band2_reduce(a, nb=8)
    p = np.asarray(assemble_band2(res.d, res.e1, res.e2))
    w_a = np.linalg.eigvalsh(np.asarray(a))
    w_p = np.linalg.eigvalsh(p)
    assert np.abs(w_a - w_p).max() < 1e-12 * max(1.0, np.abs(w_a).max())


@pytest.mark.parametrize("n,leaf", [(16, 4), (37, 4), (64, 8), (130, 16)])
def test_solve_band2_dc(n, leaf):
    d, e1, e2 = _rand_penta(n)
    w, s = solve_band2_dc(d, e1, e2, leaf=leaf)
    t = np.asarray(assemble_band2(d, e1, e2))
    w = np.asarray(w)
    s = np.asarray(s)
    w_ref = np.linalg.eigvalsh(t)
    assert np.abs(w - w_ref).max() < 1e-12 * max(1.0, np.abs(w_ref).max())
    resid = np.abs(t @ s - s * w[None, :]).max()
    assert resid < 1e-12 * max(1.0, np.abs(w_ref).max()) * n
    ortho = np.abs(s.T @ s - np.eye(n)).max()
    assert ortho < 1e-13 * n


def test_solve_band2_dc_degenerate():
    """Clustered eigenvalues + zero couplings (deflation paths)."""
    n = 32
    d = jnp.asarray(np.repeat(np.arange(8.0), 4))
    e1 = jnp.zeros((n - 1,)).at[::3].set(1e-3)
    e2 = jnp.zeros((n - 2,)).at[::5].set(2e-3)
    w, s = solve_band2_dc(d, e1, e2, leaf=4)
    t = np.asarray(assemble_band2(d, e1, e2))
    w_ref = np.linalg.eigvalsh(t)
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-12 * 8
    s = np.asarray(s)
    assert np.abs(s.T @ s - np.eye(n)).max() < 1e-13 * n


def test_sturm_count_band2():
    n = 50
    d, e1, e2 = _rand_penta(n, seed=7)
    t = np.asarray(assemble_band2(d, e1, e2))
    w_ref = np.linalg.eigvalsh(t)
    probes = jnp.asarray(
        np.concatenate([[w_ref[0] - 1.0], 0.5 * (w_ref[:-1] + w_ref[1:]),
                        [w_ref[-1] + 1.0]])
    )
    cnt = np.asarray(sturm_count_band2(d, e1, e2, probes))
    assert (cnt == np.arange(n + 1)).all()


def test_eigvals_bisect_band2():
    n = 40
    d, e1, e2 = _rand_penta(n, seed=11)
    t = np.asarray(assemble_band2(d, e1, e2))
    w_ref = np.linalg.eigvalsh(t)
    w = np.asarray(eigvals_bisect_band2(d, e1, e2))
    assert np.abs(w - w_ref).max() < 1e-10 * max(1.0, np.abs(w_ref).max())


@pytest.mark.parametrize("mode", ["A", "N", "X", "T", "S", "C"])
def test_eigen_sx_modes(mode):
    """eigen_sx end to end in all driver modes (reference:
    benchmark/main2.f:243-258 mode letters for the sx solver)."""
    import eigenexa_tpu as ex
    from eigenexa_tpu.testing.checks import (
        orthogonality_check,
        residual_check,
    )

    n = 96
    a = _rand_sym(n, seed=13).astype(jnp.float64)
    w, z, info = ex.eigen_sx(a, mode=mode)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    if mode in ("A", "X", "T"):
        assert np.abs(np.asarray(w) - w_ref).max() < 1e-11
    if mode == "N":
        assert np.abs(np.asarray(w) - w_ref).max() < 1e-9
        assert z is None
    if mode in ("A", "X"):
        r = residual_check(a, z, w)
        o = orthogonality_check(z)
        assert r.passed, r
        assert o.passed, o
    if mode == "S":
        # Z = Q: orthogonal, and Q^T A Q pentadiagonal
        o = orthogonality_check(z)
        assert o.passed, o


def test_eigen_sx_matches_eigen_s():
    import eigenexa_tpu as ex

    n = 80
    a = _rand_sym(n, seed=17).astype(jnp.float64)
    w_sx, z_sx, _ = ex.eigen_sx(a)
    w_s, z_s, _ = ex.eigen_s(a)
    assert np.abs(np.asarray(w_sx) - np.asarray(w_s)).max() < 1e-11


def test_band2_dc_impl_equivalence():
    """jax (fused/jitted) and host implementations must both satisfy the
    reference thresholds and agree on eigenvalues (reference: the HBW=2
    two-merge scheme of my_pdlaed0.F:18)."""
    import numpy as np

    from eigenexa_tpu.solvers.dc_band import solve_band2_dc

    rng = np.random.default_rng(0)
    n = 150
    d = jnp.asarray(rng.standard_normal(n) * 3)
    e1 = jnp.asarray(rng.standard_normal(n - 1))
    e2 = jnp.asarray(rng.standard_normal(n - 2))
    t = (np.diag(np.asarray(d))
         + np.diag(np.asarray(e1), 1) + np.diag(np.asarray(e1), -1)
         + np.diag(np.asarray(e2), 2) + np.diag(np.asarray(e2), -2))
    wref = np.linalg.eigvalsh(t)
    for impl in ("jax", "host"):
        w, s = solve_band2_dc(d, e1, e2, leaf=16, impl=impl)
        sn = np.asarray(s)
        assert np.max(np.abs(np.asarray(w) - wref)) < 1e-11 * n, impl
        assert np.linalg.norm(t @ sn - sn * np.asarray(w)[None, :]) \
            < 1e-11 * n, impl
        assert np.linalg.norm(sn.T @ sn - np.eye(n)) < 1e-12 * n, impl


def test_band2_level_impl_matches_fused():
    """The eager per-level band-2 orchestration (impl='level', the
    large-n TPU path) and its panel-chunked top merges must reproduce the
    fused two-merge tree."""
    from eigenexa_tpu.solvers import dc_band

    rng = np.random.default_rng(14)
    n = 200
    d = jnp.asarray(rng.standard_normal(n))
    e1 = jnp.asarray(rng.standard_normal(n - 1))
    e2 = jnp.asarray(rng.standard_normal(n - 2))
    w_ref, s_ref = dc_band.solve_band2_dc(d, e1, e2, impl="jax")
    w_lvl, s_lvl = dc_band.solve_band2_dc(d, e1, e2, impl="level")
    np.testing.assert_allclose(np.asarray(w_lvl), np.asarray(w_ref),
                               atol=1e-13, rtol=0)
    old_min, old_pan = dc_band._LEVEL_CHUNK_MIN, dc_band._LEVEL_CHUNK_PANEL
    try:
        dc_band._LEVEL_CHUNK_MIN, dc_band._LEVEL_CHUNK_PANEL = 64, 32
        w_ch, s_ch = dc_band.solve_band2_dc(d, e1, e2, impl="level")
    finally:
        dc_band._LEVEL_CHUNK_MIN = old_min
        dc_band._LEVEL_CHUNK_PANEL = old_pan
    np.testing.assert_allclose(np.asarray(w_ch), np.asarray(w_ref),
                               atol=1e-13, rtol=0)
    assert float(jnp.max(jnp.abs(jnp.abs(s_ch) - jnp.abs(s_ref)))) < 1e-12
