"""Tree D&C vs scipy/dense oracle (reference acceptance thresholds)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from eigenexa_tpu.solvers.dc_tree import solve_tridiag_dc
from eigenexa_tpu.testing import checks


def _tridiag(d, e):
    return np.diag(d) + np.diag(e, 1) + np.diag(e, -1)


def _check(d, e, leaf=8, vec_dtype=None, n_iter=40):
    w, s = solve_tridiag_dc(
        jnp.asarray(d), jnp.asarray(e), leaf=leaf, vec_dtype=vec_dtype,
        n_iter=n_iter
    )
    w, s = np.asarray(w), np.asarray(s)
    t = _tridiag(d, e)
    w_ref = scipy.linalg.eigvalsh_tridiagonal(d, e)
    n = len(d)
    scale = max(np.abs(w_ref).max(), 1.0)
    np.testing.assert_allclose(w, w_ref, atol=5e-14 * scale, rtol=1e-12)
    tj = jnp.asarray(t, dtype=s.dtype)
    r = checks.residual_check(tj, jnp.asarray(s), jnp.asarray(w, dtype=s.dtype))
    o = checks.orthogonality_check(jnp.asarray(s))
    assert r.passed, (n, r)
    assert o.passed, (n, o)


@pytest.mark.parametrize("n", [4, 8, 16, 31, 33, 64, 100])
def test_random_tridiag(n):
    rng = np.random.RandomState(n)
    _check(rng.randn(n), rng.randn(n - 1))


def test_leaf_larger_than_n():
    rng = np.random.RandomState(0)
    _check(rng.randn(12), rng.randn(11), leaf=32)


def test_zero_couplings():
    # decoupled blocks: heavy deflation path
    rng = np.random.RandomState(1)
    n = 32
    e = rng.randn(n - 1)
    e[7] = 0.0
    e[15] = 0.0
    e[16] = 0.0
    _check(rng.randn(n), e)


def test_degenerate_eigenvalues():
    # multiplicity clusters -> exercises close-d run rotation
    n = 48
    d = np.repeat(np.array([1.0, 2.0, 3.0]), n // 3)
    e = np.full(n - 1, 1e-3)
    _check(d, e)


def test_exact_duplicates_glued():
    # identical decoupled copies: d has exact duplicates after first merges
    rng = np.random.RandomState(2)
    d1 = rng.randn(8)
    e1 = rng.randn(7)
    d = np.concatenate([d1, d1])
    e = np.concatenate([e1, [0.0], e1])
    _check(d, e, leaf=8)


def test_tiny_and_huge_scales():
    rng = np.random.RandomState(3)
    n = 24
    _check(rng.randn(n) * 1e8, rng.randn(n - 1) * 1e8)
    _check(rng.randn(n) * 1e-8, rng.randn(n - 1) * 1e-8)


def test_frank_tridiag_from_reduction():
    # end-to-end shape: tridiagonalize Frank, solve T with the tree
    from eigenexa_tpu.ops.householder import tridiagonalize
    from eigenexa_tpu.testing.matgen import frank, frank_spectrum

    n = 64
    a = frank(n)
    res = tridiagonalize(a, nb=16)
    w, s = solve_tridiag_dc(res.d, res.e, leaf=16)
    w_true = np.asarray(frank_spectrum(n))
    np.testing.assert_allclose(np.asarray(w), w_true,
                               atol=1e-9 * w_true.max())


def test_f32_vector_dtype_mixed_precision():
    rng = np.random.RandomState(5)
    n = 64
    d = rng.randn(n)
    e = rng.randn(n - 1)
    w, s = solve_tridiag_dc(jnp.asarray(d), jnp.asarray(e), leaf=16,
                            vec_dtype=jnp.float32)
    assert s.dtype == jnp.float32
    # eigenvalues still f64-accurate
    w_ref = scipy.linalg.eigvalsh_tridiagonal(d, e)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-12, rtol=1e-12)
    # orthogonality at f32 threshold
    o = checks.orthogonality_check(s)
    assert o.passed, o


def test_host_impl_matches_jax():
    """The numpy (pure_callback) merge path must match the jitted path."""
    rng = np.random.RandomState(9)
    n = 50
    d = rng.randn(n)
    e = rng.randn(n - 1)
    w1, s1 = solve_tridiag_dc(jnp.asarray(d), jnp.asarray(e), leaf=8,
                              impl="jax")
    w2, s2 = solve_tridiag_dc(jnp.asarray(d), jnp.asarray(e), leaf=8,
                              impl="host")
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               atol=1e-13, rtol=1e-13)
    # vectors can differ by sign only
    dots = np.abs(np.sum(np.asarray(s1) * np.asarray(s2), axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-12)
    t = _tridiag(d, e)
    r = checks.residual_check(jnp.asarray(t), s2, w2.astype(jnp.float64))
    o = checks.orthogonality_check(s2)
    assert r.passed and o.passed, (r, o)


def test_host_impl_degenerate():
    n = 48
    d = np.repeat(np.array([1.0, 2.0, 3.0]), 16)
    e = np.full(n - 1, 1e-3)
    w, s = solve_tridiag_dc(jnp.asarray(d), jnp.asarray(e), leaf=8,
                            impl="host")
    t = _tridiag(d, e)
    r = checks.residual_check(jnp.asarray(t), s, w)
    o = checks.orthogonality_check(s)
    assert r.passed and o.passed, (r, o)


def test_host_impl_nan_poisons_not_raises():
    # NaN-poisoning contract on the host path (reference: eigen_scaling +
    # driver guard, src/eigen_s.F:156-160); scipy's leaf solver would
    # otherwise raise ValueError on non-finite input (found by /verify)
    d = jnp.array([1.0, np.nan, 3.0, 4.0])
    e = jnp.array([0.5, 0.5, 0.5])
    w, q = solve_tridiag_dc(d, e, impl="host")
    assert bool(jnp.isnan(w).all())
    assert q.shape == (4, 4)


def test_level_impl_matches_fused_and_chunked():
    """The eager per-level orchestration (impl='level', the large-n TPU
    path — one jitted program per merge level like FS_PDLAED0's level
    loop) must reproduce the fused tree, including when its top levels
    take the panel-chunked merge (secular.rank1_merge_apply_parts)."""
    from eigenexa_tpu.solvers import dc_tree

    rng = np.random.default_rng(12)
    d = jnp.asarray(rng.standard_normal(300))
    e = jnp.asarray(rng.standard_normal(299))
    w_ref, s_ref = dc_tree.solve_tridiag_dc(d, e, impl="jax")
    w_lvl, s_lvl = dc_tree.solve_tridiag_dc(d, e, impl="level")
    np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_lvl))
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_lvl))

    old_min, old_pan = dc_tree._LEVEL_CHUNK_MIN, dc_tree._LEVEL_CHUNK_PANEL
    try:
        dc_tree._LEVEL_CHUNK_MIN, dc_tree._LEVEL_CHUNK_PANEL = 128, 32
        w_ch, s_ch = dc_tree.solve_tridiag_dc(d, e, impl="level")
    finally:
        dc_tree._LEVEL_CHUNK_MIN = old_min
        dc_tree._LEVEL_CHUNK_PANEL = old_pan
    np.testing.assert_allclose(np.asarray(w_ch), np.asarray(w_ref),
                               atol=1e-13, rtol=0)
    assert float(jnp.max(jnp.abs(s_ch - s_ref))) < 1e-12


def test_impl_dispatch_boundaries():
    """VERDICT r4 item 9: the FUSED_TREE_MAX_N dispatch boundary, unit-
    tested via the pure rule (no TPU backend needed)."""
    from eigenexa_tpu.solvers.dc_tree import FUSED_TREE_MAX_N, _pick_impl

    assert _pick_impl(True, False, 10 ** 6) == "jax"   # CPU: always fused
    assert _pick_impl(True, True, 10 ** 6) == "jax"
    assert _pick_impl(False, True, FUSED_TREE_MAX_N) == "jax"
    assert _pick_impl(False, True, FUSED_TREE_MAX_N + 1) == "level"
    assert _pick_impl(False, False, 128) == "host"     # TPU f64


@pytest.mark.parametrize("fixture", ["onpole_own", "onpole_upper"])
def test_on_pole_merge_vectors(fixture):
    """Regression: secular roots that converge numerically ONTO a pole
    (μ underflow / dead Gu ẑ at the dominant coordinate) must yield unit
    eigenvector columns, not the 0/0 secular formula.  The fixtures are
    REAL merge inputs extracted from the n=8192 random-tridiagonal tree
    (round 5): 'own' is a barely-active coordinate whose root sticks to
    its own pole (μ ~ 1e-295); 'upper' a root clinging to the next-active
    pole.  Pre-fix these produced eigenpairs with O(1) residuals — the 4
    broken pairs of the n=8192 solve — in ALL three implementations
    (jax core, chunked parts, host/native)."""
    import os

    from eigenexa_tpu.ops import secular as S
    from eigenexa_tpu.solvers.dc_host import merge_batch

    path = os.path.join(os.path.dirname(__file__), "data",
                        fixture + ".npz")
    dd = np.load(path)
    dm, z, rho = dd["dm"], dd["z"], float(dd["rho"])
    m = dm.shape[0]
    wt = np.linalg.eigvalsh(np.diag(dm) + rho * np.outer(z, z))
    tol_res = 1e-11 * max(np.abs(dm).max(), 1.0)

    core = S.rank1_merge_core(jnp.asarray(dm), jnp.asarray(z),
                              jnp.asarray(rho), n_iter=40,
                              work_dtype=jnp.float64)
    lam = np.asarray(core.lam)
    cu = np.zeros((m, m))
    cu[np.asarray(core.perm), :] = np.asarray(core.c)
    mcu = dm[:, None] * cu + rho * np.outer(z, z @ cu)
    res = np.linalg.norm(mcu - cu * lam[None, :], axis=0)
    assert res.max() < tol_res, res.max()
    assert np.abs(cu.T @ cu - np.eye(m)).max() < 1e-12
    np.testing.assert_allclose(np.sort(lam), wt, atol=1e-12)

    # chunked parts path must agree with the core
    eye = jnp.eye(m, dtype=jnp.float64)
    lam2, (cp,) = S.rank1_merge_apply_parts(
        jnp.asarray(dm), jnp.asarray(z), jnp.asarray(rho),
        parts=((eye, 0),), n_iter=40, work_dtype=jnp.float64, panel=32)
    assert float(jnp.max(jnp.abs(lam2 - jnp.asarray(lam)))) == 0.0
    assert float(jnp.max(jnp.abs(cp - jnp.asarray(cu)))) < 1e-14

    # host twin (native C++ when available)
    lamh, ch = merge_batch(dm[None, :], z[None, :], np.array([rho]), 40)
    mch = dm[:, None] * ch[0] + rho * np.outer(z, z @ ch[0])
    resh = np.linalg.norm(mch - ch[0] * np.asarray(lamh[0])[None, :],
                          axis=0)
    assert resh.max() < tol_res, resh.max()
