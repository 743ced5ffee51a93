"""End-to-end acceptance tests with the reference's exact thresholds
(benchmark/ev_test.f, w_test.f — SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

import eigenexa_tpu as ex
from eigenexa_tpu.testing import checks, matgen


def _accept(a, w, z, w_true=None, nvec=None):
    r = checks.residual_check(a, z, w, nvec)
    o = checks.orthogonality_check(z, nvec)
    assert r.passed, r
    assert o.passed, o
    if w_true is not None:
        e = checks.eigenvalue_check(w, w_true)
        assert e.passed, e


@pytest.mark.parametrize("mtype", [0, 1, 2, 4, 6])
def test_eigen_s_full(mtype):
    n = 96
    a, w_true = matgen.mat_set(n, mtype)
    w, z, info = ex.eigen_s(a)
    _accept(a, w, z, w_true)
    assert info.elapsed > 0 and info.flops > 0


def test_eigen_s_frank_larger():
    n = 192
    a, w_true = matgen.mat_set(n, 0)
    w, z, _ = ex.eigen_s(a)
    _accept(a, w, z, w_true)


def test_eigen_s_nvec_subset():
    n = 64
    a, w_true = matgen.mat_set(n, 0)
    w, z, _ = ex.eigen_s(a, nvec=10)
    assert z.shape == (n, 10)
    _accept(a, w, z, w_true, nvec=10)


def test_eigen_s_mode_n():
    n = 64
    a, w_true = matgen.mat_set(n, 0)
    w, z, _ = ex.eigen_s(a, mode="N")
    assert z is None
    e = checks.eigenvalue_check(w, w_true)
    assert e.passed, e


def test_eigen_s_mode_t_and_s():
    n = 64
    a, _ = matgen.mat_set(n, 0)
    # 'T': Z are eigenvectors of T (orthogonal)
    w, zt, _ = ex.eigen_s(a, mode="T")
    assert checks.orthogonality_check(zt).passed
    # 'S': Z = Q (orthogonal)
    _, zs, _ = ex.eigen_s(a, mode="S")
    assert checks.orthogonality_check(zs).passed
    # 'C': Z = I
    _, zc, _ = ex.eigen_s(a, mode="C")
    np.testing.assert_array_equal(np.asarray(zc), np.eye(n))


def test_eigen_sx_contract():
    n = 96
    a, w_true = matgen.mat_set(n, 0)
    w, z, _ = ex.eigen_sx(a)
    _accept(a, w, z, w_true)


def test_nan_poisoning():
    n = 32
    a, _ = matgen.mat_set(n, 0)
    a = a.at[3, 4].set(jnp.nan)
    w, z, _ = ex.eigen_s(a)
    assert np.isnan(np.asarray(w)).any()


def test_reproducibility_bitwise():
    """Double-run determinism (reference: bench_eigen_h.f double-run compare,
    SURVEY.md §4.4): identical inputs must give bitwise-identical results."""
    n = 64
    a, _ = matgen.mat_set(n, 2)
    w1, z1, _ = ex.eigen_s(a)
    w2, z2, _ = ex.eigen_s(a)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(z1), np.asarray(z2))


def test_eigen_h_hermitian():
    n = 48
    rng = np.random.RandomState(11)
    a = rng.randn(n, n) + 1j * rng.randn(n, n)
    a = jnp.asarray(a + a.conj().T)
    w, z, _ = ex.eigen_h(a)
    wa = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), wa, atol=1e-10 * np.abs(wa).max())
    _accept(a, w, z)


def test_eigen_h_real_input_promoted():
    n = 32
    a, w_true = matgen.mat_set(n, 0)
    w, z, _ = ex.eigen_h(a)
    assert np.iscomplexobj(np.asarray(z))
    e = checks.eigenvalue_check(w, w_true)
    assert e.passed, e


def test_eigen_gev():
    n = 48
    rng = np.random.RandomState(13)
    a = rng.randn(n, n)
    a = jnp.asarray(a + a.T)
    bm = rng.randn(n, n)
    b = jnp.asarray(bm @ bm.T + n * np.eye(n))
    w, z, _ = ex.eigen_gev(a, b)
    # golden: scipy generalized eigh
    import scipy.linalg

    wg = scipy.linalg.eigh(np.asarray(a), np.asarray(b), eigvals_only=True)
    np.testing.assert_allclose(np.asarray(w), wg, atol=1e-9 * np.abs(wg).max())
    # residual ||AZ - BZW|| small; B-orthonormality
    az = np.asarray(a) @ np.asarray(z)
    bzw = np.asarray(b) @ np.asarray(z) * np.asarray(w)[None, :]
    assert np.linalg.norm(az - bzw) < 1e-8 * np.linalg.norm(np.asarray(a))
    g = np.asarray(z).T @ np.asarray(b) @ np.asarray(z)
    np.testing.assert_allclose(g, np.eye(n), atol=1e-8)


def test_eigen_gev_not_pd_poisons():
    n = 16
    a, _ = matgen.mat_set(n, 0)
    b = jnp.asarray(-np.eye(n))
    w, z, _ = ex.eigen_gev(a, b)
    assert np.isnan(np.asarray(z)).any()
