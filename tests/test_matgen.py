import numpy as np
import pytest

from eigenexa_tpu.testing import checks, matgen


def test_frank_spectrum_exact():
    n = 64
    a, w_true = matgen.mat_set(n, 0)
    w = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(w, np.asarray(w_true), rtol=1e-10, atol=1e-10)


def test_frank2_same_spectrum():
    n = 48
    a, w_true = matgen.mat_set(n, 3)
    w = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(w, np.asarray(w_true), rtol=1e-10, atol=1e-10)


def test_helmert_orthogonal():
    h = np.asarray(matgen.helmert_matrix(33))
    np.testing.assert_allclose(h @ h.T, np.eye(33), atol=1e-13)


@pytest.mark.parametrize("mtype", [4, 5, 6, 8, 9])
def test_designed_spectra(mtype):
    n = 40
    a, w_true = matgen.mat_set(n, mtype)
    a = np.asarray(a)
    np.testing.assert_allclose(a, a.T, atol=1e-13)
    w = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(w, np.asarray(w_true), rtol=1e-9, atol=1e-9)


def test_wdat_file(tmp_path):
    w = np.linspace(-2, 5, 30)
    p = tmp_path / "W.dat"
    np.savetxt(p, w)
    a, w_true = matgen.mat_set(30, 10, w_file=str(p))
    np.testing.assert_allclose(
        np.linalg.eigvalsh(np.asarray(a)), np.sort(w), atol=1e-10
    )


def test_symmetry_types():
    for mtype in [0, 1, 2, 3]:
        a, _ = matgen.mat_set(32, mtype)
        a = np.asarray(a)
        np.testing.assert_allclose(a, a.T, atol=0)


def test_checks_on_exact_decomposition():
    n = 40
    a, w_true = matgen.mat_set(n, 4)
    w, z = np.linalg.eigh(np.asarray(a))
    import jax.numpy as jnp

    r = checks.residual_check(jnp.asarray(a), jnp.asarray(z), jnp.asarray(w))
    o = checks.orthogonality_check(jnp.asarray(z))
    e = checks.eigenvalue_check(jnp.asarray(w), w_true)
    assert r.passed and o.passed and e.passed, (r, o, e)


def test_checks_detect_garbage():
    n = 24
    a, _ = matgen.mat_set(n, 0)
    import jax.numpy as jnp

    z = jnp.eye(n, dtype=jnp.float64)
    w = jnp.zeros(n, dtype=jnp.float64)
    r = checks.residual_check(jnp.asarray(a), z, w)
    assert not r.passed and r.hard_fail
