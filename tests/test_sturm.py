import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from eigenexa_tpu.ops.sturm import (
    eigvals_bisect,
    refine_eigenvalues,
    sturm_count,
)


@pytest.mark.parametrize("n", [5, 32, 100])
def test_sturm_count(n):
    rng = np.random.RandomState(n)
    d = rng.randn(n)
    e = rng.randn(n - 1)
    w = scipy.linalg.eigvalsh_tridiagonal(d, e)
    probes = jnp.asarray(
        [w[0] - 1.0, 0.5 * (w[0] + w[1]), w[-1] + 1.0, 0.0]
    )
    cnt = np.asarray(sturm_count(jnp.asarray(d), jnp.asarray(e), probes))
    assert cnt[0] == 0
    assert cnt[1] == 1
    assert cnt[2] == n
    assert cnt[3] == np.sum(w < 0.0)


@pytest.mark.parametrize("n", [8, 64])
def test_eigvals_bisect(n):
    rng = np.random.RandomState(n + 1)
    d = rng.randn(n)
    e = rng.randn(n - 1)
    w = np.asarray(eigvals_bisect(jnp.asarray(d), jnp.asarray(e)))
    wr = scipy.linalg.eigvalsh_tridiagonal(d, e)
    np.testing.assert_allclose(w, wr, atol=1e-12 * max(abs(wr).max(), 1))


def test_refine():
    n = 48
    rng = np.random.RandomState(7)
    d = rng.randn(n)
    e = rng.randn(n - 1)
    wr = scipy.linalg.eigvalsh_tridiagonal(d, e)
    gap = np.diff(wr).min()
    w0 = wr + rng.uniform(-0.3, 0.3, n) * gap
    w = np.asarray(
        refine_eigenvalues(jnp.asarray(d), jnp.asarray(e), jnp.asarray(w0),
                           n_iter=55)
    )
    assert np.abs(w - wr).max() < np.abs(w0 - wr).max()
    np.testing.assert_allclose(w, wr, atol=1e-10 * abs(wr).max())
