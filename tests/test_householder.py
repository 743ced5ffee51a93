import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from eigenexa_tpu.ops.householder import (
    apply_wy_left,
    householder_vector,
    tridiagonalize,
    wy_t_factor,
)


def _assemble_q(v, tau):
    """Dense Q = H_0 ... H_{n-1} from stored reflectors (oracle)."""
    n = v.shape[0]
    q = np.eye(n, dtype=v.dtype)
    for k in range(n - 1, -1, -1):
        vk = np.asarray(v[:, k])
        tk = complex(tau[k]) if np.iscomplexobj(np.asarray(v)) else float(
            tau[k]
        )
        q = q - tk * np.outer(vk, np.conj(vk)) @ q
    return q


def test_householder_vector_annihilates():
    x = jnp.asarray(np.random.RandomState(0).randn(10))
    mask = jnp.arange(10) >= 3
    v, tau, beta = householder_vector(x, mask)
    h = np.eye(10) - float(tau) * np.outer(v, v)
    y = h @ np.asarray(x)
    assert abs(y[3] - float(beta)) < 1e-12
    np.testing.assert_allclose(y[4:], 0, atol=1e-12)
    np.testing.assert_allclose(y[:3], np.asarray(x)[:3], atol=0)


def test_householder_vector_zero_tail():
    x = jnp.asarray([1.0, 2.0, 0.0, 0.0])
    mask = jnp.arange(4) >= 1
    v, tau, beta = householder_vector(x, mask)
    assert float(tau) == 0.0
    assert float(beta) == 2.0


def test_householder_vector_complex():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8) + 1j * rng.randn(8))
    mask = jnp.arange(8) >= 2
    v, tau, beta = householder_vector(x, mask)
    # zlarfg convention: the *adjoint* Hᴴ = I - conj(tau)·v·vᴴ annihilates
    h_adj = np.eye(8) - np.conj(complex(tau)) * np.outer(
        np.asarray(v), np.conj(np.asarray(v))
    )
    y = h_adj @ np.asarray(x)
    assert abs(np.imag(beta)) == 0
    assert abs(y[2] - complex(beta)) < 1e-12
    np.testing.assert_allclose(y[3:], 0, atol=1e-12)


@pytest.mark.parametrize("n,nb", [(16, 4), (33, 8), (64, 16), (65, 64)])
def test_tridiagonalize_real(n, nb):
    rng = np.random.RandomState(n)
    a = rng.randn(n, n)
    a = a + a.T
    res = tridiagonalize(jnp.asarray(a), nb=nb)
    d, e = np.asarray(res.d), np.asarray(res.e)
    # eigenvalues of T must equal eigenvalues of A
    wt = scipy.linalg.eigvalsh_tridiagonal(d, e)
    wa = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(wt, wa, atol=1e-10 * np.abs(wa).max())
    # Q^T A Q = T exactly
    q = _assemble_q(res.v, res.tau)
    t = q.T @ a @ q
    t_ref = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    np.testing.assert_allclose(t, t_ref, atol=1e-10 * np.abs(a).max())


def test_tridiagonalize_complex():
    n, nb = 24, 8
    rng = np.random.RandomState(7)
    a = rng.randn(n, n) + 1j * rng.randn(n, n)
    a = a + a.conj().T
    res = tridiagonalize(jnp.asarray(a), nb=nb)
    d, e = np.asarray(res.d), np.asarray(res.e)
    assert d.dtype == np.float64 and e.dtype == np.float64
    wt = scipy.linalg.eigvalsh_tridiagonal(d, e)
    wa = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(wt, wa, atol=1e-10 * np.abs(wa).max())


def test_wy_t_factor_matches_product():
    n, nb = 20, 5
    rng = np.random.RandomState(3)
    a = rng.randn(n, n)
    a = a + a.T
    res = tridiagonalize(jnp.asarray(a), nb=nb)
    v = res.v[:, :nb]
    tau = res.tau[:nb]
    t = wy_t_factor(v, tau)
    # I - V T V^T must equal H_0...H_{nb-1}
    q_wy = np.eye(n) - np.asarray(v) @ np.asarray(t) @ np.asarray(v).T
    q_prod = np.eye(n)
    for k in range(nb):
        vk = np.asarray(res.v[:, k])
        q_prod = q_prod @ (np.eye(n) - float(res.tau[k]) * np.outer(vk, vk))
    np.testing.assert_allclose(q_wy, q_prod, atol=1e-12)


def test_apply_wy_left():
    n, nb, m = 16, 4, 3
    rng = np.random.RandomState(5)
    a = rng.randn(n, n)
    a = a + a.T
    res = tridiagonalize(jnp.asarray(a), nb=nb)
    v = res.v[:, :nb]
    t = wy_t_factor(v, res.tau[:nb])
    z = jnp.asarray(rng.randn(n, m))
    out = apply_wy_left(z, v, t)
    q_wy = np.eye(n) - np.asarray(v) @ np.asarray(t) @ np.asarray(v).T
    np.testing.assert_allclose(np.asarray(out), q_wy @ np.asarray(z),
                               atol=1e-12)
