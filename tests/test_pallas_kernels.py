"""Fused subtract-matmul kernels (ops/pallas_kernels.py).

Checks the jnp fallback and the Pallas kernel (interpret mode — runs the
real kernel body on CPU) against the naive two-GEMM formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenexa_tpu.ops import pallas_kernels as pk


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32
                             ).astype(dtype)


def test_sub_matmul_fallback_matches_naive():
    b = _rand((96, 256), 0, jnp.float64)
    p = _rand((96, 48), 1, jnp.float64)
    q = _rand((256, 48), 2, jnp.float64)
    out = pk.sub_matmul(b, p, q)
    np.testing.assert_allclose(out, b - p @ q.T, rtol=1e-13)


def test_sub_matmul_complex_fallback_conjugates():
    key = jax.random.PRNGKey(3)
    kr, ki = jax.random.split(key)
    b = (jax.random.normal(kr, (32, 128)) +
         1j * jax.random.normal(ki, (32, 128))).astype(jnp.complex128)
    p = (jax.random.normal(ki, (32, 16)) +
         1j * jax.random.normal(kr, (32, 16))).astype(jnp.complex128)
    q = (jax.random.normal(kr, (128, 16)) +
         1j * jax.random.normal(ki, (128, 16))).astype(jnp.complex128)
    out = pk.sub_matmul(b, p, q)
    np.testing.assert_allclose(out, b - p @ np.conj(q).T, rtol=1e-12)


@pytest.mark.parametrize("m,n,k", [(256, 256, 128), (64, 128, 64),
                                   (8, 128, 7), (24, 384, 100)])
def test_sub_matmul_pallas_interpret(m, n, k):
    b = _rand((m, n), 10)
    p = _rand((m, k), 11)
    q = _rand((n, k), 12)
    out = pk.sub_matmul(b, p, q, interpret=True)
    ref = (b.astype(jnp.float64) - p.astype(jnp.float64)
           @ q.astype(jnp.float64).T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_rank2k_update_pallas_interpret():
    b = _rand((256, 256), 20)
    u = _rand((256, 64), 21)
    w = _rand((256, 64), 22)
    out = pk.rank2k_update(b, u, w, interpret=True)
    ref = b - u @ w.T - w @ u.T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_wy_apply_pallas_interpret_matches_naive():
    z = _rand((256, 128), 30)
    v = jnp.tril(_rand((256, 64), 31), -1) + jnp.eye(256, 64,
                                                     dtype=jnp.float32)
    t = jnp.triu(_rand((64, 64), 32)) * 0.1
    out = pk.wy_apply(z, v, t, interpret=True)
    s = v.T @ z
    ref = z - v @ (t @ s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_eligibility_gates():
    b = _rand((100, 128), 40)       # m=100: no tile divides -> fallback
    p = _rand((100, 16), 41)
    q = _rand((128, 16), 42)
    assert not pk._pallas_eligible(b, p, q)
    b2 = _rand((128, 120), 43)      # n not lane-aligned -> fallback
    assert not pk._pallas_eligible(b2, _rand((128, 16), 44),
                                   _rand((120, 16), 45))
    # fallback still exact
    np.testing.assert_allclose(pk.sub_matmul(b, p, q), b - p @ q.T,
                               rtol=1e-5)


def test_solver_end_to_end_still_passes_with_hooked_kernels():
    # the hooked call sites (householder/_tridiag_step, band/_band2_step,
    # trbak via apply_wy_left) run the fallback on CPU — full solve must
    # still meet the acceptance thresholds
    from eigenexa_tpu.solvers.solver import eigen_s
    from eigenexa_tpu.testing.checks import (orthogonality_check,
                                             residual_check)
    from eigenexa_tpu.testing.matgen import frank

    a = frank(192, jnp.float64)
    w, z, _ = eigen_s(a)
    assert residual_check(a, z, w).passed
    assert orthogonality_check(z).passed
