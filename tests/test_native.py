"""Native C++ secular core: parity with the numpy twin.

The framework's bitwise-reproducibility contract (SURVEY.md §4.4) demands
the native core be deterministic; these tests assert f64-roundoff parity
with merge_batch_np on easy, clustered, and deflation-heavy problems.
"""

import numpy as np
import pytest

from eigenexa_tpu.native import get_lib, merge_batch_native
from eigenexa_tpu.solvers.dc_host import merge_batch_np

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def _check_parity(d, z, rho, n_iter=16, tol=1e-12):
    lam_n, c_n = merge_batch_native(d, z, rho, n_iter)
    lam_p, c_p = merge_batch_np(d, z, rho, n_iter)
    scale = max(np.abs(lam_p).max(), 1.0)
    assert np.abs(lam_n - lam_p).max() < tol * scale
    # columns may differ by sign only when eigenvalues are simple; compare
    # the projectors instead (basis-invariant)
    for b in range(d.shape[0]):
        g_n = c_n[b] @ c_n[b].T
        g_p = c_p[b] @ c_p[b].T
        assert np.abs(g_n - g_p).max() < 1e-11
    # and verify the native result actually diagonalizes the merge matrix
    for b in range(d.shape[0]):
        a = np.diag(d[b]) + rho[b] * np.outer(z[b], z[b])
        resid = a @ c_n[b] - c_n[b] * lam_n[b][None, :]
        assert np.abs(resid).max() < 1e-12 * scale * d.shape[1]
        ortho = c_n[b].T @ c_n[b] - np.eye(d.shape[1])
        assert np.abs(ortho).max() < 1e-13 * d.shape[1]


def test_native_loads():
    assert get_lib() is not None


def test_parity_random():
    rng = np.random.default_rng(0)
    bsz, m = 6, 24
    d = rng.standard_normal((bsz, m))
    z = rng.standard_normal((bsz, m))
    rho = np.abs(rng.standard_normal(bsz)) + 0.1
    _check_parity(d, z, rho)


def test_parity_unsorted_coordinates():
    rng = np.random.default_rng(1)
    d = rng.permutation(np.linspace(-3, 3, 32))[None, :]
    z = rng.standard_normal((1, 32))
    _check_parity(d, z, np.array([0.7]))


def test_parity_clustered():
    rng = np.random.default_rng(2)
    m = 40
    d = np.repeat(np.arange(10.0), 4)[None, :] \
        + 1e-15 * rng.standard_normal((1, m))
    z = rng.standard_normal((1, m))
    _check_parity(d, z, np.array([1.3]))


def test_parity_tiny_z_deflation():
    rng = np.random.default_rng(3)
    m = 30
    d = np.sort(rng.standard_normal(m))[None, :]
    z = rng.standard_normal((1, m))
    z[0, ::3] = 1e-18      # deflates
    _check_parity(d, z, np.array([2.0]))


def test_parity_fully_deflated():
    m = 16
    d = np.linspace(0, 1, m)[None, :]
    z = np.zeros((1, m))
    _check_parity(d, z, np.array([1.0]))


def test_parity_negative_z_and_large_scale():
    rng = np.random.default_rng(4)
    m = 28
    d = np.sort(rng.standard_normal(m))[None, :] * 1e6
    z = -np.abs(rng.standard_normal((1, m))) * 1e3
    _check_parity(d, z, np.array([5.0]))


def test_determinism():
    rng = np.random.default_rng(5)
    d = rng.standard_normal((4, 33))
    z = rng.standard_normal((4, 33))
    rho = np.abs(rng.standard_normal(4)) + 0.1
    lam1, c1 = merge_batch_native(d, z, rho, 16)
    lam2, c2 = merge_batch_native(d, z, rho, 16)
    assert (lam1 == lam2).all()
    assert (c1 == c2).all()
