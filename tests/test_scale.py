"""Four-digit-n acceptance tests, one per driver (slow-marked).

The reference's standard problem sizes start at n=1000
(benchmark/IN:25-60); everything else in tests/ runs at n<=256 where
deflation rates, cluster handling and threshold headroom are not
representative.  These run the reference acceptance contract
(ev_test 768/8 thresholds, w_test vs the analytic Frank spectrum —
benchmark/ev_test.f:182-204, w_test.f:141-175) at n>=1024 on the CPU
backend in f64.

w_test note: at four-digit n the D&C eigenvalues carry ~n·eps·‖A‖
absolute error, which for the Frank matrix's ~n²/5 norm sits in the
reference's CAUTION band (< eps^{1/4}), not the PASS band (< sqrt(eps)) —
the reference benchmark prints CAUTION and carries on
(w_test.f:141-175); mode='X' bisection refinement is the documented way
to tighten values.  We assert "not hard-failed" for mode A and strictly
better error for mode X.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eigenexa_tpu.testing import checks, matgen

pytestmark = pytest.mark.slow

N = 1024


# cache-write safety: conftest.py disables persistent-cache writes
# suite-wide (jax_persistent_cache_min_compile_time_secs=1e9) because
# XLA's executable.serialize() has segfaulted on these four-digit-n CPU
# executables late in long suite runs; standalone runs of this file go
# through the same conftest, so no per-file fixture is needed.

def _accept(a, w, z, w_true=None):
    r = checks.residual_check(a, z, w)
    o = checks.orthogonality_check(z)
    assert r.passed and o.passed, (r, o)
    if w_true is not None:
        wt = checks.eigenvalue_check(w, w_true)
        assert wt.passed or wt.caution, wt  # never hard FAIL
        return wt
    return None


def test_eigen_s_n1024_frank():
    from eigenexa_tpu.solvers.solver import eigen_s

    a = matgen.frank(N, jnp.float64)
    w, z, info = eigen_s(a)
    wt = _accept(a, w, z, matgen.frank_spectrum(N))
    assert info.elapsed > 0 and info.flops > 0

    # mode X (bisection-refined values) must not be worse than mode A
    w_x, _, _ = eigen_s(a, mode="X")
    err_a = float(jnp.max(jnp.abs(jnp.sort(w)
                                  - matgen.frank_spectrum(N))))
    err_x = float(jnp.max(jnp.abs(jnp.sort(w_x)
                                  - matgen.frank_spectrum(N))))
    assert err_x <= err_a * 1.5, (err_x, err_a)


def test_eigen_sx_n1024_frank():
    from eigenexa_tpu.solvers.solver import eigen_sx

    a = matgen.frank(N, jnp.float64)
    w, z, _ = eigen_sx(a)
    _accept(a, w, z, matgen.frank_spectrum(N))


def test_eigen_h_n1024_random():
    from eigenexa_tpu.solvers.hermitian import eigen_h

    rng = np.random.default_rng(0)
    h = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    a = jnp.asarray((h + h.conj().T) / 2)
    w, z, _ = eigen_h(a)
    eps = np.finfo(np.float64).eps
    zc = np.asarray(z)
    an = np.linalg.norm(np.asarray(a))
    r = np.linalg.norm(np.asarray(a) @ zc - zc * np.asarray(w)[None, :])
    assert r / (N * eps * an) < 768
    o = np.linalg.norm(zc.conj().T @ zc - np.eye(N)) / (N * eps)
    assert o < 8, o
    # Hermitian w sanity vs numpy (same problem class, f64 oracle)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-9 * an)


def test_gev_n1024():
    from eigenexa_tpu.solvers.gev import eigen_gev

    rng = np.random.default_rng(1)
    a = rng.standard_normal((N, N))
    a = jnp.asarray((a + a.T) / 2)
    f = rng.standard_normal((N, N)) / np.sqrt(N)
    b = jnp.asarray(f @ f.T + np.eye(N))  # SPD, moderate condition
    w, z, _ = eigen_gev(a, b)
    r = checks.gev_residual_check(a, b, z, w)
    bo = checks.b_orthogonality_check(z, b)
    assert r.passed and bo.passed, (r, bo)
