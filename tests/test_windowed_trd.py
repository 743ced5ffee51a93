"""Windowed (no-roll) TRD path: Pallas symv-lower + in-place rank-2k.

The TPU/f32 fast path keeps ONE fixed working buffer, reads only the
lower triangle of a statically-shrinking tile window, and aliases the
trailing update onto the buffer (peak ~2·n² vs the rolled scheme's
4-5·n²).  On CPU the same kernels run through the Pallas interpreter, so
these tests exercise the real kernel code paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenexa_tpu.ops import pallas_kernels as pk
from eigenexa_tpu.ops.householder import tridiagonalize


def _sym(n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(dtype)
    return (a + a.T) / 2


TM = pk._SYMV_TM  # tile-relative sizes: the tile edge is configurable


@pytest.mark.parametrize("mt,t0", [(2, 0), (3, 1), (4, 3)])
def test_symv_lower_window(mt, t0):
    m = mt * TM
    a = _sym(m)
    x = np.random.default_rng(1).standard_normal(m).astype(np.float32)
    w0 = t0 * TM
    x[:w0] = 0  # caller contract: v masked above the active column
    q = pk.symv_lower(jnp.asarray(a), jnp.asarray(x), t0=t0,
                      interpret=True)
    ref = a[w0:, w0:] @ x[w0:]
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(np.asarray(q)[w0:], ref,
                               atol=5e-6 * scale)
    if w0:
        assert np.all(np.asarray(q)[:w0] == 0)


def test_symv_lower_fallback_unaligned():
    # non-tile-multiple sizes must take the jnp fallback, both modes
    a = _sym(300)
    x = np.random.default_rng(2).standard_normal(300).astype(np.float32)
    q = pk.symv_lower(jnp.asarray(a), jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(q), a @ x, rtol=2e-5,
                               atol=1e-4)


@pytest.mark.parametrize("t0", [0, 1])
def test_rank2k_window_inplace_semantics(t0):
    m, nb = 3 * TM, 64
    rng = np.random.default_rng(3)
    b = rng.standard_normal((m, m)).astype(np.float32)
    u = rng.standard_normal((m, nb)).astype(np.float32)
    w = rng.standard_normal((m, nb)).astype(np.float32)
    w0 = t0 * TM
    u[:w0] = 0
    w[:w0] = 0
    out = pk.rank2k_update_window(jnp.asarray(b), jnp.asarray(u),
                                  jnp.asarray(w), t0=t0, interpret=True)
    ref = b - u @ w.T - w @ u.T
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(np.asarray(out)[w0:, w0:],
                               ref[w0:, w0:], atol=5e-6 * scale)
    if w0:
        # tiles outside the window keep their (stale) contents
        np.testing.assert_array_equal(np.asarray(out)[:w0, :], b[:w0, :])


@pytest.mark.parametrize("n", [300, 512, 700])
def test_windowed_matches_rolled(n):
    a = jnp.asarray(_sym(n, seed=n))
    r_roll = tridiagonalize(a, nb=64, impl="rolled")
    r_win = tridiagonalize(a, nb=64, impl="windowed")
    # same algorithm, different accumulation order: spectra must agree to
    # f32 accuracy and the tridiagonal entries elementwise closely
    import scipy.linalg as sla

    w_ref = np.linalg.eigvalsh(np.asarray(a, np.float64))
    scale = np.max(np.abs(w_ref))
    for r in (r_roll, r_win):
        w = sla.eigh_tridiagonal(np.asarray(r.d, np.float64),
                                 np.asarray(r.e, np.float64),
                                 eigvals_only=True)
        np.testing.assert_allclose(w, w_ref, atol=5e-6 * scale)
    assert r_win.v.shape == (n, n) and r_win.tau.shape == (n,)


@pytest.mark.parametrize("n", [300, 520])
def test_band2_windowed_matches_rolled(n):
    from eigenexa_tpu.ops.band import assemble_band2, band2_reduce

    a = jnp.asarray(_sym(n, seed=10 + n))
    w_ref = np.linalg.eigvalsh(np.asarray(a, np.float64))
    scale = np.max(np.abs(w_ref))
    for impl in ("rolled", "windowed"):
        r = band2_reduce(a, nb=64, impl=impl)
        p = np.asarray(assemble_band2(r.d, r.e1, r.e2), np.float64)
        w = np.linalg.eigvalsh(p)
        np.testing.assert_allclose(w, w_ref, atol=5e-6 * scale)


def test_windowed_end_to_end_solve():
    """Full eigen_s through the windowed TRD (dispatch override) must meet
    the reference acceptance thresholds (benchmark/ev_test.f:182-204)."""
    from eigenexa_tpu.ops import householder
    from eigenexa_tpu.runtime import SolverConfig, eigen_init
    from eigenexa_tpu.solvers.solver import eigen_s
    from eigenexa_tpu.testing import checks, matgen

    old = householder.TRD_IMPL
    householder.TRD_IMPL = "windowed"
    try:
        ctx = eigen_init(config=SolverConfig(panel_forward=64,
                                             panel_backward=64))
        a, _ = matgen.mat_set(520, 0, dtype=jnp.float32)
        w, z, _ = eigen_s(a, ctx=ctx)
        assert checks.residual_check(a, z, w).passed
        assert checks.orthogonality_check(z).passed
        w_ref = np.linalg.eigvalsh(np.asarray(a, np.float64))
        err = np.max(np.abs(np.asarray(w) - w_ref)) / np.max(np.abs(w_ref))
        assert err < 1e-5  # f32 headroom over the 1.5e-8 f64 contract
        # eigen_sx through the windowed band-2 reduction
        from eigenexa_tpu.solvers.solver import eigen_sx

        w2, z2, _ = eigen_sx(a, ctx=ctx)
        assert checks.residual_check(a, z2, w2).passed
        assert checks.orthogonality_check(z2).passed
    finally:
        householder.TRD_IMPL = old


def test_windowed_dispatch_memory_rule():
    """VERDICT r4 item 9: the rolled-vs-windowed boundary as a pure
    function of (n, device HBM) — testable against mocked memory sizes
    (the heuristic itself is measured: ~15 f32 n2 rolled whole-solve
    peak)."""
    from eigenexa_tpu.ops.householder import (_needs_windowed,
                                              _rolled_peak_bytes)

    hbm_16g = 16e9
    assert not _needs_windowed(8192, hbm_16g)    # rolled fits (measured)
    assert _needs_windowed(16384, hbm_16g)       # rolled OOMs (measured)
    assert _needs_windowed(32768, hbm_16g)
    # a 32 GB-class chip keeps the (faster) rolled path at 16384
    assert not _needs_windowed(16384, 32e9)
    # boundary is strict: peak exactly at 0.9*HBM stays rolled
    n = 4096
    assert not _needs_windowed(n, _rolled_peak_bytes(n) / 0.9)


def test_windowed_eligible_gates_backend():
    """On the CPU suite backend the windowed path must never be chosen
    by 'auto' (no Pallas TPU kernels) regardless of problem size."""
    from eigenexa_tpu.ops import householder as hh

    a = jnp.zeros((512, 512), jnp.float32)
    assert not hh._windowed_eligible(a, 512)
    assert not hh._windowed_eligible(a, 10 ** 6)
