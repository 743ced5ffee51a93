"""Distributed (mesh-sharded) solver path.

The reference approximates cluster coverage by sweeping process counts and
grid shapes on one box (benchmark_h/check_s.sh — SURVEY.md §4.3); here the
equivalent is solving on CPU-simulated device meshes of several shapes and
holding the same acceptance thresholds as the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenexa_tpu.parallel.distributed import (
    distributed_eigen_s,
    matrix_sharding,
    shard_matrix,
)
from eigenexa_tpu.parallel.mesh import build_mesh
from eigenexa_tpu.runtime import SolverConfig
from eigenexa_tpu.testing import matgen, checks


@pytest.mark.parametrize("shape", [(2, 4), (8, 1), (1, 8), (2, 2)])
def test_distributed_eigen_s_shapes(shape):
    n = 64
    mesh = build_mesh(devices=jax.devices()[: shape[0] * shape[1]],
                      shape=shape)
    a = matgen.frank(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_s(a, mesh, config=cfg)
    r = checks.residual_check(a, z, w)
    o = checks.orthogonality_check(z)
    assert r.passed and o.passed, (shape, r, o)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-9, rtol=1e-9)


def test_distributed_matches_single_device_bitwise():
    # determinism across mesh shapes is NOT promised (different collective
    # schedules); within ONE mesh, double-run must be bitwise identical
    n = 48
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.random_symmetric(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w1, z1 = distributed_eigen_s(a, mesh, config=cfg)
    w2, z2 = distributed_eigen_s(a, mesh, config=cfg)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(z1), np.asarray(z2))


def test_shard_matrix_places_blocks():
    mesh = build_mesh(devices=jax.devices()[:8], shape=(2, 4))
    a = matgen.frank(32, jnp.float64)
    a_sh = shard_matrix(a, mesh)
    assert a_sh.sharding == matrix_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(a_sh), np.asarray(a))


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    w, z = jax.jit(fn)(*args)
    assert w.shape[0] == z.shape[0]
    g.dryrun_multichip(8)


@pytest.mark.parametrize("mode", ["N", "T", "S", "C"])
def test_distributed_modes(mode):
    # stage-isolation modes on the mesh (reference: main2.f:243-258)
    n = 64
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.frank(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_s(a, mesh, mode=mode, config=cfg)
    if mode == "N":
        assert z is None
        w_ref = np.linalg.eigvalsh(np.asarray(a))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-8)
        return
    assert z.shape == (n, n)
    if mode in ("S", "T"):
        # orthogonality must hold for the partial-stage outputs too
        # (reference: ev_test.f:194-195 runs the Z-orthogonality check in
        # S/T/R modes)
        o = checks.orthogonality_check(z)
        assert o.passed, (mode, o)
    if mode == "C":
        np.testing.assert_array_equal(np.asarray(z), np.eye(n))


def test_distributed_mode_x_refined_values():
    n = 64
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.frank(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_s(a, mesh, mode="X", config=cfg)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-9, rtol=1e-9)
    assert checks.residual_check(a, z, w).passed


@pytest.mark.slow
def test_distributed_eigen_s_n1024():
    """VERDICT r2 item 1 acceptance: eigen_s on a 2x4 mesh at n>=1024 must
    pass the reference 768/8 thresholds (benchmark/ev_test.f:182-204)."""
    n = 1024
    mesh = build_mesh(devices=jax.devices()[:8], shape=(2, 4))
    a = matgen.frank(n, jnp.float64)
    cfg = SolverConfig(panel_forward=32, panel_backward=64)
    w, z = distributed_eigen_s(a, mesh, config=cfg)
    r = checks.residual_check(a, z, w)
    o = checks.orthogonality_check(z)
    assert r.passed and o.passed, (r, o)


# ---------------------------------------------------------------------------
# distributed eigen_sx (explicit shard_map PRD pipeline)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(2, 4), (2, 2), (1, 8)])
def test_distributed_eigen_sx_shapes(shape):
    from eigenexa_tpu.parallel.distributed import distributed_eigen_sx

    n = 96
    mesh = build_mesh(devices=jax.devices()[: shape[0] * shape[1]],
                      shape=shape)
    a = matgen.random_symmetric(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_sx(a, mesh, config=cfg)
    r = checks.residual_check(a, z, w)
    o = checks.orthogonality_check(z)
    assert r.passed and o.passed, (shape, r, o)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-9, rtol=1e-8)


@pytest.mark.parametrize("mode", ["N", "S", "C"])
def test_distributed_eigen_sx_modes(mode):
    from eigenexa_tpu.parallel.distributed import distributed_eigen_sx

    n = 64
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.random_symmetric(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_sx(a, mesh, mode=mode, config=cfg)
    if mode == "N":
        assert z is None
        w_ref = np.linalg.eigvalsh(np.asarray(a))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-8)
        return
    if mode == "S":
        assert checks.orthogonality_check(z).passed
    if mode == "C":
        np.testing.assert_array_equal(np.asarray(z), np.eye(n))


def test_distributed_eigen_sx_bitwise():
    from eigenexa_tpu.parallel.distributed import distributed_eigen_sx

    n = 48
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.random_symmetric(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w1, z1 = distributed_eigen_sx(a, mesh, config=cfg)
    w2, z2 = distributed_eigen_sx(a, mesh, config=cfg)
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(z1), np.asarray(z2))


def test_distributed_eigen_gev():
    from eigenexa_tpu.parallel.distributed import distributed_eigen_gev

    n = 96
    rng = np.random.default_rng(5)
    a = rng.standard_normal((n, n))
    a = jnp.asarray((a + a.T) / 2)
    f = rng.standard_normal((n, n)) / np.sqrt(n)
    b = jnp.asarray(f @ f.T + np.eye(n))
    mesh = build_mesh(devices=jax.devices()[:8], shape=(2, 4))
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_gev(a, b, mesh, config=cfg)
    r = checks.gev_residual_check(a, b, z, w)
    bo = checks.b_orthogonality_check(z, b)
    assert r.passed and bo.passed, (r, bo)
    # mode N agrees with scipy
    w_n, z_n = distributed_eigen_gev(a, b, mesh, mode="N", config=cfg)
    assert z_n is None
    import scipy.linalg

    w_ref = scipy.linalg.eigh(np.asarray(a), np.asarray(b),
                              eigvals_only=True)
    np.testing.assert_allclose(np.sort(np.asarray(w_n)), w_ref, atol=1e-9)


def test_distributed_gev_not_pd_poisons():
    from eigenexa_tpu.parallel.distributed import distributed_eigen_gev

    n = 32
    rng = np.random.default_rng(6)
    a = rng.standard_normal((n, n))
    a = jnp.asarray((a + a.T) / 2)
    b = jnp.asarray(-np.eye(n))  # negative definite -> poison
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z = distributed_eigen_gev(a, b, mesh, config=cfg)
    assert np.isnan(np.asarray(w)).all()


@pytest.mark.slow
def test_distributed_eigen_sx_n1024():
    """VERDICT r3 item 10: distributed eigen_sx at four-digit n vs scipy
    eigenvalues + the reference 768/8 thresholds, two mesh shapes."""
    from eigenexa_tpu.parallel.distributed import distributed_eigen_sx

    n = 1024
    a = matgen.random_symmetric(n, jnp.float64)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    for shape in [(2, 4), (4, 2)]:
        mesh = build_mesh(devices=jax.devices()[:8], shape=shape)
        cfg = SolverConfig(panel_forward=32, panel_backward=64)
        w, z = distributed_eigen_sx(a, mesh, config=cfg)
        r = checks.residual_check(a, z, w)
        o = checks.orthogonality_check(z)
        assert r.passed and o.passed, (shape, r, o)
        np.testing.assert_allclose(np.sort(np.asarray(w)), w_ref,
                                   atol=1e-8, rtol=1e-8)


@pytest.mark.slow
def test_distributed_eigen_h_n1024():
    """VERDICT r3 item 10: distributed eigen_h at four-digit n vs numpy
    eigenvalues + thresholds (complex path on the CPU mesh)."""
    from eigenexa_tpu.parallel.distributed import distributed_eigen_h

    n = 1024
    rng = np.random.default_rng(7)
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = jnp.asarray((h + h.conj().T) / 2)
    mesh = build_mesh(devices=jax.devices()[:8], shape=(2, 4))
    cfg = SolverConfig(panel_forward=32, panel_backward=64)
    w, z = distributed_eigen_h(a, mesh, config=cfg)
    r = checks.residual_check(a, z, w)
    o = checks.orthogonality_check(z)
    assert r.passed and o.passed, (r, o)
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(np.sort(np.asarray(w)), w_ref, atol=1e-8)


@pytest.mark.slow
def test_distributed_eigen_gev_n1024():
    """VERDICT r4 item 7: distributed GEV at four-digit n on the CPU mesh
    — thresholds, eigenvalues vs scipy, bitwise double-run, and the
    with_info telemetry (unified gev_flop_model + merged COMM_STAT,
    reference: KMATH_EIGEN_GEV_1.F:117-150)."""
    import scipy.linalg

    from eigenexa_tpu.parallel.distributed import distributed_eigen_gev
    from eigenexa_tpu.solvers.gev import gev_flop_model

    n = 1024
    rng = np.random.default_rng(17)
    a = rng.standard_normal((n, n))
    a = jnp.asarray((a + a.T) / 2)
    f = rng.standard_normal((n, n)) / np.sqrt(n)
    b = jnp.asarray(f @ f.T + np.eye(n))
    mesh = build_mesh(devices=jax.devices()[:8], shape=(4, 2))
    cfg = SolverConfig(panel_forward=32, panel_backward=64)
    w, z, info = distributed_eigen_gev(a, b, mesh, config=cfg,
                                       with_info=True)
    r = checks.gev_residual_check(a, b, z, w)
    bo = checks.b_orthogonality_check(z, b)
    assert r.passed and bo.passed, (r, bo)
    w_ref = scipy.linalg.eigh(np.asarray(a), np.asarray(b),
                              eigvals_only=True)
    np.testing.assert_allclose(np.sort(np.asarray(w)), w_ref, atol=5e-9)
    # telemetry contract
    assert info.flops == gev_flop_model(n, n, "A")
    assert info.elapsed > 0
    assert info.comm_stats is not None and info.comm_stats.total_count() > 0
    assert info.comm_time > 0
    # bitwise double-run (reference contract, benchmark_h double-run)
    w2, z2 = distributed_eigen_gev(a, b, mesh, config=cfg)
    assert bool(jnp.array_equal(w, w2))
    assert bool(jnp.array_equal(z, z2))
