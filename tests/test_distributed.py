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
