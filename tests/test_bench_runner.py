import jax.numpy as jnp

from eigenexa_tpu.bench.runner import BenchCase, run_case
from eigenexa_tpu.utils.profiler import Profiler


def test_parse():
    assert BenchCase.parse("! comment") is None
    assert BenchCase.parse("") is None
    c = BenchCase.parse(" 128 64 32 64 2 4 0 ")
    assert (c.n, c.nvec, c.bx, c.by, c.mode, c.mtype, c.solver) == (
        128, 64, 32, 64, 2, 4, 0)
    assert BenchCase.parse(" 0 0 0 0 0 0 0") is None


def test_run_case_small():
    rep = run_case(BenchCase(n=64, nvec=64, mode=1, mtype=0),
                   dtype=jnp.float64, printer=None)
    assert rep["checks"]["residual"]["status"] == "PASSED"
    assert rep["checks"]["orthogonality"]["status"] == "PASSED"
    assert rep["checks"]["eigenvalues"]["status"] == "PASSED"
    assert not rep["hard_fail"]


def test_run_case_mode0():
    rep = run_case(BenchCase(n=48, nvec=48, mode=0, mtype=0),
                   dtype=jnp.float64, printer=None)
    assert rep["checks"]["eigenvalues"]["status"] == "PASSED"
    assert "residual" not in rep["checks"]


def test_profiler():
    p = Profiler()
    with p.region("a", flops=100.0):
        x = sum(range(1000))
    rows = p.report(printer=None)
    assert rows["a"]["count"] == 1 and rows["a"]["seconds"] > 0


def test_run_case_gev():
    from eigenexa_tpu.bench.runner import BenchCase, run_case

    rep = run_case(BenchCase(n=96, nvec=96, mtype=2, solver=3),
                   printer=None)
    assert rep["solver"] == "eigen_gev"
    assert not rep["hard_fail"]
    assert rep["checks"]["gev_residual"]["status"] == "PASSED"
    assert rep["checks"]["b_orthogonality"]["status"] == "PASSED"
