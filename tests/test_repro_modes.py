"""Run-to-run reproducibility + stage-resume (mode R) + runner modes.

Reference analogues: the double-run bitwise comparison in
benchmark_h/bench_eigen_h.f:73-112 (expected max|w-w'| = max|z-z'| = 0)
and the R-mode file protocol of src/eigen_sx.F:175-193.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import eigenexa_tpu as ex
from eigenexa_tpu.testing.matgen import mat_set


def test_double_run_bitwise_reproducible():
    """Two identical solves must agree BITWISE (deterministic host secular
    core + fixed XLA reduction order — SURVEY.md §4.4)."""
    a, _ = mat_set(96, 0, dtype=jnp.float64)
    w1, z1, _ = ex.eigen_s(a)
    w2, z2, _ = ex.eigen_s(a)
    assert (np.asarray(w1) == np.asarray(w2)).all()
    assert (np.asarray(z1) == np.asarray(z2)).all()


def test_double_run_hermitian_reproducible():
    rng = np.random.default_rng(0)
    n = 48
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = jnp.asarray((h + h.conj().T) / 2, jnp.complex128)
    w1, z1, _ = ex.eigen_h(a)
    w2, z2, _ = ex.eigen_h(a)
    assert (np.asarray(w1) == np.asarray(w2)).all()
    assert (np.asarray(z1) == np.asarray(z2)).all()


def test_mode_r_tridiag(tmp_path):
    """Mode R solves D&C-only from saved D/E data."""
    from eigenexa_tpu.ops.householder import tridiagonalize
    from eigenexa_tpu.utils.stageio import save_stage_data, load_stage_data

    a, _ = mat_set(64, 0, dtype=jnp.float64)
    trd = tridiagonalize(a, nb=16)
    save_stage_data(str(tmp_path), trd.d, trd.e)
    d, e, e2 = load_stage_data(str(tmp_path))
    assert e2 is None
    assert np.allclose(np.asarray(d), np.asarray(trd.d))

    w, z, info = ex.eigen_s(None, mode="R", stage_data=str(tmp_path))
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-10 * np.abs(w_ref).max()
    # z are eigenvectors of T: orthogonality must hold (ev_test.f:194-195)
    g = np.asarray(z).T @ np.asarray(z) - np.eye(z.shape[1])
    assert np.abs(g).max() < 1e-12 * z.shape[0]


def test_mode_r_band2(tmp_path):
    from eigenexa_tpu.ops.band import band2_reduce
    from eigenexa_tpu.utils.stageio import save_stage_data

    a, _ = mat_set(64, 2, dtype=jnp.float64)
    red = band2_reduce(a, nb=8)
    save_stage_data(str(tmp_path), red.d, red.e1, red.e2)
    w, z, info = ex.eigen_sx(None, mode="R", stage_data=str(tmp_path))
    w_ref = np.linalg.eigvalsh(np.asarray(a))
    assert np.abs(np.asarray(w) - w_ref).max() < 1e-10 * max(
        1.0, np.abs(w_ref).max())


@pytest.mark.parametrize("nall,expected", [(0, "N"), (1, "A"), (2, "X"),
                                           (3, "S"), (4, "T"), (5, "C"),
                                           (6, "R")])
def test_runner_mode_map(nall, expected):
    from eigenexa_tpu.bench.runner import MODE_MAP

    assert MODE_MAP[nall] == expected


@pytest.mark.parametrize("nall", [3, 4, 6])
def test_runner_stage_isolation_modes(nall):
    """Runner executes stage-isolation lines end to end with checks."""
    from eigenexa_tpu.bench.runner import BenchCase, run_case

    rep = run_case(BenchCase(n=48, nvec=48, bx=8, by=16, mode=nall,
                             mtype=0, solver=1), printer=None)
    assert not rep["hard_fail"], rep
    if "orthogonality" in rep["checks"]:
        assert rep["checks"]["orthogonality"]["status"] == "PASSED"


def test_runner_eigen_sx_line():
    from eigenexa_tpu.bench.runner import BenchCase, run_case

    rep = run_case(BenchCase(n=64, nvec=64, bx=8, by=16, mode=1,
                             mtype=0, solver=0), printer=None)
    assert not rep["hard_fail"], rep
    assert rep["solver"] == "eigen_sx"
    assert rep["checks"]["residual"]["status"] == "PASSED"
    assert rep["checks"]["eigenvalues"]["status"] == "PASSED"


def test_version_api(capsys):
    from eigenexa_tpu.runtime import eigen_get_version, eigen_show_version

    v, date, name = eigen_get_version()
    assert v and name
    eigen_show_version()
    assert "eigenexa_tpu" in capsys.readouterr().out
