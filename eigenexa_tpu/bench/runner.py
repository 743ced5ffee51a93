"""Input-file-driven benchmark runner — the `eigenexa_benchmark` analogue.

Mirrors the reference benchmark program (reference: benchmark/main2.f:80):
the same input-line format

    N  nvec  bx  by  mode  matrix  solver  [check]

    mode   : 0 eigenvalues only | 1 eigenpairs | 2 eigenpairs + eigenvalue
             refinement  (main2.f maps these to driver modes N/A/X and the
             stage-isolation letters via `nall` — :243-258)
    matrix : 0..10 (see testing/matgen.py), lines starting with '!' are
             comments
    solver : 0 eigen_sx | 1 eigen_s

and the same report: config, timing, model GFLOPS, comm fraction, and
PASS/CAUTION/FAIL lines from the ev_test/w_test acceptance checks.

Usage:  python -m eigenexa_tpu.bench.runner [-f INPUT] [-n N] [--mtype K]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import Optional

import jax
import jax.numpy as jnp

import eigenexa_tpu as ex
from eigenexa_tpu.runtime import SolverConfig
from eigenexa_tpu.testing import (
    MATRIX_TYPES,
    eigenvalue_check,
    mat_set,
    orthogonality_check,
    residual_check,
)

# input `nall` 0..6 -> driver modes (reference: benchmark/main2.f:243-258)
MODE_MAP = {0: "N", 1: "A", 2: "X", 3: "S", 4: "T", 5: "C", 6: "R"}


@dataclasses.dataclass
class BenchCase:
    n: int
    nvec: int
    bx: int = 64
    by: int = 128
    mode: int = 1
    mtype: int = 0
    solver: int = 1   # 0 = eigen_sx, 1 = eigen_s (reference convention)

    @classmethod
    def parse(cls, line: str) -> Optional["BenchCase"]:
        line = line.strip()
        if not line or line.startswith("!") or line.startswith("#"):
            return None
        parts = line.split()
        vals = [int(p) for p in parts[:7]]
        if vals[0] <= 0:
            return None  # reference: N<=0 terminates the loop (main2.f)
        while len(vals) < 7:
            vals.append([0, 0, 64, 128, 1, 0, 1][len(vals)])
        return cls(n=vals[0], nvec=vals[1] or vals[0], bx=vals[2] or 64,
                   by=vals[3] or 128, mode=vals[4], mtype=vals[5],
                   solver=vals[6])


def run_case(case: BenchCase, ctx=None, dtype=None, w_file=None,
             printer=print, profile: bool = False, mesh=None) -> dict:
    """Run one benchmark line; returns the structured report dict
    (the reference prints this block from main2.f:420-480).

    profile=True adds the per-stage TRD-BLK/D&C/TRDBAK block
    (src/eigen_s.F:180-276); mesh routes eigen_s/eigen_sx through the
    distributed drivers (the reference's -x dimX dimY Cart option,
    main2.f:152-197)."""
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    ctx = ctx or ex.eigen_init(config=SolverConfig(
        panel_forward=case.bx, panel_backward=case.by))
    mode = MODE_MAP.get(case.mode, "A")
    a, w_true = mat_set(case.n, case.mtype, dtype=dtype, w_file=w_file)
    if case.solver == 0:
        solver_fn, solver_name = ex.eigen_sx, "eigen_sx"
    elif case.solver == 2:
        solver_fn, solver_name = ex.eigen_h, "eigen_h"
    elif case.solver == 3:
        return _run_gev_case(case, a, ctx, dtype, printer, mesh=mesh)
    else:
        solver_fn, solver_name = ex.eigen_s, "eigen_s"

    if mesh is not None and mesh.size > 1 and solver_name in (
            "eigen_s", "eigen_sx") and mode in ("N", "A", "X", "S", "T",
                                                "C"):
        return _run_mesh_case(case, a, w_true, mesh, mode, solver_name,
                              dtype, printer)

    if mode == "R" and solver_name != "eigen_h":
        # stage-resume: reduce, dump D/E(/F) data, then solve D&C-only from
        # the files (reference: eigen_sx.F:175-193 R-mode file protocol)
        import tempfile

        from eigenexa_tpu.utils.stageio import save_stage_data

        with tempfile.TemporaryDirectory() as td:
            if solver_name == "eigen_sx":
                from eigenexa_tpu.ops.band import band2_reduce

                red = band2_reduce(a, nb=case.bx)
                save_stage_data(td, red.d, red.e1, red.e2)
            else:
                from eigenexa_tpu.ops.householder import tridiagonalize

                red = tridiagonalize(a, nb=case.bx)
                save_stage_data(td, red.d, red.e)
            w, z, info = solver_fn(a, nvec=case.nvec, mode="R", ctx=ctx,
                                   stage_data=td)
    else:
        kw = {"profile": True} if (profile and solver_name in
                                   ("eigen_s", "eigen_sx")) else {}
        w, z, info = solver_fn(a, nvec=case.nvec, mode=mode, ctx=ctx, **kw)

    report = {
        "n": case.n,
        "nvec": case.nvec,
        "mode": mode,
        "matrix": MATRIX_TYPES.get(case.mtype, str(case.mtype)),
        "solver": solver_name,
        "grid": f"{ctx.x_nnod}x{ctx.y_nnod}",
        "dtype": jnp.dtype(dtype).name,
        "elapsed_s": round(info.elapsed, 4),
        "model_flops": info.flops,
        "model_gflops": round(info.gflops, 2),
        "comm_s": info.comm_time,
        "checks": {},
    }
    # ev_test / w_test (reference: benchmark/ev_test.f, w_test.f);
    # orthogonality also runs in the stage-isolation modes S/T/R
    # (reference: ev_test.f:194-195)
    hard_fail = False
    if z is not None and mode in ("A", "X"):
        a_check, _ = mat_set(case.n, case.mtype, dtype=dtype, w_file=w_file)
        r = residual_check(a_check, z, w, case.nvec)
        report["checks"]["residual"] = {"value": r.value,
                                        "status": r.status()}
        hard_fail |= r.hard_fail
    if z is not None and mode in ("A", "X", "S", "T", "R"):
        o = orthogonality_check(z, case.nvec)
        report["checks"]["orthogonality"] = {"value": o.value,
                                             "status": o.status()}
        hard_fail |= o.hard_fail
    if w_true is not None and mode in ("N", "A", "X"):
        e_chk = eigenvalue_check(w, w_true)
        report["checks"]["eigenvalues"] = {"value": e_chk.value,
                                           "status": e_chk.status()}

    if info.stages:
        report["stages"] = {
            k: {"seconds": round(v["seconds"], 4),
                "gflops": round(v["flops"] / v["seconds"] / 1e9, 2)
                if v["seconds"] > 0 else 0.0}
            for k, v in info.stages.items()
        }
    if printer is not None:
        printer(f"--- {solver_name}  N={case.n} nvec={case.nvec} "
                f"mode={mode} matrix={report['matrix']} "
                f"grid={report['grid']} dtype={report['dtype']}")
        printer(f"    elapsed {report['elapsed_s']} s   "
                f"model {report['model_gflops']} GFLOP/s")
        if info.stages:
            info.stage_report(lambda s: printer("   " + s))
        for name, chk in report["checks"].items():
            printer(f"    *** {name:13s} *** : {chk['status']}  "
                    f"({chk['value']:.4g})")
    report["hard_fail"] = hard_fail
    return report


def _run_mesh_case(case, a, w_true, mesh, mode, solver_name, dtype,
                   printer) -> dict:
    """Distributed benchmark line over an explicit mesh shape — the
    process-topology option of the reference benchmark
    (-x dimX dimY / -g grid modes, main2.f:152-197)."""
    from eigenexa_tpu.parallel.distributed import (distributed_eigen_s,
                                                   distributed_eigen_sx)
    from eigenexa_tpu.parallel.mesh import mesh_shape

    cfg = SolverConfig(panel_forward=case.bx, panel_backward=case.by)
    solver = (distributed_eigen_sx if solver_name == "eigen_sx"
              else distributed_eigen_s)
    w, z, info = solver(a, mesh, nvec=case.nvec, mode=mode, config=cfg,
                        with_info=True)
    px, py = mesh_shape(mesh)
    report = {
        "n": case.n, "nvec": case.nvec, "mode": mode,
        "matrix": MATRIX_TYPES.get(case.mtype, str(case.mtype)),
        "solver": solver_name + " (distributed)",
        "grid": f"{px}x{py}",
        "dtype": jnp.dtype(dtype).name,
        "elapsed_s": round(info.elapsed, 4),
        "model_flops": info.flops,
        "model_gflops": round(info.gflops, 2),
        "comm_s": round(info.comm_time, 6),
        "comm_stat": (info.comm_stats.report() if info.comm_stats
                      else {}),
        "checks": {},
    }
    hard_fail = False
    if z is not None and mode in ("A", "X"):
        r = residual_check(a, z, w, case.nvec)
        report["checks"]["residual"] = {"value": r.value,
                                        "status": r.status()}
        hard_fail |= r.hard_fail
    if z is not None and mode in ("A", "X", "S", "T"):
        o = orthogonality_check(z, case.nvec)
        report["checks"]["orthogonality"] = {"value": o.value,
                                             "status": o.status()}
        hard_fail |= o.hard_fail
    if w_true is not None and mode in ("N", "A", "X"):
        e_chk = eigenvalue_check(w, w_true)
        report["checks"]["eigenvalues"] = {"value": e_chk.value,
                                           "status": e_chk.status()}
    if printer is not None:
        printer(f"--- {report['solver']}  N={case.n} nvec={case.nvec} "
                f"mode={mode} matrix={report['matrix']} "
                f"grid={report['grid']} dtype={report['dtype']}")
        printer(f"    elapsed {report['elapsed_s']} s   "
                f"model {report['model_gflops']} GFLOP/s   "
                f"comm {report['comm_s']} s")
        if info.comm_stats is not None:
            # COMM_STAT block (reference: eigen_timer_print,
            # src/eigen_devel.F:440-526)
            from eigenexa_tpu.parallel.distributed import _mesh_overheads

            lat, per_byte = _mesh_overheads(mesh)
            for line in info.comm_stats.stat_block(lat, per_byte):
                printer("    " + line)
        for name, chk in report["checks"].items():
            printer(f"    *** {name:13s} *** : {chk['status']}  "
                    f"({chk['value']:.4g})")
    report["hard_fail"] = hard_fail
    return report


def run_independent(case: BenchCase, k: int, mesh, dtype=None,
                    printer=print) -> dict:
    """`-g A` analogue: k independent solves of the same problem class,
    one per device (reference: main2.f:163-174, MPI_COMM_SELF grid)."""
    from eigenexa_tpu.parallel.distributed import independent_solves

    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    mats, trues = [], []
    for i in range(k):
        a, w_true = mat_set(case.n, case.mtype, dtype=dtype,
                            key=jax.random.PRNGKey(i))
        mats.append(a)
        trues.append(w_true)
    batch = jnp.stack(mats)
    import time as _t

    t0 = _t.perf_counter()
    w, z = independent_solves(batch, mesh, nvec=case.nvec,
                              mode=MODE_MAP.get(case.mode, "A"))
    jax.block_until_ready(z if z is not None else w)
    elapsed = _t.perf_counter() - t0
    checks = []
    hard_fail = False
    for i in range(k):
        if z is not None:
            r = residual_check(mats[i], z[i], w[i], case.nvec)
            o = orthogonality_check(z[i], case.nvec)
            checks.append({"residual": r.status(),
                           "orthogonality": o.status()})
            hard_fail |= r.hard_fail or o.hard_fail
        elif trues[i] is not None:
            e_chk = eigenvalue_check(w[i], trues[i])
            checks.append({"eigenvalues": e_chk.status()})
    report = {"n": case.n, "k": k, "mode": MODE_MAP.get(case.mode, "A"),
              "solver": "eigen_s (independent x%d)" % k,
              "elapsed_s": round(elapsed, 4), "checks": checks,
              "hard_fail": hard_fail}
    if printer is not None:
        printer(f"--- independent x{k}  N={case.n} "
                f"elapsed {report['elapsed_s']} s")
        for i, c in enumerate(checks):
            printer(f"    [{i}] " + "  ".join(f"{k2}: {v}"
                                              for k2, v in c.items()))
    return report


def _run_gev_case(case: BenchCase, a, ctx, dtype, printer,
                  mesh=None) -> dict:
    """Generalized-problem benchmark line (solver=3): A from `matrix`,
    B positive-definite with a designed spectrum in [1, 2] — mirroring the
    reference GEV benchmark's random-A / W.dat-spectrum-B setup
    (reference: benchmark/KMATH_EIGEN_GEV_main.f:50, _check.f).

    Modes N (eigenvalues only) and A (eigenpairs) are honored through
    eigen_gev's mode argument; other stage-isolation modes are not
    meaningful for the composed algorithm and run as mode A with a note
    (reference KMATH_EIGEN_GEV.F has no mode argument at all)."""
    import jax.numpy as _jnp

    from eigenexa_tpu.solvers.gev import eigen_gev
    from eigenexa_tpu.testing.checks import (b_orthogonality_check,
                                             gev_residual_check)
    from eigenexa_tpu.testing.matgen import designed

    mode = MODE_MAP.get(case.mode, "A")
    if mode not in ("A", "N"):
        if printer is not None:
            printer(f"    (GEV supports modes A/N only; input mode "
                    f"{mode!r} run as 'A' — reference KMATH_EIGEN_GEV.F "
                    f"has no mode argument)")
        mode = "A"
    b = designed(_jnp.linspace(1.0, 2.0, case.n), dtype=dtype)
    if mesh is not None and mesh.size > 1:
        # distributed GEV over the explicit mesh (-x dimX dimY analogue);
        # with_info fills elapsed + the unified gev_flop_model + the
        # merged COMM_STAT of the two inner solves
        from eigenexa_tpu.parallel.distributed import distributed_eigen_gev
        from eigenexa_tpu.runtime import SolverConfig as _SC

        w, z, info = distributed_eigen_gev(
            a, b, mesh, nvec=case.nvec, mode=mode,
            config=_SC(panel_forward=case.bx, panel_backward=case.by),
            with_info=True)
    else:
        w, z, info = eigen_gev(a, b, nvec=case.nvec, mode=mode, ctx=ctx)
    if mode == "N":
        report = {
            "n": case.n, "nvec": 0, "mode": "N",
            "matrix": MATRIX_TYPES.get(case.mtype, str(case.mtype)),
            "solver": "eigen_gev",
            "grid": f"{ctx.x_nnod}x{ctx.y_nnod}",
            "dtype": jnp.dtype(dtype).name,
            "elapsed_s": round(info.elapsed, 4),
            "checks": {}, "hard_fail": False,
        }
        if printer is not None:
            printer(f"--- eigen_gev  N={case.n} mode=N "
                    f"elapsed {report['elapsed_s']} s")
        return report
    r = gev_residual_check(a, b, z, w, case.nvec)
    o = b_orthogonality_check(z, b, case.nvec)
    report = {
        "n": case.n,
        "nvec": case.nvec,
        "mode": "A",
        "matrix": MATRIX_TYPES.get(case.mtype, str(case.mtype)),
        "solver": "eigen_gev",
        "grid": f"{ctx.x_nnod}x{ctx.y_nnod}",
        "dtype": jnp.dtype(dtype).name,
        "elapsed_s": round(info.elapsed, 4),
        "model_flops": info.flops,
        "model_gflops": round(info.gflops, 2),
        "comm_s": info.comm_time,
        "comm_stat": (info.comm_stats.report() if info.comm_stats
                      else {}),
        "checks": {
            "gev_residual": {"value": r.value, "status": r.status()},
            "b_orthogonality": {"value": o.value, "status": o.status()},
        },
        "hard_fail": r.hard_fail or o.hard_fail,
    }
    if printer is not None:
        printer(f"--- eigen_gev  N={case.n} nvec={case.nvec} "
                f"matrix={report['matrix']} grid={report['grid']} "
                f"dtype={report['dtype']}")
        printer(f"    elapsed {report['elapsed_s']} s   "
                f"model {report['model_gflops']} GFLOP/s"
                + (f"   comm {round(info.comm_time, 6)} s"
                   if info.comm_stats else ""))
        if info.comm_stats is not None:
            # COMM_STAT block (reference: eigen_timer_print,
            # src/eigen_devel.F:440-526)
            from eigenexa_tpu.parallel.distributed import _mesh_overheads

            lat, per_byte = _mesh_overheads(mesh)
            for line in info.comm_stats.stat_block(lat, per_byte):
                printer("    " + line)
        for name, chk in report["checks"].items():
            printer(f"    *** {name:15s} *** : {chk['status']}  "
                    f"({chk['value']:.4g})")
    return report


def run_input_file(path: str, ctx=None, dtype=None, printer=print,
                   profile: bool = False, mesh=None):
    """Loop over benchmark input lines (reference: main2.f input loop).
    Returns list of reports; raises SystemExit on a hard accuracy failure
    (the reference calls MPI_Abort, ev_test.f:215)."""
    reports = []
    with open(path) as f:
        for line in f:
            case = BenchCase.parse(line)
            if case is None:
                continue
            rep = run_case(case, ctx=ctx, dtype=dtype, printer=printer,
                           profile=profile, mesh=mesh)
            reports.append(rep)
            if rep["hard_fail"]:
                raise SystemExit("hard accuracy failure — aborting "
                                 "(reference behavior: ev_test MPI_Abort)")
    return reports


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-f", "--input", help="benchmark input file (IN format)")
    p.add_argument("-n", type=int, default=1000)
    p.add_argument("--nvec", type=int, default=0)
    p.add_argument("--mode", type=int, default=1, choices=[0, 1, 2])
    p.add_argument("--mtype", type=int, default=0,
                   help="matrix type 0..10, or -1/-2 for Matrix-Market "
                        "A.mtx/B.mtx in the working directory "
                        "(reference: mat_set.f:220-245)")
    p.add_argument("--solver", type=int, default=1, choices=[0, 1, 2, 3])
    p.add_argument("--f64", action="store_true",
                   help="force float64 (enables x64)")
    p.add_argument("--profile", action="store_true",
                   help="per-stage TRD-BLK/D&C/TRDBAK timing block "
                        "(reference: eigen_s.F:180-276)")
    p.add_argument("-x", "--mesh", type=int, nargs=2, metavar=("PX", "PY"),
                   help="run distributed over an explicit PX x PY device "
                        "mesh (reference: main2.f -x dimX dimY)")
    p.add_argument("-g", "--independent", type=int, metavar="K",
                   help="K independent solves, one per device "
                        "(reference: main2.f -g A / -g k grid modes)")
    p.add_argument("-L", "--list-matrices", action="store_true")
    args = p.parse_args(argv)

    if args.list_matrices:
        for k, v in MATRIX_TYPES.items():
            print(f"  {k:3d} : {v}")
        return 0
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    mesh = None
    if args.mesh or args.independent:
        from eigenexa_tpu.parallel.mesh import build_mesh

        shape = tuple(args.mesh) if args.mesh else None
        ndev = (shape[0] * shape[1]) if shape else len(jax.devices())
        mesh = build_mesh(devices=jax.devices()[:ndev], shape=shape)
    if args.independent:
        case = BenchCase(n=args.n, nvec=args.nvec or args.n, mode=args.mode,
                         mtype=args.mtype, solver=args.solver)
        run_independent(case, args.independent, mesh)
        return 0
    if args.input:
        run_input_file(args.input, profile=args.profile, mesh=mesh)
    else:
        case = BenchCase(n=args.n, nvec=args.nvec or args.n, mode=args.mode,
                         mtype=args.mtype, solver=args.solver)
        run_case(case, profile=args.profile, mesh=mesh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
