"""Benchmark entry: full symmetric eigensolve on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The reference ships no stored numbers (BASELINE.md), so `vs_baseline` is
the speedup of this framework over the incumbent on the same hardware —
jax.numpy.linalg.eigh (XLA's built-in eigensolver) on an identical matrix.
Beating it means a user gets a faster eigh by switching to this framework.

Env knobs: BENCH_N (default 8192), BENCH_DTYPE (f32), BENCH_NB (64).
"""

import json
import os
import time

import jax

# mixed-precision contract: secular/eigenvalue math runs in (emulated) f64
# even when matrices are f32
jax.config.update("jax_enable_x64", True)
# the TPU backend's compile times are large for the D&C merge graphs; the
# persistent cache amortizes them across runs/rounds
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    n = int(os.environ.get("BENCH_N", "8192"))
    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        os.environ.get("BENCH_DTYPE", "f32")
    ]
    nb = int(os.environ.get("BENCH_NB", "64"))

    from eigenexa_tpu.runtime import SolverConfig, eigen_init
    from eigenexa_tpu.solvers.solver import eigen_s, eigen_sx
    from eigenexa_tpu.testing.checks import orthogonality_check, residual_check
    from eigenexa_tpu.testing.matgen import frank, frank_spectrum

    dev = jax.devices()[0]
    ctx = eigen_init(
        mesh=None,
        config=SolverConfig(panel_forward=nb, panel_backward=128),
    )

    # Frank matrix: analytically known spectrum, so the bench runs the
    # full w_test contract on chip (reference: benchmark/w_test.f via
    # w_set, mat_set.f:606), not just residual/orthogonality
    a = jax.device_put(frank(n, dtype=dtype), dev)
    w_true = frank_spectrum(n)  # f64 on host

    # All timings force a dependent scalar fetch: block_until_ready lies on
    # the axon tunnel backend (returns before execution completes), see
    # eigenexa_tpu/utils/sync.py.
    from eigenexa_tpu.utils.sync import device_sync

    # both one-stage paths, best-of-3 each after a compile warmup; the
    # faster is the flagship (measured r04: the band-2 eigen_sx reads the
    # trailing matrix once per column PAIR and beats the tridiagonal
    # eigen_s ~1.25x at n=8192 — the reason eigen_sx exists,
    # src/eigen_prd_t2.F:90)
    from eigenexa_tpu.testing.checks import eigenvalue_check_scaled

    solver_times = {}
    results = {}
    passing = {}
    for name, solver in (("eigen_sx", eigen_sx), ("eigen_s", eigen_s)):
        w, z, info = solver(a, ctx=ctx)
        t_best = float("inf")
        for _ in range(3):
            w, z, info = solver(a, ctx=ctx)
            t_best = min(t_best, info.elapsed)
        solver_times[name] = t_best
        results[name] = (w, z)
        passing[name] = bool(
            residual_check(a, z, w).passed
            and orthogonality_check(z).passed
            and eigenvalue_check_scaled(w, w_true).passed)
    # flagship = fastest path whose checks ALL pass (fastest overall if
    # none do — the checks are re-reported below either way)
    candidates = [k for k in solver_times if passing[k]] or \
        list(solver_times)
    flagship = min(candidates, key=solver_times.get)
    t_ours = solver_times[flagship]
    w, z = results[flagship]
    flag_solver = eigen_sx if flagship == "eigen_sx" else eigen_s

    # incumbent: jnp.linalg.eigh on the same chip, same sync discipline
    eigh = jax.jit(jnp.linalg.eigh)
    wx, zx = eigh(a)
    device_sync(wx, zx)
    t_xla = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        wx, zx = eigh(a)
        device_sync(wx, zx)
        t_xla = min(t_xla, time.perf_counter() - t0)

    r = residual_check(a, z, w)
    o = orthogonality_check(z)

    # eigenvalue error vs the analytic Frank spectrum, using the named
    # backward-stability-scaled criterion (checks.eigenvalue_check_scaled
    # documents why the strict √ε w_test contract is f64-only; both
    # criteria are recorded in BASELINE.md).  The strict f64 contract
    # runs in tests/ and on chip via scripts/w_test_f64_chip.py.
    import numpy as np

    w_chk = eigenvalue_check_scaled(w, w_true)
    w_err = float(np.max(np.abs(np.sort(np.asarray(w, dtype=np.float64))
                                - np.asarray(w_true))))
    w_err_scaled = w_chk.value

    # run-to-run bitwise reproducibility (reference headline contract:
    # benchmark_h/bench_eigen_h.f double-run compare — max|w−w'| and
    # max|z−z'| must be exactly 0)
    # compared on-device (full d2h of z would cost seconds on the tunnel)
    w2, z2, _ = flag_solver(a, ctx=ctx)
    repro = bool(jnp.array_equal(w, w2)) and bool(jnp.array_equal(z, z2))
    model_flops = (4.0 / 3.0 + 2.0) * n**3  # TRD + TRBAK models (ref counts)

    # large-n extra: the n=16384 whole solve (windowed TRD + per-level
    # D&C + static-chunk TRBAK).  Only attempted when the persistent
    # compile cache looks warm — a cold compile at 16384 is ~20 min and
    # must not blow the bench budget.  BENCH_LARGE=0 disables, =1 forces.
    large = {}
    want_large = os.environ.get("BENCH_LARGE", "auto")
    cache_warm = False
    try:
        cache_warm = len(os.listdir(_cache)) > 100
    except OSError:
        pass
    if n == 8192 and dtype == jnp.float32 and want_large != "0" and (
            want_large == "1" or cache_warm):
        try:
            n_l = 16384
            w_l, z_l, info_l = eigen_s(frank(n_l, dtype=jnp.float32),
                                       ctx=ctx)
            w_l, z_l, info_l = eigen_s(frank(n_l, dtype=jnp.float32),
                                       ctx=ctx)
            wt_l = frank_spectrum(n_l)
            a_l = frank(n_l, dtype=jnp.float32)
            r_l = residual_check(a_l, z_l, w_l)
            o_l = orthogonality_check(z_l)
            wc_l = eigenvalue_check_scaled(w_l, wt_l)
            large = {
                "n16384_time_s": round(info_l.elapsed, 3),
                "n16384_model_gflops": round(
                    (4.0 / 3.0 + 2.0) * n_l ** 3 / info_l.elapsed / 1e9,
                    1),
                "n16384_pass": bool(r_l.passed and o_l.passed
                                    and wc_l.passed),
            }
            del a_l, z_l
        except Exception as e:  # pragma: no cover - report, don't fail
            large = {"n16384_error": str(e)[:120]}
        # the BASELINE-tracked size: n=32768 full-spectrum on one chip
        # (r05).  Warm-cache only; checks are column-streamed so
        # A + Z + A·Z never coexist on the 16 GB chip.  Every n=8192
        # device array is dropped first — ~2 GB of pinned buffers is the
        # difference between fitting and RESOURCE_EXHAUSTED at 32k.
        try:
            del results, w, z, w2, z2, wx, zx, a
            n_x = 32768
            w_x, z_x, info_x = eigen_s(frank(n_x, dtype=jnp.float32),
                                       ctx=ctx)
            del w_x, z_x
            w_x, z_x, info_x = eigen_s(frank(n_x, dtype=jnp.float32),
                                       ctx=ctx)
            a_x = frank(n_x, dtype=jnp.float32)
            r_x = residual_check(a_x, z_x, w_x, col_chunk=4096)
            del a_x
            o_x = orthogonality_check(z_x, col_chunk=4096)
            wc_x = eigenvalue_check_scaled(w_x, frank_spectrum(n_x))
            large.update({
                "n32768_time_s": round(info_x.elapsed, 3),
                "n32768_model_gflops": round(
                    (4.0 / 3.0 + 2.0) * n_x ** 3 / info_x.elapsed / 1e9,
                    1),
                "n32768_pass": bool(r_x.passed and o_x.passed
                                    and wc_x.passed),
            })
            del z_x
        except Exception as e:  # pragma: no cover - report, don't fail
            large["n32768_error"] = str(e)[:120]
    print(
        json.dumps(
            {
                "metric": f"eigh_n{n}_{jnp.dtype(dtype).name}_time",
                "value": round(t_ours, 4),
                "unit": "s",
                "vs_baseline": round(t_xla / t_ours, 3),
                "extra": {
                    "flagship": flagship,
                    "eigen_s_s": round(solver_times["eigen_s"], 4),
                    "eigen_sx_s": round(solver_times["eigen_sx"], 4),
                    "xla_eigh_s": round(t_xla, 4),
                    "model_gflops": round(model_flops / t_ours / 1e9, 1),
                    "residual": round(r.value, 2),
                    "orthogonality": round(o.value, 2),
                    "w_err_abs": float(f"{w_err:.3g}"),
                    "w_err_scaled": round(w_err_scaled, 2),
                    "residual_pass": bool(r.passed),
                    "ortho_pass": bool(o.passed),
                    "w_pass": bool(w_chk.passed),
                    "repro_bitwise": repro,
                    "device": str(dev),
                    **large,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
