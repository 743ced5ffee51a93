"""Four-digit-n f64 w_test on the real TPU chip (VERDICT r3 item 8).

Exercises the TRUE reference w_test contract (max of relative and
absolute eigenvalue error < √ε_f64, benchmark/w_test.f:141-160) on TPU
at n ≥ 1024: f64 on this backend is emulated (double-single), the D&C
stage takes the host-orchestrated path (numpy secular core + device GEMM
cascades — solvers/dc_host.py), and the result is checked against the
analytic Frank spectrum.

Usage: python scripts/w_test_f64_chip.py [n]   (default 1024)
"""

import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    from eigenexa_tpu.runtime import SolverConfig, eigen_init
    from eigenexa_tpu.solvers.solver import eigen_s
    from eigenexa_tpu.testing.checks import (eigenvalue_check,
                                             orthogonality_check,
                                             residual_check)
    from eigenexa_tpu.testing.matgen import frank, frank_spectrum

    print(f"backend={jax.default_backend()} n={n} dtype=float64",
          flush=True)
    ctx = eigen_init(mesh=None, config=SolverConfig(panel_forward=64,
                                                    panel_backward=128))
    a = frank(n, dtype=jnp.float64)
    w_true = frank_spectrum(n)

    t0 = time.perf_counter()
    w, z, info = eigen_s(a, ctx=ctx)
    print(f"solve: {time.perf_counter() - t0:.2f} s "
          f"(info.elapsed {info.elapsed:.2f} s)", flush=True)

    r = residual_check(a, z, w)
    o = orthogonality_check(z)
    wt = eigenvalue_check(w, w_true)
    print(f"residual      : {r.value:.4g}  {r.status()}")
    print(f"orthogonality : {o.value:.4g}  {o.status()}")
    print(f"w_test (f64 √ε contract): {wt.value:.4g}  {wt.status()}")
    ok = r.passed and o.passed and not wt.hard_fail
    print("OVERALL:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
