"""Large-n whole-solve benchmark on the real chip (VERDICT r3 item 1).

Runs the full eigen_s (or eigen_sx with --sx) at n ≥ 16384 f32: windowed
TRD (fixed-buffer, ~2n² live), per-level-dispatched D&C with
panel-chunked top merges, chunk+scan WY back-transform.  Reports stage
split, acceptance checks, and peak-memory notes.

Usage: python scripts/bench_large.py [n] [--sx] [--profile]
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 16384
    use_sx = "--sx" in sys.argv
    profile = "--profile" in sys.argv

    from eigenexa_tpu.runtime import SolverConfig, eigen_init
    from eigenexa_tpu.solvers.solver import eigen_s, eigen_sx
    from eigenexa_tpu.testing.checks import (eigenvalue_check_scaled,
                                             orthogonality_check,
                                             residual_check)
    from eigenexa_tpu.testing.matgen import frank, frank_spectrum

    solver = eigen_sx if use_sx else eigen_s
    name = "eigen_sx" if use_sx else "eigen_s"
    print(f"{name} n={n} f32 backend={jax.default_backend()}", flush=True)
    ctx = eigen_init(mesh=None, config=SolverConfig(panel_forward=64,
                                                    panel_backward=128))
    w_true = frank_spectrum(n)

    # the matrix is passed as a TEMPORARY (the solver frees the unscaled
    # copy mid-solve — one fewer n² buffer at 32k) and regenerated for
    # the checks afterwards
    t0 = time.perf_counter()
    w, z, info = solver(frank(n, dtype=jnp.float32), ctx=ctx,
                        profile=profile)
    print(f"first solve (incl. compile): {time.perf_counter()-t0:.1f} s "
          f"(info.elapsed {info.elapsed:.2f} s)", flush=True)
    if profile and info.stages:
        for k, v in info.stages.items():
            print(f"  {k}: {v['seconds']:.3f} s", flush=True)

    # warm re-run for the honest number (drop the first solve's Z first:
    # at 32k a lingering n² buffer OOMs the next solve); with --profile
    # the warm run is staged too, so the split excludes compile/cache-
    # deserialization costs
    del w, z
    w, z, info = solver(frank(n, dtype=jnp.float32), ctx=ctx,
                        profile=profile)
    if profile and info.stages:
        for k, v in info.stages.items():
            print(f"  warm {k}: {v['seconds']:.3f} s", flush=True)
    model_flops = (4.0 / 3.0 + 2.0) * n ** 3
    print(f"warm solve: {info.elapsed:.3f} s  "
          f"model {model_flops/info.elapsed/1e9:.0f} GFLOP/s", flush=True)

    a = frank(n, dtype=jnp.float32)
    # column-streamed checks: at n=32k, A + Z + the A·Z product would
    # exceed the 15.75 GB HBM in one shot
    cc = 4096 if n >= 32768 else 0
    r = residual_check(a, z, w, col_chunk=cc)
    del a  # one fewer n² buffer for the Gram pass
    o = orthogonality_check(z, col_chunk=cc)
    wchk = eigenvalue_check_scaled(w, w_true)
    print(f"residual {r.value:.3f} {r.status()} | "
          f"ortho {o.value:.3f} {o.status()} | "
          f"w_scaled {wchk.value:.2f} {wchk.status()}", flush=True)


if __name__ == "__main__":
    main()
