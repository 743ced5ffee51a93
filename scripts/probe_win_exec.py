"""Stage-by-stage execution probe for large-n windowed TRD on the chip.

Usage: python scripts/probe_win_exec.py [n] [--trd]
Runs matgen+scaling (always), then the windowed TRD when --trd is given.
Prints a timestamped line after every sync so a crash is attributable.
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 32768
    from eigenexa_tpu.solvers.solver import matrix_scaling
    from eigenexa_tpu.testing.matgen import frank
    from eigenexa_tpu.utils.sync import device_sync

    log(f"n={n} backend={jax.default_backend()}")
    a = frank(n, dtype=jnp.float32)
    device_sync(a)
    log("frank done")
    a_s, sigma = jax.jit(matrix_scaling, donate_argnums=(0,))(a)
    del a
    device_sync(sigma)
    log(f"scaling done sigma={float(sigma):.3g}")
    stats = jax.devices()[0].memory_stats() or {}
    log(f"memstats={ {k: v for k, v in stats.items() if 'bytes' in k} }")
    if "--trd" not in sys.argv:
        return
    from eigenexa_tpu.ops.householder import tridiagonalize

    t0 = time.perf_counter()
    trd = tridiagonalize(a_s, nb=64, impl="windowed", donate=True)
    del a_s
    device_sync(trd.d)
    log(f"TRD done in {time.perf_counter()-t0:.1f} s (incl compile)")
    log(f"d[:3]={trd.d[:3]}  e[:3]={trd.e[:3]}")
    t0 = time.perf_counter()
    import numpy as np

    s = float(jnp.sum(trd.d))
    log(f"sum(d)={s:.6g} fetch {time.perf_counter()-t0:.2f} s")
    # tridiagonal eigenvalue sanity vs the analytic Frank spectrum: the
    # similarity transform preserves the spectrum, so eigvalsh of (d, e)
    # must match frank's analytic eigenvalues to f32 backward error
    from eigenexa_tpu.testing.checks import eigenvalue_check_scaled
    from eigenexa_tpu.testing.matgen import frank_spectrum
    import scipy.linalg

    d_h = np.asarray(trd.d, np.float64)
    e_h = np.asarray(trd.e, np.float64)
    w = scipy.linalg.eigh_tridiagonal(d_h, e_h, eigvals_only=True)
    chk = eigenvalue_check_scaled(w / float(sigma), frank_spectrum(n))
    log(f"w_scaled check: {chk.value:.2f} {chk.status()}")


if __name__ == "__main__":
    main()
