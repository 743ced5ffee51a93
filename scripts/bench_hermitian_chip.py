"""Hermitian n=8192 on the real chip (BASELINE target row).

The axon TPU backend has no complex dtypes, so eigen_h routes through
the real-pair embedding (ops/zreal.py): the 2n×2n [[Ar,−Ai],[Ai,Ar]]
symmetric problem — at n=8192 that is the n=16384 real path (windowed
TRD + per-level D&C + chunked TRBAK).  Checks: Hermitian residual and
orthogonality against the reference thresholds, plus double-run bitwise
reproducibility (benchmark_h/bench_eigen_h.f contract).

Usage: python scripts/bench_hermitian_chip.py [n]
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
import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    from eigenexa_tpu.ops.zreal import ComplexPair
    from eigenexa_tpu.solvers.hermitian import eigen_h

    print(f"eigen_h n={n} (c64 via real-pair embedding) "
          f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h = ((h + h.conj().T) / 2).astype(np.complex64)

    t0 = time.perf_counter()
    w, z, info = eigen_h(h)
    print(f"first solve (incl. compile): {time.perf_counter()-t0:.1f} s "
          f"(info.elapsed {info.elapsed:.2f} s)", flush=True)
    w2, z2, info2 = eigen_h(h)
    print(f"warm solve: {info2.elapsed:.2f} s", flush=True)

    # bitwise double-run repro (device-side compare)
    if isinstance(z, ComplexPair):
        repro = (bool(jnp.array_equal(w, w2))
                 and bool(jnp.array_equal(z[0], z2[0]))
                 and bool(jnp.array_equal(z[1], z2[1])))
        zr = np.asarray(z[0], np.float64)
        zi = np.asarray(z[1], np.float64)
        zc = zr + 1j * zi
    else:
        repro = bool(jnp.array_equal(w, w2)) and bool(
            jnp.array_equal(z, z2))
        zc = np.asarray(z)
    wv = np.asarray(w, np.float64)
    eps = np.finfo(np.float32).eps
    hn = np.linalg.norm(h)
    resid = np.linalg.norm(h @ zc - zc * wv[None, :]) / (n * eps * hn)
    ortho = np.linalg.norm(zc.conj().T @ zc - np.eye(n)) / (n * eps)
    print(f"residual {resid:.3f} {'PASSED' if resid < 768 else 'FAILED'}"
          f" | ortho {ortho:.3f} {'PASSED' if ortho < 8 else 'FAILED'}"
          f" | repro_bitwise {repro}", flush=True)


if __name__ == "__main__":
    main()
