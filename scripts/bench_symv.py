"""Micro-benchmark: windowed-TRD matvec formulations on the real chip.

The axon tunnel adds ~30 ms dispatch latency per program, so each
variant runs REPS dependent iterations inside ONE jitted fori_loop
(v feeds back through q so nothing hoists or elides).

Compares, at a given (n, t0) window:
  * xla_slab  — q = B[w:, w:] @ v[w:] with a STATIC window slice (the
                candidate windowed fast path: full-square read of the
                live window at XLA's streaming rate)
  * pallas    — ops.pallas_kernels.symv_lower (packed lower-triangle
                read, half the bytes)
  * pallas2   — symv_lower with nc=2 (the PDSYMV2 pair pass)

Prints effective GB/s against the bytes each variant actually reads.
Usage: python scripts/bench_symv.py [n] [t0] [reps]
"""

import functools
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
from jax import lax  # noqa: E402


def timed(fn, *args, outer=3):
    from eigenexa_tpu.utils.sync import device_sync

    out = fn(*args)
    device_sync(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        out = fn(*args)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    t0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    tm = 256
    w0 = t0 * tm
    m_w = n - w0

    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (n, n), jnp.float32)
    b = (b + b.T) / 2
    v = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    v = v.at[:w0].set(0.0)

    slab_bytes = m_w * m_w * 4
    tri_bytes = slab_bytes // 2

    def loop(step, v0):
        def body(_, v):
            q = step(v)
            return q / jnp.maximum(jnp.max(jnp.abs(q)), 1e-30)

        return lax.fori_loop(0, reps, body, v0)

    @jax.jit
    def xla_slab(b, v):
        def step(v):
            q = lax.slice(b, (w0, w0), (n, n)) @ v[w0:]
            return jnp.zeros_like(v).at[w0:].set(q)

        return loop(step, v)

    from eigenexa_tpu.ops.pallas_kernels import symv_lower

    @jax.jit
    def pallas_symv(b, v):
        def step(v):
            q = symv_lower(b, v, t0=t0)
            return jnp.where(jnp.arange(n) >= w0, q, 0.0)

        return loop(step, v)

    @jax.jit
    def pallas_symv2(b, v):
        v2 = jnp.stack([v, jnp.roll(v, 1)], axis=1)

        def body(_, v2):
            q = symv_lower(b, v2, t0=t0)
            q = jnp.where((jnp.arange(n) >= w0)[:, None], q, 0.0)
            return q / jnp.maximum(jnp.max(jnp.abs(q)), 1e-30)

        return lax.fori_loop(0, reps, body, v2)

    t_slab = timed(xla_slab, b, v) / reps
    t_pal = timed(pallas_symv, b, v) / reps
    t_pal2 = timed(pallas_symv2, b, v) / reps / 2  # per vector

    print(f"n={n} t0={t0} window={m_w} reps={reps}")
    print(f"  xla_slab : {t_slab*1e3:8.3f} ms/col  "
          f"{slab_bytes/t_slab/1e9:7.1f} GB/s (reads window²)")
    print(f"  pallas   : {t_pal*1e3:8.3f} ms/col  "
          f"{tri_bytes/t_pal/1e9:7.1f} GB/s (reads window²/2)")
    print(f"  pallas2  : {t_pal2*1e3:8.3f} ms/col  "
          f"{tri_bytes/(2*t_pal2)/1e9:7.1f} GB/s (2 cols/pass)")
    print(f"  wall per col: slab {t_slab*1e3:.3f} | "
          f"pallas {t_pal*1e3:.3f} | pallas-pair {t_pal2*1e3:.3f} ms")


if __name__ == "__main__":
    main()
