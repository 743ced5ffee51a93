"""Micro-probe: which op faults on a >2^31-byte operand (n=32768 f32)?

Runs each suspect op on its own with a sync + log line between, so the
worker-crash point identifies the culprit.
Usage: python scripts/probe_kernels32k.py [n] [ops...]
  ops: dus rank2k symv scanrank2k  (default: dus rank2k symv)
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
from jax import lax  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    args = [a for a in sys.argv[1:]]
    n = int(args[0]) if args and args[0].isdigit() else 32768
    ops = [a for a in args if not a.isdigit()] or ["dus", "rank2k", "symv"]
    nb = 64
    log(f"n={n} ops={ops} bytes={n*n*4/1e9:.2f} GB")

    @jax.jit
    def make(n=n):
        return jnp.zeros((n, n), jnp.float32).at[:, 0].set(1.0)

    b = make()
    b.block_until_ready()
    log("alloc done")

    if "dus" in ops:
        @jax.jit
        def dus(b, u):
            return lax.dynamic_update_slice(b, u, (jnp.int32(0),
                                                   jnp.int32(n - nb)))

        u = jnp.ones((n, nb), jnp.float32)
        b = dus(b, u)
        print(float(b[n - 1, n - 1]), flush=True)
        log("dynamic_update_slice OK")

    if "rank2k" in ops:
        from eigenexa_tpu.ops.pallas_kernels import rank2k_update_window

        u = jnp.ones((n, nb), jnp.float32) * 1e-4
        w = jnp.ones((n, nb), jnp.float32) * 1e-4

        @jax.jit
        def rk(b, u, w):
            return rank2k_update_window(b, u, w, t0=0)

        b = rk(b, u, w)
        print(float(b[n - 1, n - 1]), flush=True)
        log("rank2k_update_window t0=0 OK")

    if "symv" in ops:
        from eigenexa_tpu.ops.pallas_kernels import symv_lower

        v = jnp.ones((n,), jnp.float32) / n

        @jax.jit
        def sv(b, v):
            return symv_lower(b, v, t0=0)

        q = sv(b, v)
        print(float(q[0]), float(q[n - 1]), flush=True)
        log("symv_lower t0=0 OK")

    log("ALL OK")


if __name__ == "__main__":
    main()
