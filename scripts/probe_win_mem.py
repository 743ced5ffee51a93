"""Compile-only memory analysis of the windowed TRD program on the TPU
target — diagnoses large-n worker crashes without executing anything.

Usage: python scripts/probe_win_mem.py [n ...]
"""

import os
import sys

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from eigenexa_tpu.ops import householder as hh  # noqa: E402


def probe(n: int, nb: int = 64):
    tm = hh._WIN_TM
    group = hh._round_up(max(4 * nb, hh._round_up(n, tm) // 8), tm)
    spec = jax.ShapeDtypeStruct((n, n), jnp.float32)
    print(f"--- n={n} nb={nb} group={group} ---", flush=True)
    comp = hh._tridiagonalize_windowed.lower(spec, nb, group, False
                                             ).compile()
    ma = comp.memory_analysis()
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        print(f"  {k}: {v if v is None else v / 1e9:.3f} GB"
              if isinstance(v, int) else f"  {k}: {v}", flush=True)


def main():
    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    print("device:", dev,
          {k: v for k, v in stats.items()
           if "limit" in k or "in_use" in k}, flush=True)
    for a in (sys.argv[1:] or ["16384", "32768"]):
        probe(int(a))


if __name__ == "__main__":
    main()
