"""Validate the analytic COMM_STAT time model against a measured profile.

VERDICT r3 item 7: the distributed drivers attribute collective time with
an analytic byte/count table × two calibrated scalars
(parallel/collectives.CommStats.seconds — the reference's a(3,1) comm
telemetry, src/eigen_s.F:284-295, fed by the eigen_init-time calibration
of src/eigen_libs0.F:774-849).  This script measures the actual
collective time of one distributed n=1024 eigen_s solve on the 8-device
virtual CPU mesh with jax.profiler and prints measured vs model.

Method: capture a profiler trace (perfetto JSON), sum the durations of
XLA thunk events whose names mark collectives (all-reduce, all-gather,
all-to-all, collective-permute), average over devices, and compare with
CommStats.seconds(latency, per_byte) from the same run's comm model.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/validate_comm_model.py [n]
"""

import glob
import gzip
import json
import os
import sys
import tempfile

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_COLLECTIVE_MARKS = ("all-reduce", "all-gather", "all-to-all",
                     "collective-permute", "reduce-scatter")


def _collective_seconds(trace_dir: str, n_devices: int) -> float:
    """Sum collective-thunk event durations from a perfetto trace, per
    device (total across devices / n_devices)."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    total_us = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            name = (ev.get("name") or "").lower()
            if ev.get("ph") == "X" and any(m in name
                                           for m in _COLLECTIVE_MARKS):
                total_us += ev.get("dur", 0.0)
    return total_us / 1e6 / n_devices


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    from eigenexa_tpu.parallel.distributed import distributed_eigen_s
    from eigenexa_tpu.parallel.mesh import build_mesh
    from eigenexa_tpu.runtime import SolverConfig
    from eigenexa_tpu.testing import matgen

    n_dev = 8
    mesh = build_mesh(devices=jax.devices()[:n_dev], shape=(2, 4))
    cfg = SolverConfig(panel_forward=32, panel_backward=64)
    a = matgen.frank(n, jnp.float64)

    # warmup / compile, and get the model-attributed comm time
    w, z, info = distributed_eigen_s(a, mesh, config=cfg, with_info=True)
    jax.block_until_ready(z)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            w, z = distributed_eigen_s(a, mesh, config=cfg)
            jax.block_until_ready(z)
        measured = _collective_seconds(td, n_dev)

    model = info.comm_time
    ratio = model / measured if measured > 0 else float("inf")
    print(f"n={n} mesh=2x4 (8 virtual CPU devices)")
    print(f"  measured collective time (profiler): {measured:.4f} s/device")
    print(f"  model comm_time (CommStats.seconds): {model:.4f} s")
    print(f"  model/measured ratio: {ratio:.2f}")
    print(f"  solve elapsed: {info.elapsed:.2f} s "
          f"(comm fraction measured: {measured / info.elapsed:.1%})")
    for line in info.comm_stats.stat_block(
            *__import__("eigenexa_tpu.parallel.distributed",
                        fromlist=["_mesh_overheads"])._mesh_overheads(mesh)):
        print("  " + line)


if __name__ == "__main__":
    main()
