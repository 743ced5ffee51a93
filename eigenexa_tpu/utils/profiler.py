"""Named-region wall-clock profiler.

TPU-native analogue of the reference's FS_prof subsystem — a 70-slot
named-region profiler threaded through every FS routine
(reference: src/FS_prof.F90:1-60, region table :23-47) — and of the
per-stage timer/GFLOPS lines the drivers print
(eigen_timer_print, src/eigen_devel.F:440-526; TRD-BLK/D&C/TRDBAK lines,
src/eigen_s.F:180-276).

Under jit the device timeline belongs to XLA; regions here measure
host-observed wall time with an explicit ``block_until_ready`` barrier at
region end (opt-in, so profiling never changes the async behavior of
unprofiled runs).  For kernel-level timelines use ``jax.profiler`` traces —
this module is the cheap always-available layer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Profiler:
    """Accumulating region timer with the FS_prof usage pattern:

        prof = Profiler()
        with prof.region("trd"):
            ...
        prof.report()
    """

    def __init__(self, enabled: bool = True, sync: bool = True):
        self.enabled = enabled
        self.sync = sync
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.flops: Dict[str, float] = {}

    @contextlib.contextmanager
    def region(self, name: str, flops: float = 0.0, sync_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_on is not None:
                # block_until_ready is untrustworthy on the axon tunnel
                # backend; device_sync forces a dependent scalar fetch
                from eigenexa_tpu.utils.sync import device_sync

                device_sync(sync_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if flops:
                self.flops[name] = self.flops.get(name, 0.0) + flops

    def add(self, name: str, seconds: float, flops: float = 0.0):
        self.times[name] = self.times.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1
        if flops:
            self.flops[name] = self.flops.get(name, 0.0) + flops

    def report(self, printer=print):
        """FS_prof_finalize-style table; returns the dict for programmatic
        use (the structured-logging contract, SURVEY.md §5.5)."""
        rows = {}
        for name in sorted(self.times):
            t = self.times[name]
            row = {"seconds": t, "count": self.counts[name]}
            if name in self.flops and t > 0:
                row["gflops"] = self.flops[name] / t / 1e9
            rows[name] = row
        if printer is not None:
            width = max((len(n) for n in rows), default=10)
            printer(f"{'region'.ljust(width)}  seconds     count  GFLOP/s")
            for name, row in rows.items():
                g = f"{row.get('gflops', 0.0):8.1f}" if "gflops" in row \
                    else "       -"
                printer(
                    f"{name.ljust(width)}  {row['seconds']:9.4f}  "
                    f"{row['count']:6d}  {g}"
                )
        return rows

    def reset(self):
        self.times.clear()
        self.counts.clear()
        self.flops.clear()


_GLOBAL = Profiler(enabled=False)


def profile_region(name: str, flops: float = 0.0):
    """Module-level region on the global profiler (disabled by default;
    enable with ``profiler.enable_global()``)."""
    return _GLOBAL.region(name, flops)


def enable_global(sync: bool = True) -> Profiler:
    _GLOBAL.enabled = True
    _GLOBAL.sync = sync
    return _GLOBAL


def global_profiler() -> Profiler:
    return _GLOBAL
