"""Public solver facade: eigen_s / eigen_sx / eigh.

Reference analogue: src/eigen_libs.F:150 (eigen_s dispatch) and the driver
orchestration scale → reduce → solve-reduced → back-transform → rescale of
src/eigen_FS.F:29 / src/eigen_s.F:30 / src/eigen_sx.F:30.

API shape is functional: ``w, z, info = eigen_s(a, nvec=..., mode=...)``.
`info` carries the reference's in-band telemetry contract (on return the
reference stores a(1,1)=flops, a(2,1)=elapsed, a(3,1)=comm_time —
src/eigen_s.F:284-295); here it is an explicit dataclass instead of
scribbling into the destroyed input.

Modes (reference: benchmark/main2.f:243-258 and driver mode handling,
src/eigen_sx.F:159-221):

  'A' — eigenvalues + eigenvectors (default)
  'N' — eigenvalues only (D&C values; no back-transform)
  'X' — eigenvalues + eigenvectors, bisection-refined values
  'S' — skip the reduced solve: Z = Q·I (isolates TRD+TRBAK)
  'T' — skip back-transform: Z = eigenvectors of T (isolates TRD+D&C)
  'C' — skip both: Z = I (isolates TRD)
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from eigenexa_tpu.ops.householder import tridiagonalize
from eigenexa_tpu.solvers import dc
from eigenexa_tpu.solvers.trbak import back_transform
from eigenexa_tpu.runtime import EigenContext, default_context
from eigenexa_tpu.utils.sync import device_sync

MODES = ("A", "N", "X", "S", "T", "C", "R")


def _solve_stage_r(stage_data, nvec, band: int, vec_dtype):
    """Mode 'R': read reduced-band data and run ONLY the D&C stage
    (reference: src/eigen_sx.F:175-193 — D.data/E.data/F.data files)."""
    from eigenexa_tpu.utils.stageio import load_stage_data

    if isinstance(stage_data, str):
        d, e1, e2 = load_stage_data(stage_data)
    else:
        d, e1 = stage_data[0], stage_data[1]
        e2 = stage_data[2] if len(stage_data) > 2 else None
    d = jnp.asarray(d)
    e1 = jnp.asarray(e1)
    if band == 2 and e2 is not None:
        from eigenexa_tpu.solvers.dc_band import solve_band2_dc

        w, s = solve_band2_dc(d, e1, jnp.asarray(e2), vec_dtype=vec_dtype)
    else:
        w, s = dc.solve_tridiag(d, e1, vec_dtype=vec_dtype)
    nvec = d.shape[0] if nvec is None else min(nvec, d.shape[0])
    return w, s[:, :nvec]


@dataclasses.dataclass
class SolveInfo:
    """Telemetry contract (a(1,1)/a(2,1)/a(3,1) analogue,
    src/eigen_s.F:284-295).

    `stages` carries the per-stage seconds/GFLOPS breakdown the reference
    prints as TRD-BLK / D&C / TRDBAK lines (src/eigen_s.F:180-276) —
    filled when the solve runs with profile=True (the staged path; the
    default fused single-program path reports whole-solve numbers only,
    because XLA owns the intra-program timeline).  `comm_stats` is the
    COMM_STAT table (src/eigen_devel.F:98-117) filled by the distributed
    drivers; `comm_time` is its calibrated model-attributed time.
    """

    flops: float = 0.0       # model flops: 4/3·n³ (TRD) + dc + 2·nvec·n²
    elapsed: float = 0.0     # wall seconds for the whole solve
    comm_time: float = 0.0   # attributed collective time (0 on one chip)
    n: int = 0
    nvec: int = 0
    mode: str = "A"
    stages: dict = dataclasses.field(default_factory=dict)
    comm_stats: Optional[object] = None

    @property
    def gflops(self) -> float:
        return self.flops / self.elapsed / 1e9 if self.elapsed > 0 else 0.0

    def stage_report(self, printer=print):
        """Print the per-stage block (TRD-BLK/D&C/TRDBAK/Total lines,
        reference: src/eigen_s.F:180-276)."""
        for name, row in self.stages.items():
            g = row["flops"] / row["seconds"] / 1e9 if row["seconds"] > 0 \
                else 0.0
            printer(f"  {name:8s} {row['seconds']:10.4f} s "
                    f"{g:10.2f} GFLOPS")
        printer(f"  {'Total':8s} {self.elapsed:10.4f} s "
                f"{self.gflops:10.2f} GFLOPS"
                + (f"   comm {self.comm_time:.4f} s"
                   if self.comm_time else ""))


def dc_flop_model(n: int, leaf: int = 2) -> float:
    """Counted flops of the batched merge tree (the analogue of the
    reference's runtime `flops` accumulator, src/eigen_dc.F:14): per level
    with block size s the eigenvector cascade does (m/2s) merges of two
    (s×s)·(s×2s) GEMMs each = 4·m·s² flops; geometric sum ≈ (4/3)·m³.
    The secular iterations are O(m²·n_iter) per level — negligible next
    to the cascade and not counted (matches the reference's under-count
    note, benchmark/main2.f:461-470)."""
    m = leaf
    while m < n:
        m *= 2
    total, s = 0.0, leaf
    while 2 * s <= m:
        total += 4.0 * m * s * s
        s *= 2
    return total


def flop_model(n: int, nvec: int, with_trbak: bool) -> float:
    """The reference's reported-GFLOPS flop model
    (TRD 4/3·n³: src/eigen_s.F:177; TRBAK 2·nvec·n²: src/eigen_s.F:248;
    D&C counted via dc_flop_model)."""
    f = 4.0 / 3.0 * n**3
    f += dc_flop_model(n)
    if with_trbak:
        f += 2.0 * nvec * n**2
    return f


def matrix_scaling(a: jnp.ndarray):
    """Scale A into the safe range; NaN-poison on non-finite input.

    Reference: eigen_scaling (src/eigen_scaling.F:59) + the NaN guard in
    the driver (src/eigen_s.F:156-160): a non-finite input must produce
    NaN eigenvalues, not an exception, so the caller can detect it.
    Returns (A·sigma, sigma)."""
    dtype = a.dtype
    fi = jnp.finfo(dtype)
    eps = jnp.asarray(fi.eps, dtype)
    smlnum = jnp.asarray(fi.tiny, dtype) / eps
    rmin = jnp.sqrt(smlnum)
    rmax = jnp.sqrt(jnp.asarray(1.0, dtype) / smlnum)
    anrm = jnp.max(jnp.abs(a))
    sigma = jnp.where(
        (anrm > 0) & (anrm < rmin),
        rmin / anrm,
        jnp.where(anrm > rmax, rmax / anrm, jnp.asarray(1.0, dtype)),
    )
    # NaN poisoning: non-finite input -> sigma = NaN propagates everywhere
    sigma = jnp.where(jnp.isfinite(anrm), sigma, jnp.asarray(jnp.nan, dtype))
    return a * sigma, sigma


# module-level jit: a fresh jax.jit wrapper per call would re-trace the
# scaling on every profiled solve
_matrix_scaling_jit = jax.jit(lambda a: matrix_scaling(a))


def _solve_core(a, nvec: int, mode: str, nb_f: int, nb_b: int,
                dc_leaf: int = 32, band: int = 1):
    """Traceable solve body (jit-safe for fixed n/mode).

    band=1 is the eigen_s path (tridiagonal); band=2 the eigen_sx path
    (reference: src/eigen_sx.F:30 — dense -> pentadiagonal -> banded D&C).
    """
    n = a.shape[0]
    in_dtype = a.dtype
    a_s, sigma = matrix_scaling(a)
    # drop this frame's reference so a caller passing a temporary frees
    # the unscaled matrix before the reduction (one n² buffer at 32k+)
    del a
    if band == 2:
        return _solve_core_band2(a_s, sigma, nvec, mode, nb_f, nb_b,
                                 dc_leaf)
    trd = tridiagonalize(a_s, nb=nb_f, donate=True)

    if mode == "N":
        # eigenvalues only: Sturm bisection — no eigenvector work at all
        # (reference: mode-N path through eigen_bisect, src/bisect.F:67)
        from eigenexa_tpu.ops.sturm import eigvals_bisect

        w = eigvals_bisect(trd.d, trd.e) / sigma
        return w, None
    if mode in ("A", "X", "T"):
        w, s = dc.solve_tridiag(trd.d, trd.e, leaf=dc_leaf,
                                vec_dtype=in_dtype)
        if mode == "X":
            # bisection refinement of the D&C values (reference: mode-X
            # refinement, bisect.F mode=1)
            from eigenexa_tpu.ops.sturm import refine_eigenvalues

            w = refine_eigenvalues(trd.d, trd.e, w)
        # w carries the D&C working dtype: f64 under x64, except the TPU
        # f32 path where the secular work itself runs in f32 (dc_tree.py)
        w = w / sigma
        if mode == "T":
            return w, s[:, :nvec]
        # hand the eigenvector buffer to the back-transform without a
        # lingering reference (at n=32k every n² buffer counts): the
        # holder.pop() empties before the callee runs, so the donated /
        # eagerly-freed buffer has no caller-frame binding left
        holder = [s[:, :nvec] if nvec < n else s]
        del s
        z = back_transform(holder.pop(), trd.v, trd.tau, nb=nb_b,
                           donate=True)
        return w, z
    if mode == "S":
        eye = jnp.eye(n, nvec, dtype=in_dtype)
        z = back_transform(eye, trd.v, trd.tau, nb=nb_b, donate=True)
        return trd.d / sigma, z
    if mode == "C":
        return trd.d / sigma, jnp.eye(n, nvec, dtype=in_dtype)
    raise ValueError(f"unknown mode {mode!r}; expected one of {MODES}")


def _solve_core_band2(a_s, sigma, nvec: int, mode: str, nb_f: int,
                      nb_b: int, dc_leaf: int):
    """eigen_sx body: band-2 reduction + pentadiagonal D&C
    (reference call stack: eigen_prd -> eigen_dcx -> [eigen_bisect2] ->
    trbakwy with MBAND=2, src/eigen_sx.F:151-247)."""
    from eigenexa_tpu.ops.band import band2_reduce

    n = a_s.shape[0]
    prd = band2_reduce(a_s, nb=nb_f, donate=True)

    if mode == "N":
        from eigenexa_tpu.ops.sturm import eigvals_bisect_band2

        return eigvals_bisect_band2(prd.d, prd.e1, prd.e2) / sigma, None
    if mode in ("A", "X", "T"):
        from eigenexa_tpu.solvers.dc_band import solve_band2_dc

        w, s = solve_band2_dc(prd.d, prd.e1, prd.e2, leaf=max(dc_leaf, 4),
                              vec_dtype=a_s.dtype)
        if mode == "X":
            from eigenexa_tpu.ops.sturm import refine_eigenvalues_band2

            w = refine_eigenvalues_band2(prd.d, prd.e1, prd.e2, w)
        w = w / sigma
        if mode == "T":
            return w, s[:, :nvec]
        holder = [s[:, :nvec] if nvec < n else s]
        del s
        z = back_transform(holder.pop(), prd.v, prd.tau, nb=nb_b,
                           donate=True)
        return w, z
    if mode == "S":
        eye = jnp.eye(n, nvec, dtype=a_s.dtype)
        z = back_transform(eye, prd.v, prd.tau, nb=nb_b, donate=True)
        return prd.d / sigma, z
    if mode == "C":
        return prd.d / sigma, jnp.eye(n, nvec, dtype=a_s.dtype)
    raise ValueError(f"unknown mode {mode!r}; expected one of {MODES}")


def _solve_staged(a, nvec: int, mode: str, nb_f: int, nb_b: int,
                  band: int, stages: dict):
    """Per-stage-timed solve body: same math as _solve_core, but each
    stage dispatches separately with a device sync so `stages` gets the
    TRD-BLK / D&C / TRDBAK wall-time split (reference: the per-stage
    timer+GFLOPS lines of src/eigen_s.F:180-276 and eigen_sx.F).  Slower
    than the fused path (per-stage dispatch + no cross-stage fusion) —
    profiling opt-in only.

    Stage timing is recorded through utils.profiler.Profiler (the
    FS_prof analogue) — one timing mechanism serves the test suite and
    the drivers.
    """
    from eigenexa_tpu.utils.profiler import Profiler
    from eigenexa_tpu.utils.sync import device_sync

    n = a.shape[0]
    in_dtype = a.dtype
    prof = Profiler(enabled=True, sync=False)

    def _mark(name, t0, flops, *sync_on):
        device_sync(*[s for s in sync_on if s is not None])
        prof.add(name, time.perf_counter() - t0, flops)
        stages[name] = {"seconds": prof.times[name],
                        "flops": prof.flops.get(name, 0.0)}

    t0 = time.perf_counter()
    a_s, sigma = _matrix_scaling_jit(a)
    del a
    if band == 2:
        from eigenexa_tpu.ops.band import band2_reduce

        red = band2_reduce(a_s, nb=nb_f, donate=True)
        d, e_pair = red.d, (red.e1, red.e2)
    else:
        red = tridiagonalize(a_s, nb=nb_f, donate=True)
        d, e_pair = red.d, (red.e,)
    _mark("TRD-BLK" if band == 1 else "PRD-BLK", t0,
          4.0 / 3.0 * n ** 3, d)

    if mode == "N":
        t0 = time.perf_counter()
        if band == 2:
            from eigenexa_tpu.ops.sturm import eigvals_bisect_band2

            w = eigvals_bisect_band2(d, *e_pair) / sigma
        else:
            from eigenexa_tpu.ops.sturm import eigvals_bisect

            w = eigvals_bisect(d, *e_pair) / sigma
        _mark("BISECT", t0, 0.0, w)
        return w, None
    if mode not in ("A", "X", "T", "S", "C"):
        raise ValueError(f"unknown mode {mode!r}; expected one of {MODES}")

    if mode in ("A", "X", "T"):
        t0 = time.perf_counter()
        if band == 2:
            from eigenexa_tpu.solvers.dc_band import solve_band2_dc

            w, s = solve_band2_dc(d, *e_pair, vec_dtype=in_dtype)
        else:
            w, s = dc.solve_tridiag(d, *e_pair, vec_dtype=in_dtype)
        if mode == "X":
            if band == 2:
                from eigenexa_tpu.ops.sturm import refine_eigenvalues_band2

                w = refine_eigenvalues_band2(d, *e_pair, w)
            else:
                from eigenexa_tpu.ops.sturm import refine_eigenvalues

                w = refine_eigenvalues(d, *e_pair, w)
        w = w / sigma
        _mark("D&C", t0, dc_flop_model(n), w, s)
        if mode == "T":
            return w, s[:, :nvec]
        holder = [s[:, :nvec] if nvec < n else s]
        del s
    else:
        w = d / sigma
        holder = [jnp.eye(n, nvec, dtype=in_dtype)]
        if mode == "C":
            return w, holder.pop()

    t0 = time.perf_counter()
    z = back_transform(holder.pop(), red.v, red.tau, nb=nb_b, donate=True)
    _mark("TRDBAK", t0, 2.0 * nvec * n ** 2, z)
    return w, z


# the fully-fused solve: scale → TRD → D&C → TRBAK as ONE XLA program.
# Usable whenever the D&C stage takes its traceable jax impl (CPU, or f32
# vectors — dc_tree.solve_tridiag_dc's dispatch rule); the TPU-f64 path
# keeps the staged eager orchestration (host D&C is not traceable).
_solve_core_jit = functools.partial(
    jax.jit,
    static_argnames=("nvec", "mode", "nb_f", "nb_b", "dc_leaf", "band"),
)(_solve_core)


def _core_traceable(a, mode: str, band: int) -> bool:
    # band=1 D&C and (since the fused two-merge tree) band=2 are both
    # traceable whenever they take their jax impls.  Above
    # FUSED_TREE_MAX_N on TPU the D&C dispatches its eager per-level
    # orchestration (dc_tree._solve_tridiag_level), which is not
    # traceable — the facade then runs the staged eager path.
    if mode not in ("A", "N", "X", "S", "T", "C"):
        return False
    if jax.default_backend() == "cpu":
        return True
    if jnp.dtype(a.dtype) != jnp.dtype(jnp.float32):
        return False
    from eigenexa_tpu.solvers.dc_tree import FUSED_TREE_MAX_N

    return a.shape[0] <= FUSED_TREE_MAX_N


def eigen_s(
    a: Optional[jnp.ndarray],
    nvec: Optional[int] = None,
    mode: str = "A",
    ctx: Optional[EigenContext] = None,
    stage_data=None,
    profile: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], SolveInfo]:
    """Standard real-symmetric eigensolver (reference: src/eigen_s.F:30).

    Returns (w ascending, Z (n×nvec) or None, SolveInfo).
    Mode 'R' skips reduction and runs D&C on `stage_data` (a directory
    written by utils.stageio.save_stage_data, or a (d, e) tuple); `a` may
    be None then (reference: src/eigen_sx.F:175-193).
    profile=True runs the per-stage-timed path and fills
    SolveInfo.stages with the TRD-BLK/D&C/TRDBAK breakdown
    (reference: src/eigen_s.F:180-276).
    """
    ctx = ctx or default_context()
    mode = mode.upper()
    cfg = ctx.config
    if mode == "R":
        t0 = time.perf_counter()
        vec_dtype = a.dtype if a is not None else jnp.float64
        with jax.default_matmul_precision(cfg.matmul_precision):
            w, z = _solve_stage_r(stage_data, nvec, band=1,
                                  vec_dtype=vec_dtype)
        device_sync(w, z)
        n = w.shape[0]
        return w, z, SolveInfo(
            flops=4.0 / 3.0 * n**3, elapsed=time.perf_counter() - t0,
            n=n, nvec=z.shape[1], mode="R",
        )
    n = a.shape[0]
    nvec = n if nvec is None else min(nvec, n)
    t0 = time.perf_counter()
    stages: dict = {}
    traceable = _core_traceable(a, mode, 1)
    # hand the matrix over without a lingering frame binding: a caller
    # passing a temporary frees the unscaled matrix during the solve
    holder = [a]
    del a
    # TPU f32 matmuls default to bf16 MXU passes (~1e-2 orthogonality!);
    # the solver's accuracy contract requires true-f32 accumulation.
    with jax.default_matmul_precision(cfg.matmul_precision):
        if profile:
            w, z = _solve_staged(holder.pop(), nvec, mode,
                                 cfg.panel_forward,
                                 cfg.panel_backward, 1, stages)
        else:
            core = _solve_core_jit if traceable else _solve_core
            w, z = core(holder.pop(), nvec=nvec, mode=mode,
                        nb_f=cfg.panel_forward,
                        nb_b=cfg.panel_backward)
    device_sync(w, z)
    elapsed = time.perf_counter() - t0
    info = SolveInfo(
        flops=flop_model(n, nvec, mode in ("A", "X", "S")),
        elapsed=elapsed,
        comm_time=0.0,
        n=n,
        nvec=nvec,
        mode=mode,
        stages=stages,
    )
    return w, z, info


def eigen_sx(
    a: Optional[jnp.ndarray],
    nvec: Optional[int] = None,
    mode: str = "A",
    ctx: Optional[EigenContext] = None,
    stage_data=None,
    profile: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], SolveInfo]:
    """One-stage banded variant (reference: src/eigen_sx.F:30 — dense →
    pentadiagonal via 2-column Householder pairs → banded D&C with two
    rank-1 merges per join → WY back-transform with MBAND=2 reflectors).

    Mode 'R' runs only the banded D&C on saved (d, e1, e2) data
    (reference: src/eigen_sx.F:175-193).
    """
    ctx = ctx or default_context()
    mode = mode.upper()
    cfg = ctx.config
    if mode == "R":
        t0 = time.perf_counter()
        vec_dtype = a.dtype if a is not None else jnp.float64
        with jax.default_matmul_precision(cfg.matmul_precision):
            w, z = _solve_stage_r(stage_data, nvec, band=2,
                                  vec_dtype=vec_dtype)
        device_sync(w, z)
        n = w.shape[0]
        return w, z, SolveInfo(
            flops=4.0 / 3.0 * n**3, elapsed=time.perf_counter() - t0,
            n=n, nvec=z.shape[1], mode="R",
        )
    n = a.shape[0]
    nvec = n if nvec is None else min(nvec, n)
    t0 = time.perf_counter()
    stages: dict = {}
    traceable = _core_traceable(a, mode, 2)
    holder = [a]
    del a
    with jax.default_matmul_precision(cfg.matmul_precision):
        if profile:
            w, z = _solve_staged(holder.pop(), nvec, mode,
                                 cfg.panel_forward,
                                 cfg.panel_backward, 2, stages)
        else:
            core = _solve_core_jit if traceable else _solve_core
            w, z = core(holder.pop(), nvec=nvec, mode=mode,
                        nb_f=cfg.panel_forward,
                        nb_b=cfg.panel_backward, band=2)
    device_sync(w, z)
    elapsed = time.perf_counter() - t0
    info = SolveInfo(
        flops=flop_model(n, nvec, mode in ("A", "X", "S")),
        elapsed=elapsed,
        comm_time=0.0,
        n=n,
        nvec=nvec,
        mode=mode,
        stages=stages,
    )
    return w, z, info


def eigh(a: jnp.ndarray, nvec: Optional[int] = None,
         ctx: Optional[EigenContext] = None):
    """NumPy-style convenience wrapper: returns (w, Z)."""
    w, z, _ = eigen_s(a, nvec=nvec, mode="A", ctx=ctx)
    return w, z
