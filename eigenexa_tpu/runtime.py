"""Runtime context — the public facade's environment object.

TPU-native analogue of the reference's init/query layer
(``eigen_init``/``eigen_free``/``eigen_get_procs``/``eigen_get_id``/
``eigen_get_matdims`` — reference: src/eigen_libs.F:70-218 and
src/eigen_libs0.F:296-1689).

Where the reference builds MPI communicators, BLACS contexts, datacast
partner tables and calibrates collective overheads at init
(src/eigen_libs0.F:296-849), the TPU build needs only: a 2D device mesh,
the derived grid shape, and solver tunables.  Everything else (collective
scheduling, determinism, overlap) is owned by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

from eigenexa_tpu.parallel.mesh import build_mesh, mesh_shape
from eigenexa_tpu.parallel import layout


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Solver tunables — the analogue of the reference's three-tier flag
    system collapsed to one dataclass (SURVEY.md §5.6).

    Reference defaults: m_forward=48, m_backward=128, NB=64
    (src/eigen_libs0.F:49-51).  On TPU, panel widths are MXU-tile multiples.
    """

    panel_forward: int = 64      # TRD panel width (m_forward analogue)
    panel_backward: int = 128    # trbak WY block (m_backward analogue)
    nb_dc: int = 128             # D&C leaf size / layout block (NB analogue)
    band: int = 1                # reduction bandwidth: 1=tridiag (eigen_s),
                                 # 2=pentadiag (eigen_sx analogue)
    dc_min_leaf: int = 64        # smallest D&C subproblem solved directly
    use_pallas: bool = True      # enable Pallas kernels where available
    matmul_precision: str = "highest"  # TPU f32 matmuls default to bf16
                                 # passes; orthogonality needs full f32
                                 # ("highest").  Relax per-stage later.


@dataclasses.dataclass
class EigenContext:
    """The solver environment: mesh + grid info + config + version.

    Returned by :func:`eigen_init`; passed to every driver.  Immutable in
    spirit; `free()` is a no-op kept for API parity (src/eigen_libs.F:204).
    """

    mesh: Mesh
    config: SolverConfig = dataclasses.field(default_factory=SolverConfig)

    @property
    def nnod(self) -> int:
        return self.mesh.size

    @property
    def grid(self) -> Tuple[int, int]:
        return mesh_shape(self.mesh)

    @property
    def x_nnod(self) -> int:
        return self.grid[0]

    @property
    def y_nnod(self) -> int:
        return self.grid[1]

    def matdims(self, n: int) -> Tuple[int, int]:
        """Padded per-shard dims for an n×n matrix
        (eigen_get_matdims, reference: src/eigen_libs.F:106)."""
        px, py = self.grid
        lr, lc = layout.padded_local_dims(n, px, py)
        layout.check_int32_overflow(n, lr, lc)
        return lr, lc


_DEFAULT_CTX: Optional[EigenContext] = None


def eigen_init(
    mesh: Optional[Mesh] = None,
    shape: Optional[Tuple[int, int]] = None,
    order: str = "C",
    config: Optional[SolverConfig] = None,
) -> EigenContext:
    """Build the solver environment (reference: eigen_init,
    src/eigen_libs.F:70).

    Args mirror the reference: an explicit mesh stands in for passing a
    communicator/MPI_Cart; `order` selects column/row-major device placement.
    """
    if mesh is None:
        mesh = build_mesh(shape=shape, order=order)
    ctx = EigenContext(mesh=mesh, config=config or SolverConfig())
    global _DEFAULT_CTX
    _DEFAULT_CTX = ctx
    return ctx


def default_context() -> EigenContext:
    global _DEFAULT_CTX
    if _DEFAULT_CTX is None:
        _DEFAULT_CTX = eigen_init()
    return _DEFAULT_CTX


def eigen_free(ctx: Optional[EigenContext] = None) -> None:
    """API-parity no-op (reference: eigen_free, src/eigen_libs.F:204).
    JAX meshes hold no OS resources to release."""
    global _DEFAULT_CTX
    if ctx is None or ctx is _DEFAULT_CTX:
        _DEFAULT_CTX = None


def eigen_get_procs(ctx: Optional[EigenContext] = None):
    """(nnod, x_nnod, y_nnod) — reference: src/eigen_libs0.F:1575."""
    ctx = ctx or default_context()
    return ctx.nnod, ctx.x_nnod, ctx.y_nnod


def eigen_get_id(ctx: Optional[EigenContext] = None):
    """(inod, x_inod, y_inod) of the *controller* process — in the JAX SPMD
    model the host drives all devices, so this returns process_index-based
    ids (reference: src/eigen_libs0.F:1615)."""
    ctx = ctx or default_context()
    pid = jax.process_index()
    return pid, pid % ctx.x_nnod, pid // ctx.x_nnod


def eigen_get_matdims(n: int, ctx: Optional[EigenContext] = None):
    ctx = ctx or default_context()
    return ctx.matdims(n)


def eigen_get_version():
    """(version, date, codename) — reference: eigen_get_version /
    eigen_show_version (src/eigen_libs0.F:29-48, :207)."""
    from eigenexa_tpu import __version__, __codename__

    return __version__, "2026-08-18", __codename__


def eigen_show_version(printer=print):
    v, date, name = eigen_get_version()
    printer(f"eigenexa_tpu version {v} ({date}) '{name}' — "
            f"TPU-native eigensolver framework")
