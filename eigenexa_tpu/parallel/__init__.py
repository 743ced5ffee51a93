"""Parallel substrate: device mesh, data layout, collectives.

The TPU-native equivalent of the reference's L2/L3 layers
(comm.F / eigen_libs0.F — see SURVEY.md §1).
"""

from eigenexa_tpu.parallel.mesh import factor_grid, build_mesh, mesh_shape
from eigenexa_tpu.parallel import layout
from eigenexa_tpu.parallel import collectives

__all__ = ["factor_grid", "build_mesh", "mesh_shape", "layout", "collectives"]
