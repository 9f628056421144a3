"""Device-mesh sharding for the structured multigrid stack.

The reference's only inter-process strategy is MPI domain decomposition of
the cell grid with one-layer ghost exchange (SURVEY.md section 2.3).  The
TPU-native equivalent implemented here: shard the node-grid arrays over a
``jax.sharding.Mesh`` along the slowest (z, then y) axes and let GSPMD
insert the halo collectives for the window gather/scatter shifts — they are
static-shape slice/pad/add patterns, which partition into neighbor
``collective-permute`` traffic over ICI.  Inner products lower to ``psum``
(replacing ``Utilities::MPI::sum``, /root/reference/common/laplace_operator.h:715-717).

Coarse levels whose cell count no longer divides the mesh are simply left to
GSPMD's padding/replication — the same pragmatic policy as the reference,
which keeps all MPI ranks active on every level
(/root/reference/common/multigrid_solver.h:72-91).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("z",)) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(axes) == 1:
        return Mesh(np.asarray(devs), axes)
    # factor devices into a 2-D grid for ('z','y')
    n = len(devs)
    nz = int(np.floor(np.sqrt(n)))
    while n % nz:
        nz -= 1
    return Mesh(np.asarray(devs).reshape(nz, n // nz), axes)


def grid_sharding(mesh: Mesh, dim: int) -> NamedSharding:
    """Shard a dim-D node-grid array along the leading axes by mesh axes."""
    spec = list(mesh.axis_names) + [None] * (dim - len(mesh.axis_names))
    return NamedSharding(mesh, P(*spec))


def shard_grid_array(x, mesh: Mesh):
    return jax.device_put(x, grid_sharding(mesh, x.ndim))
