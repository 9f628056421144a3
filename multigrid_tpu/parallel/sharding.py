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


def padded_len(n: int, parts: int) -> int:
    return ((n + parts - 1) // parts) * parts


def pad_spec(shape, mesh: Mesh):
    """Padded shape making every mesh-mapped axis divisible (node grids have
    N*p+1 rows, never divisible by a power-of-two device count)."""
    names = list(mesh.axis_names)
    out = list(shape)
    for i, ax in enumerate(names):
        out[i] = padded_len(shape[i], mesh.shape[ax])
    return tuple(out)


def wrap_padded(fn, shape, mesh: Mesh, argnums=(0,)):
    """Wrap ``fn`` (node-grid in/out) so its jit boundary carries padded,
    evenly-shardable arrays; inside, arrays are sliced back to the exact
    shape (GSPMD supports uneven intermediate shardings)."""
    pshape = pad_spec(shape, mesh)
    pads = [(0, p - s) for p, s in zip(pshape, shape)]

    def unpad(xp):
        idx = tuple(slice(0, s) for s in shape)
        return xp[idx]

    def pad(x):
        import jax.numpy as jnp

        return jnp.pad(x, pads)

    def wrapped(*args):
        args = list(args)
        for i in argnums:
            args[i] = unpad(args[i])
        out = fn(*args)
        if isinstance(out, tuple):
            return tuple(pad(o) if hasattr(o, "ndim") and o.ndim == len(shape) else o
                         for o in out)
        return pad(out)

    return wrapped, pad, unpad
