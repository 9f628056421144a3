"""Distributed fused SIP-DG operator with compressed ghost exchange.

TPU rendering of the reference's hand-rolled DG face exchange
(/root/reference/common/laplace_operator_dg.h:981-1058): each device owns a
slab of cells along axis 0; one operator application ships only a 2-plane
payload per slab face to the neighbors via ``ppermute``s over ICI, then
runs the fused cell+face kernel with the received ghost layers replacing
the Dirichlet mirror at slab edges.  DG has no shared dofs, so no
compress(add) is needed (unlike the CG halo path in parallel/halo.py).

Two wire formats, selected by ``wire=``:

* ``"traces"`` (default): evaluated (value, gvec.grad) traces at the face
  quadrature points — basis-independent, works at every degree.
* ``"hermite"``: the Hermite COEFFICIENT planes themselves (the reference's
  FE_DGQHermite packing, laplace_operator_dg.h:1017-1039): the sender ships
  the two face-controlling coefficient planes (a pure slice for the hermite
  element kind) and the RECEIVER evaluates the traces, including the
  tangential gradient components that never cross the wire.  Same payload
  volume, cheaper pack, degree >= 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dg import DGGrid, DGLaplace

shard_map = jax.shard_map

WIRE_FORMATS = ("traces", "hermite")


def _exchange(op: DGLaplace, x, d: int, axis: str, nd: int, wire: str):
    """One-axis ghost exchange.  Returns (own, ghost) where own[side] and
    ghost[side] are (u_trace, gn_trace) pairs: ghost[1] is the right
    neighbor's low face (my high-side exterior), ghost[0] the left
    neighbor's high face."""
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    if wire == "hermite":
        planes = op.boundary_coeff_planes(x, d=d)
        recv_hi = jax.tree.map(lambda t: jax.lax.ppermute(t, axis, bwd),
                               planes[0])
        recv_lo = jax.tree.map(lambda t: jax.lax.ppermute(t, axis, fwd),
                               planes[1])
        own = {s: op.traces_from_coeff_planes(planes[s], d) for s in (0, 1)}
        ghost = {1: op.traces_from_coeff_planes(recv_hi, d),
                 0: op.traces_from_coeff_planes(recv_lo, d)}
    else:
        own = op.boundary_traces(x, d=d)
        ghost = {
            1: jax.tree.map(lambda t: jax.lax.ppermute(t, axis, bwd), own[0]),
            0: jax.tree.map(lambda t: jax.lax.ppermute(t, axis, fwd), own[1]),
        }
    return own, ghost


def _ext_entries(own, ghost, dev, nd, d):
    """Slab-edge exterior data: interior edges use the ghosts, global
    domain boundaries keep the Dirichlet mirror (u+ = -u-, du+ = du-)."""
    is_last = dev == nd - 1
    is_first = dev == 0
    return {
        (d, 1): (jnp.where(is_last, -own[1][0], ghost[1][0]),
                 jnp.where(is_last, own[1][1], ghost[1][1])),
        (d, 0): (jnp.where(is_first, -own[0][0], ghost[0][0]),
                 jnp.where(is_first, own[0][1], ghost[0][1])),
    }


class HaloDGLaplace:
    def __init__(self, op: DGLaplace, mesh: Mesh, axis: str = "z",
                 wire: str = "traces"):
        assert wire in WIRE_FORMATS
        if wire == "hermite":
            assert op.grid.degree >= 3, "hermite wire needs degree >= 3"
        self.op = op
        self.mesh = mesh
        self.axis = axis
        self.wire = wire
        self.nd = mesh.shape[axis]
        assert op.grid.cells[0] % self.nd == 0

    def distribute(self, u: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(u, NamedSharding(self.mesh, P(self.axis)))

    def vmult_distributed(self):
        op = self.op
        nd, axis, wire = self.nd, self.axis, self.wire

        def body(x):
            d = jax.lax.axis_index(axis)
            own, ghost = _exchange(op, x, 0, axis, nd, wire)
            return op.apply(x, ext=_ext_entries(own, ghost, d, nd, 0))

        return jax.jit(
            shard_map(body, mesh=self.mesh, in_specs=P(self.axis),
                      out_specs=P(self.axis))
        )


class HaloDGLaplace2D:
    """('z','y')-decomposed fused SIP-DG operator: two independent
    trace exchanges, one per decomposed cell axis.  DG couples through
    faces only — no corner payload exists, so unlike the CG halo's
    ordered corner routing (parallel/halo.HaloLaplace2D) the two axis
    exchanges commute and both collectives depend only on their own
    boundary-layer sweeps (cell-local in boundary_traces): the bulk
    apply overlaps both under XLA's scheduler."""

    def __init__(self, op: DGLaplace, mesh: Mesh,
                 axes: tuple[str, str] = ("z", "y"), wire: str = "traces"):
        assert wire in WIRE_FORMATS
        if wire == "hermite":
            assert op.grid.degree >= 3, "hermite wire needs degree >= 3"
        self.op = op
        self.mesh = mesh
        self.axes = axes
        self.wire = wire
        self.nd = tuple(mesh.shape[a] for a in axes)
        for d in range(2):
            assert op.grid.cells[d] % self.nd[d] == 0

    def distribute(self, u: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(
            u, NamedSharding(self.mesh, P(self.axes[0], self.axes[1])))

    def vmult_distributed(self):
        op = self.op
        az, ay = self.axes
        ndz, ndy = self.nd
        wire = self.wire

        def body(x):
            ext = {}
            for d, (axis, nd) in enumerate(((az, ndz), (ay, ndy))):
                dev = jax.lax.axis_index(axis)
                own, ghost = _exchange(op, x, d, axis, nd, wire)
                ext.update(_ext_entries(own, ghost, dev, nd, d))
            return op.apply(x, ext=ext)

        return jax.jit(
            shard_map(body, mesh=self.mesh, in_specs=P(az, ay),
                      out_specs=P(az, ay))
        )
