"""Distributed fused SIP-DG operator with compressed ghost exchange.

TPU rendering of the reference's hand-rolled DG face exchange
(/root/reference/common/laplace_operator_dg.h:981-1058): each device owns a
slab of cells along axis 0; one operator application ships only the
*traces* (value + normal-derivative at the slab faces) to the neighbors —
the same two-plane payload the reference achieves with its Hermite-basis
packing (laplace_operator_dg.h:1017-1039) — via two ``ppermute``s over ICI,
then runs the fused cell+face kernel with the received ghost layers
replacing the Dirichlet mirror at slab edges.  DG has no shared dofs, so no
compress(add) is needed (unlike the CG halo path in parallel/halo.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dg import DGGrid, DGLaplace

shard_map = jax.shard_map


class HaloDGLaplace:
    def __init__(self, op: DGLaplace, mesh: Mesh, axis: str = "z"):
        self.op = op
        self.mesh = mesh
        self.axis = axis
        self.nd = mesh.shape[axis]
        assert op.grid.cells[0] % self.nd == 0

    def distribute(self, u: jnp.ndarray) -> jnp.ndarray:
        return jax.device_put(u, NamedSharding(self.mesh, P(self.axis)))

    def vmult_distributed(self):
        op = self.op
        nd, axis = self.nd, self.axis
        fwd = [(i, (i + 1) % nd) for i in range(nd)]
        bwd = [(i, (i - 1) % nd) for i in range(nd)]

        def body(x):
            d = jax.lax.axis_index(axis)
            traces = op.boundary_traces(x, d=0)
            # ship my low-face traces to the left neighbor and my high-face
            # traces to the right neighbor (2 planes each way)
            from_right = jax.tree.map(lambda t: jax.lax.ppermute(t, axis, bwd),
                                      traces[0])
            from_left = jax.tree.map(lambda t: jax.lax.ppermute(t, axis, fwd),
                                     traces[1])
            # interior slab edges use the ghosts; global domain boundaries
            # keep the Dirichlet mirror (ext=None is encoded via where-mask:
            # fall back to mirror by passing the mirror values themselves)
            v_hi_mirror = -traces[1][0]
            g_hi_mirror = traces[1][1]
            v_lo_mirror = -traces[0][0]
            g_lo_mirror = traces[0][1]
            is_last = d == nd - 1
            is_first = d == 0
            ext = {
                (0, 1): (
                    jnp.where(is_last, v_hi_mirror, from_right[0]),
                    jnp.where(is_last, g_hi_mirror, from_right[1]),
                ),
                (0, 0): (
                    jnp.where(is_first, v_lo_mirror, from_left[0]),
                    jnp.where(is_first, g_lo_mirror, from_left[1]),
                ),
            }
            return op.apply(x, ext=ext)

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
                 axes: tuple[str, str] = ("z", "y")):
        self.op = op
        self.mesh = mesh
        self.axes = axes
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
        perms = {
            az: ([(i, (i + 1) % ndz) for i in range(ndz)],
                 [(i, (i - 1) % ndz) for i in range(ndz)]),
            ay: ([(i, (i + 1) % ndy) for i in range(ndy)],
                 [(i, (i - 1) % ndy) for i in range(ndy)]),
        }

        def body(x):
            ext = {}
            for d, (axis, nd) in enumerate(((az, ndz), (ay, ndy))):
                dev = jax.lax.axis_index(axis)
                fwd, bwd = perms[axis]
                traces = op.boundary_traces(x, d=d)
                # my low-face traces go to the left neighbor (bwd), so I
                # receive my right neighbor's low face = my side-1 ghost
                from_right = jax.tree.map(
                    lambda t: jax.lax.ppermute(t, axis, bwd), traces[0])
                from_left = jax.tree.map(
                    lambda t: jax.lax.ppermute(t, axis, fwd), traces[1])
                is_last = dev == nd - 1
                is_first = dev == 0
                ext[(d, 1)] = (
                    jnp.where(is_last, -traces[1][0], from_right[0]),
                    jnp.where(is_last, traces[1][1], from_right[1]),
                )
                ext[(d, 0)] = (
                    jnp.where(is_first, -traces[0][0], from_left[0]),
                    jnp.where(is_first, traces[0][1], from_left[1]),
                )
            return op.apply(x, ext=ext)

        return jax.jit(
            shard_map(body, mesh=self.mesh, in_specs=P(az, ay),
                      out_specs=P(az, ay))
        )
