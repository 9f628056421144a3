"""Explicit halo-exchange operator path via shard_map + ppermute.

This is the TPU-native rendering of the reference's MPI ghost machinery
(deal.II partitioner update_ghost_values/compress inside cell_loop,
/root/reference/common/laplace_operator.h:568-590, and the DG hand-rolled
face exchange, laplace_operator_dg.h:981-1058): the cell grid is sliced into
z-slabs, each device stores its slab's node planes INCLUDING the planes
shared with its neighbors (the deal.II ghosted-vector representation), and
one operator application does

  local gather -> cell compute -> local scatter        (pure on-device)
  compress(add):      left-shared-plane partial -> left neighbor (ppermute)
  update_ghost:       completed plane -> right neighbor (ppermute)

Inner products use an ownership mask (a device owns all its planes except
the first, which its left neighbor owns) + psum — replacing
``Utilities::MPI::sum`` (laplace_operator.h:715-717).

Unlike the GSPMD path (parallel/sharding.py) where XLA chooses the
collectives, here the communication schedule is explicit and minimal: two
neighbor permutes of one [Y, X] plane per application, riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mesh.brick import DofGrid
from ..ops.laplace import LaplaceOperator


class HaloLaplace:
    """z-slab-distributed FE_Q Laplace vmult with explicit halo exchange."""

    def __init__(self, op: LaplaceOperator, mesh: Mesh, axis: str = "z"):
        self.op = op
        self.mesh = mesh
        self.axis = axis
        self.nd = mesh.shape[axis]
        grid = op.grid
        p = grid.degree
        ncz = grid.cells[0]
        assert ncz % self.nd == 0, "z cells must divide the device count"
        self.loc_cells = ncz // self.nd
        self.loc_nz = self.loc_cells * p + 1   # incl. shared planes
        self.Z = grid.shape[0]

    # ------------------------------------------------- layout conversions
    def distribute(self, u: jnp.ndarray) -> jnp.ndarray:
        """Global [Z, Y, X] -> [nd, loc_nz, Y, X] with duplicated shared
        planes, sharded over the device mesh."""
        p = self.op.grid.degree
        rows = np.concatenate(
            [np.arange(d * self.loc_cells * p, d * self.loc_cells * p + self.loc_nz)
             for d in range(self.nd)]
        )
        v = u[rows].reshape(self.nd, self.loc_nz, *u.shape[1:])
        return jax.device_put(v, NamedSharding(self.mesh, P(self.axis)))

    def collect(self, v: jnp.ndarray) -> jnp.ndarray:
        """Inverse of :meth:`distribute` (drops duplicated planes)."""
        parts = [np.asarray(v[0])]
        for d in range(1, self.nd):
            parts.append(np.asarray(v[d])[1:])
        return jnp.asarray(np.concatenate(parts, axis=0))

    # ---------------------------------------------------------- operators
    def _local_apply(self, xloc):
        """One device's share: masked local cell apply. The Dirichlet mask
        of the global operator is sliced to the local rows."""
        return self.op.apply_cells(xloc)

    def vmult_distributed(self, comm: bool = True):
        """Returns a jitted distributed vmult acting on [nd, loc_nz, Y, X].

        With ``comm=False`` the two neighbor permutes are replaced by zero
        traffic (same local compute): timing both variants yields the
        comm-vs-cell-loop split the reference prints per matvec
        (/root/reference/common/laplace_operator_dg.h:766-768)."""
        op = self.op
        nd, axis = self.nd, self.axis
        interior = np.asarray(~op.grid.boundary_mask())
        p = op.grid.degree
        loc_rows = [
            np.arange(d * self.loc_cells * p, d * self.loc_cells * p + self.loc_nz)
            for d in range(nd)
        ]
        masks = jnp.asarray(np.stack([interior[r] for r in loc_rows]))
        masks = jax.device_put(masks, NamedSharding(self.mesh, P(axis)))

        fwd = [(i, (i + 1) % nd) for i in range(nd)]
        bwd = [(i, (i - 1) % nd) for i in range(nd)]

        def body(x, m):
            x = x[0]
            m = m[0]
            d = jax.lax.axis_index(axis)
            xm = jnp.where(m, x, 0)
            if self.loc_cells >= 2:
                # comm/compute OVERLAP schedule (the reference's
                # cell_schedule_list, laplace_operator_dg.h:607-723, done
                # the XLA way): the compress exchange needs only the first
                # z-cell layer's partial, so that layer is computed FIRST
                # and the collective's dependency cone excludes the bulk
                # apply — XLA's latency-hiding scheduler can then run the
                # remaining layers while the permute is in flight.
                # Structurally asserted in tests/test_overlap.py via
                # jaxpr-cone analysis.  Term-identical to the unsplit
                # apply (shared-plane contributions commute; sub-slab dot
                # shapes may vectorize reductions 1 ulp differently).
                y0 = op.apply_cells(xm[: p + 1])
                first = y0[0]
                from_right = (jax.lax.ppermute(first, axis, bwd) if comm
                              else jnp.zeros_like(first))
                y_rest = op.apply_cells(xm[p:])
                y = jnp.concatenate(
                    [y0[:p], (y0[p] + y_rest[0])[None], y_rest[1:]], axis=0)
            else:
                y = op.apply_cells(xm)
                # compress(add): my first-plane partial belongs to the left
                # neighbor's last plane
                first = y[0]
                from_right = (jax.lax.ppermute(first, axis, bwd) if comm
                              else jnp.zeros_like(first))
            y = y.at[-1].add(jnp.where(d < nd - 1, 1.0, 0.0) * from_right)
            # update_ghost_values: completed last plane -> right neighbor
            last = y[-1]
            from_left = (jax.lax.ppermute(last, axis, fwd) if comm
                         else jnp.zeros_like(last))
            y = y.at[0].set(jnp.where(d > 0, from_left, y[0]))
            out = jnp.where(m, y, x)
            return out[None]

        shard_map = jax.shard_map

        return jax.jit(
            shard_map(
                body, mesh=self.mesh,
                in_specs=(P(axis), P(axis)), out_specs=P(axis),
            )
        ), masks

    def comm_split_report(self, n_rep: int = 50) -> dict:
        """Comm-vs-cell-loop wall-time split of the distributed matvec (the
        reference's per-matvec telemetry, laplace_operator_dg.h:766-768):
        times the full exchange variant and a zero-traffic variant of the
        SAME program and reports the difference as communication cost."""
        import time as _time

        import numpy as _np

        u = jnp.asarray(
            _np.random.default_rng(0).standard_normal(
                (self.Z,) + self.op.grid.shape[1:]
            ),
            self.op.dtype,
        )
        v = self.distribute(u)
        out = {}
        for name, flag in (("total", True), ("cell_loop", False)):
            fn, masks = self.vmult_distributed(comm=flag)
            fn(v, masks).block_until_ready()
            best = _np.inf
            for _ in range(3):
                t0 = _time.perf_counter()
                for _ in range(n_rep):
                    y = fn(v, masks)
                y.block_until_ready()
                best = min(best, (_time.perf_counter() - t0) / n_rep)
            out[name] = best
        out["comm"] = max(0.0, out["total"] - out["cell_loop"])
        out["comm_fraction"] = out["comm"] / out["total"] if out["total"] else 0.0
        return out

    def dot_distributed(self):
        """Owned-plane-masked global inner product (psum)."""
        axis, nd = self.axis, self.nd

        def body(a, b):
            d = jax.lax.axis_index(axis)
            a0 = a[0]
            b0 = b[0]
            w = jnp.ones((a0.shape[0], 1, 1), a0.dtype)
            w = w.at[0].set(jnp.where(d > 0, 0.0, 1.0))
            s = jnp.sum(a0 * b0 * w)
            return jax.lax.psum(s, axis)[None]

        shard_map = jax.shard_map

        return jax.jit(
            shard_map(body, mesh=self.mesh, in_specs=(P(self.axis), P(self.axis)),
                      out_specs=P(self.axis))
        )


class HaloLaplace2D:
    """('z','y')-decomposed FE_Q Laplace vmult with explicit two-axis halo
    exchange: dimension-by-dimension compress(add) then ghost update, four
    one-plane ppermutes per application.  Corner partials route through
    the z-pass then the y-pass automatically (fixed exchange order), the
    same schedule a 2-D MPI rank grid uses with deal.II's partitioner
    (/root/reference/common/laplace_operator.h:568-590)."""

    def __init__(self, op: LaplaceOperator, mesh: Mesh,
                 axes: tuple[str, str] = ("z", "y")):
        self.op = op
        self.mesh = mesh
        self.axes = axes
        grid = op.grid
        p = grid.degree
        self.nd = tuple(mesh.shape[a] for a in axes)
        for d, a in enumerate(axes):
            assert grid.cells[d] % self.nd[d] == 0
        self.loc_cells = tuple(grid.cells[d] // self.nd[d] for d in range(2))
        self.loc_n = tuple(c * p + 1 for c in self.loc_cells)

    # ------------------------------------------------- layout conversions
    def _rows(self, d, dev):
        p = self.op.grid.degree
        return np.arange(dev * self.loc_cells[d] * p,
                         dev * self.loc_cells[d] * p + self.loc_n[d])

    def distribute(self, u: jnp.ndarray) -> jnp.ndarray:
        """[Z, Y, X] -> [ndz, ndy, loc_nz, loc_ny, X] with duplicated
        shared planes, sharded over the 2-D device mesh."""
        ndz, ndy = self.nd
        blocks = np.empty((ndz, ndy, self.loc_n[0], self.loc_n[1], u.shape[2]),
                          np.asarray(u).dtype)
        un = np.asarray(u)
        for dz in range(ndz):
            for dy in range(ndy):
                blocks[dz, dy] = un[np.ix_(self._rows(0, dz),
                                           self._rows(1, dy))]
        return jax.device_put(
            blocks, NamedSharding(self.mesh, P(self.axes[0], self.axes[1])))

    def collect(self, v: jnp.ndarray) -> jnp.ndarray:
        vn = np.asarray(v)
        ndz, ndy = self.nd
        rows_z = [np.arange(0 if dz == 0 else 1, self.loc_n[0])
                  for dz in range(ndz)]
        out = np.concatenate(
            [np.concatenate(
                [vn[dz, dy][np.ix_(rows_z[dz],
                                   np.arange(0 if dy == 0 else 1,
                                             self.loc_n[1]))]
                 for dy in range(ndy)], axis=1)
             for dz in range(ndz)], axis=0)
        return jnp.asarray(out)

    # ---------------------------------------------------------- operators
    def vmult_distributed(self, comm: bool = True):
        op = self.op
        az, ay = self.axes
        ndz, ndy = self.nd
        interior = np.asarray(~op.grid.boundary_mask())
        masks = np.empty((ndz, ndy, self.loc_n[0], self.loc_n[1],
                          interior.shape[2]), bool)
        for dz in range(ndz):
            for dy in range(ndy):
                masks[dz, dy] = interior[np.ix_(self._rows(0, dz),
                                                self._rows(1, dy))]
        masks = jax.device_put(
            jnp.asarray(masks), NamedSharding(self.mesh, P(az, ay)))
        fwd_z = [(i, (i + 1) % ndz) for i in range(ndz)]
        bwd_z = [(i, (i - 1) % ndz) for i in range(ndz)]
        fwd_y = [(i, (i + 1) % ndy) for i in range(ndy)]
        bwd_y = [(i, (i - 1) % ndy) for i in range(ndy)]

        p = op.grid.degree
        split = self.loc_cells[0] >= 2 and self.loc_cells[1] >= 2

        def body(x, m):
            x = x[0, 0]
            m = m[0, 0]
            dz = jax.lax.axis_index(az)
            dy = jax.lax.axis_index(ay)
            xm = jnp.where(m, x, 0)
            if split:
                # three-box overlap schedule (cf. HaloLaplace.body): the
                # z-compress permute waits only for the z-layer-0 box, the
                # y-compress for z-layer-0 + the y-layer-0 strip (plus the
                # z permute — corner routing is inherently ordered); the
                # BULK box is outside both cones and overlaps both
                # exchanges under XLA's latency-hiding scheduler.
                S1 = op.apply_cells(xm[: p + 1])           # z-layer 0
                fz = S1[0]
                from_right_z = (jax.lax.ppermute(fz, az, bwd_z) if comm
                                else jnp.zeros_like(fz))
                S2 = op.apply_cells(xm[p:, : p + 1])       # z-rest, y-lay 0
                fy = jnp.concatenate(
                    [S1[:p, 0], (S1[p, 0] + S2[0, 0])[None], S2[1:, 0]],
                    axis=0)
                fy = fy.at[-1].add(jnp.where(dz < ndz - 1, 1.0, 0.0)
                                   * from_right_z[0])
                from_right_y = (jax.lax.ppermute(fy, ay, bwd_y) if comm
                                else jnp.zeros_like(fy))
                S3 = op.apply_cells(xm[p:, p:])            # the bulk
                ymid = jnp.concatenate(
                    [S2[:, :p], (S2[:, p] + S3[:, 0])[:, None], S3[:, 1:]],
                    axis=1)
                y = jnp.concatenate(
                    [S1[:p], (S1[p] + ymid[0])[None], ymid[1:]], axis=0)
            else:
                y = op.apply_cells(xm)
                # compress(add), z then y (corners ride both passes)
                fz = y[0]
                from_right_z = (jax.lax.ppermute(fz, az, bwd_z) if comm
                                else jnp.zeros_like(fz))
                y = y.at[-1].add(jnp.where(dz < ndz - 1, 1.0, 0.0)
                                 * from_right_z)
                fy = y[:, 0]
                from_right_y = (jax.lax.ppermute(fy, ay, bwd_y) if comm
                                else jnp.zeros_like(fy))
            if split:
                y = y.at[-1].add(jnp.where(dz < ndz - 1, 1.0, 0.0)
                                 * from_right_z)
            y = y.at[:, -1].add(jnp.where(dy < ndy - 1, 1.0, 0.0)
                                * from_right_y)
            # ghost updates in reverse order (y then z) so the corner
            # reaches the diagonal neighbor through the z pass
            ly = y[:, -1]
            from_left_y = (jax.lax.ppermute(ly, ay, fwd_y) if comm
                           else jnp.zeros_like(ly))
            y = y.at[:, 0].set(jnp.where(dy > 0, from_left_y, y[:, 0]))
            lz = y[-1]
            from_left_z = (jax.lax.ppermute(lz, az, fwd_z) if comm
                           else jnp.zeros_like(lz))
            y = y.at[0].set(jnp.where(dz > 0, from_left_z, y[0]))
            out = jnp.where(m, y, x)
            return out[None, None]

        return jax.jit(
            jax.shard_map(body, mesh=self.mesh,
                          in_specs=(P(az, ay), P(az, ay)),
                          out_specs=P(az, ay))
        ), masks

    def dot_distributed(self):
        """Owned-plane-masked global inner product (psum over both axes)."""
        az, ay = self.axes

        def body(a, b):
            dz = jax.lax.axis_index(az)
            dy = jax.lax.axis_index(ay)
            a0 = a[0, 0]
            b0 = b[0, 0]
            wz = jnp.ones((a0.shape[0], 1, 1), a0.dtype)
            wz = wz.at[0].set(jnp.where(dz > 0, 0.0, 1.0))
            wy = jnp.ones((1, a0.shape[1], 1), a0.dtype)
            wy = wy.at[:, 0].set(jnp.where(dy > 0, 0.0, 1.0))
            s = jnp.sum(a0 * b0 * wz * wy)
            return jax.lax.psum(jax.lax.psum(s, az), ay)[None, None]

        return jax.jit(
            jax.shard_map(body, mesh=self.mesh,
                          in_specs=(P(az, ay), P(az, ay)),
                          out_specs=P(az, ay))
        )
