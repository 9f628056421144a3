"""End-to-end distributed multigrid over a jax.sharding.Mesh (GSPMD).

TPU-native rendering of the reference's per-level MPI decomposition
(/root/reference/common/multigrid_solver.h:151-200: one partitioned vector
storage per level, all ranks active on every level): every level's node-grid
vectors carry a ``NamedSharding`` that splits the slow axes (z, then y)
across the device mesh, and ``lax.with_sharding_constraint`` hooks inside
the jitted FMG/V-cycle/CG keep GSPMD from collapsing intermediate levels to
one device.  XLA then inserts the halo ``collective-permute``s for the
window shifts and ``psum``s for the inner products — the compiler-scheduled
equivalent of the reference's hand-rolled ghost exchange
(laplace_operator_dg.h:543-723), with communication overlapped by XLA's
async collectives rather than a manual ``cell_schedule_list``.

Coarse-level policy: once a level is too small to usefully split
(fewer than ``min_local`` node planes per device on every mesh axis), its
vectors are REPLICATED — the restriction into that level lowers to an
all-gather and everything below runs redundantly on all devices, which is
both faster (no latency-bound tiny collectives per smoother step) and the
moral equivalent of the reference keeping every rank active on every level
(multigrid_solver.h:72-91 keeps a serial coarse solve on rank 0 out of the
design for the same reason).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import make_mesh


def level_spec(shape, mesh: Mesh, min_local: int = 2) -> P:
    """PartitionSpec for one level's node grid: split grid axis i by mesh
    axis i while each device keeps >= min_local node planes; otherwise
    leave that axis (and, if no axis splits, the whole level) replicated."""
    names = list(mesh.axis_names)
    spec = [None] * len(shape)
    for i, ax in enumerate(names):
        if i < len(shape) and shape[i] // mesh.shape[ax] >= min_local:
            spec[i] = ax
    return P(*spec)


class DistributedMultigrid:
    """Wrap a constructed ``MultigridSolver`` (or any solver exposing
    ``grids``/``rhs``/``u_bc``/``_constrain``/``reset_jit_caches``) so all
    its solve paths run domain-decomposed over ``mesh`` on every level."""

    def __init__(self, solver, mesh: Optional[Mesh] = None, min_local: int = 2):
        if mesh is None:
            mesh = make_mesh()
        self.solver = solver
        self.mesh = mesh
        self.shardings = [
            NamedSharding(mesh, level_spec(g.shape, mesh, min_local))
            for g in solver.grids
        ]
        solver._constrain = self.constrain
        solver.reset_jit_caches()
        # Boundary contract: node grids are N*p+1 wide — never divisible by a
        # power-of-two device count — and jax.Array shardings must divide
        # evenly, so solve inputs/outputs cross the jit boundary REPLICATED.
        # Inside the traced program the ``with_sharding_constraint`` hooks
        # split every level's vectors across the mesh (GSPMD pads uneven
        # interior shardings itself), so all solve work runs decomposed and
        # only the final result gathers.
        repl = NamedSharding(mesh, P())
        solver.rhs = [jax.device_put(r, repl) for r in solver.rhs]
        solver.u_bc = [jax.device_put(u, repl) for u in solver.u_bc]
        # the z-layer-chunked transfer sweeps dynamic-slice the sharded z
        # axis (GSPMD would insert per-layer gathers); monolithic windows
        # shard cleanly, so force them when domain-decomposed
        for tr in (getattr(solver, "transfers", None) or []) + (
                getattr(solver, "transfers_nobc", None) or []):
            if tr is not None and hasattr(tr, "_CHUNK_DOFS"):
                tr._CHUNK_DOFS = float("inf")

    def constrain(self, level: int, x):
        return jax.lax.with_sharding_constraint(x, self.shardings[level])

    # convenience pass-throughs
    def solve(self):
        return self.solver.solve()

    def solve_cg(self, **kw):
        return self.solver.solve_cg(**kw)

    def distributed_levels(self) -> list[bool]:
        """Which levels actually split across devices (False = replicated)."""
        return [s.spec != P(*([None] * len(g.shape)))
                for s, g in zip(self.shardings, self.solver.grids)]


def dg_block_spec(grid, mesh: Mesh, min_local: int = 1) -> P:
    """PartitionSpec for a DG block array ``[C0, C1(, C2), n, n(, n)]``:
    split the leading CELL axes across the device mesh (the intra-cell dof
    axes stay local — a cell never crosses a device, exactly the
    reference's cell-ownership partition, p4est SFC per level)."""
    spec = [None] * (2 * grid.dim)
    for i, ax in enumerate(mesh.axis_names):
        if i < grid.dim and grid.cells[i] // mesh.shape[ax] >= min_local:
            spec[i] = ax
    return P(*spec)


class DistributedMultigridDG:
    """Distribute the DG solvers (``MultigridSolverDG`` / ``DGPlain``) over
    a device mesh via GSPMD: DG block vectors are domain-decomposed on
    their cell axes; for the DG-over-CG solver the auxiliary FE_Q
    hierarchy is wrapped with :class:`DistributedMultigrid` so EVERY level
    of the combined cycle runs decomposed.  XLA inserts the face-halo
    collective-permutes of the fused cell+face operator — the
    compiler-scheduled equivalent of the reference's hand-rolled ghost
    exchange (/root/reference/common/laplace_operator_dg.h:981-1058 driven
    from multigrid_solver_dg.h:447-534)."""

    def __init__(self, solver, mesh: Optional[Mesh] = None,
                 min_local: int = 1):
        if mesh is None:
            mesh = make_mesh()
        self.solver = solver
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        if hasattr(solver, "grids"):          # pure-DG h-multigrid
            self.shardings = [
                NamedSharding(mesh, dg_block_spec(g, mesh, min_local))
                for g in solver.grids
            ]
            shardings = self.shardings

            def constrain(level, x):
                return jax.lax.with_sharding_constraint(x, shardings[level])

            solver._constrain = constrain
        else:                                 # DG-over-CG
            sh = NamedSharding(
                mesh, dg_block_spec(solver.dg_grid, mesh, min_local))
            solver._constrain_dg = (
                lambda x: jax.lax.with_sharding_constraint(x, sh))
            self.shardings = [sh]
            self.cg_wrap = DistributedMultigrid(solver.cg, mesh)
        solver.reset_jit_caches()
        solver.rhs = jax.device_put(solver.rhs, repl)

    def solve_cg(self, **kw):
        return self.solver.solve_cg(**kw)
