"""Local-smoothing multigrid on adaptive forests (the reference's poisson_l
algorithm, as an alternative to solvers/multigrid_adaptive.py's global
coarsening).

The reference preconditions with deal.II ``Multigrid`` + ``MGConstrainedDoFs``
+ ``MGInterfaceOperator`` edge matrices (/root/reference/poisson_l/program.cc:
338-416, esp. 372-383): level ``l`` is the UNIFORM-depth mesh of all tree
cells at depth ``l`` (active cells plus ancestors of deeper ones), covering
only the subdomain refined to depth >= l; smoothing happens per level with
the refinement-edge dofs (level boundary interior to the domain) held at
zero, and interface matrices carry the residual coupling across the edge
(``vmult_interface_down/up``, /root/reference/gpu/poisson_l.cu:390-436).

TPU-first rendering (no translation of the deal.II bookkeeping):

* every level mesh is uniform-depth, so its operator is ONE batched
  dense-element MXU matmul with a trivial gather (no hanging constraints
  inside a level — the core reason local smoothing maps well to the MXU);
* the reference's separate ``vmult_residual`` + ``vmult_interface_down``
  passes fuse into a single unmasked operator application: with the
  smoother update supported on interior dofs, ``d - A_l u`` evaluated with
  TRUE matrix rows is simultaneously the level residual (interior rows) and
  the edge coupling (edge rows), so one cell loop feeds the restriction;
* ``vmult_interface_up`` keeps its own (cheap) application after
  prolongation: ``interior . A_l . edge``;
* the global<->level residual pairing copies each global dof to exactly ONE
  level — the finest level where it sits on an ACTIVE cell (static gather
  tables).  Restriction is the plain transpose of the nested point-eval
  prolongation (unconstrained); domain-Dirichlet rows are masked out of the
  restricted residual, refinement-edge rows are NOT (their content is the
  global residual that is native to the coarser level plus the down
  coupling).

The cycle is symmetric (adjoint smoother pairs, up = down^T, R = P^T, copy
in/out transposes), verified in tests/test_local_smoothing.py together with
exact reduction to the textbook V-cycle on uniformly refined forests.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.adaptive import AdaptiveGrid, Forest
from ..ops.laplace_adaptive import AdaptiveLaplace
from .cg import CGResult, cg_solve
from .chebyshev import FIRST_KIND, Chebyshev


def level_forest(forest: Forest, level: int) -> Forest:
    """Uniform-depth level mesh: all tree cells at ``level`` (active cells
    of that depth plus ancestors of deeper active cells) — deal.II's level
    view of the triangulation."""
    cells = {c for c in forest.active if c.level == level}
    cells |= {c for c in forest.ancestors if c.level == level}
    return forest._make(cells)


def _match_coords(A: np.ndarray, B: np.ndarray, tol: float) -> np.ndarray:
    """Index of each row of B in A (coordinate match within tol), -1 if
    absent.  A's rows must be pairwise distinct."""
    from ..mesh import native

    both = np.ascontiguousarray(np.vstack([A, B]))
    n_nodes, inverse = native.unique_nodes(both, tol)
    lookup = np.full(n_nodes, -1, np.int64)
    lookup[inverse[: len(A)]] = np.arange(len(A))
    return lookup[inverse[len(A):]]


class LocalLevel:
    """One level of the local-smoothing hierarchy: uniform-depth grid,
    constrained masks, and the fused operator pieces."""

    def __init__(self, global_forest: Forest, level: int, degree: int,
                 boundary_fn: Callable, v_dtype):
        self.level = level
        forest = level_forest(global_forest, level)
        self.forest = forest
        grid = AdaptiveGrid(forest, degree, boundary_fn)
        assert grid.n_constraints == 0, "uniform-depth level mesh"
        self.grid = grid
        self.op = AdaptiveLaplace(grid, v_dtype)

        # ---- refinement-edge mask: nodes on faces whose same-depth
        # neighbor is missing from the level mesh but whose region is
        # covered by the global forest (i.e. the active mesh is coarser
        # there).  Missing AND uncovered faces are domain boundary.
        n = grid.n
        dim = grid.dim
        boundary = grid.boundary.copy()
        edge = np.zeros(grid.n_dofs, bool)
        node_of = grid.gidx[:, :, 0].reshape((-1,) + (n,) * dim)
        for ci, c in enumerate(grid.cells):
            for d in range(dim):
                axis = dim - 1 - d  # local axis of coordinate d
                for side in (0, 1):
                    nb = forest.neighbor(c, d, side)
                    if nb is not None and nb in forest.active:
                        continue
                    face = np.take(node_of[ci], -1 if side else 0, axis=axis)
                    if nb is not None and global_forest._covered(nb):
                        edge[face.reshape(-1)] = True
                    else:
                        boundary[face.reshape(-1)] = True
        self.edge = edge & ~boundary
        self.boundary = boundary
        self.constrained = boundary | self.edge
        self._int = jnp.asarray(~self.constrained)
        self._edge = jnp.asarray(self.edge)
        self._bdry = jnp.asarray(boundary)
        inv_diag = np.asarray(self.op.inv_diag_arr, np.float64).copy()
        inv_diag[self.constrained] = 1.0
        self._inv_diag = jnp.asarray(inv_diag, v_dtype)

    # ------------------------------------------------- operator pieces
    def vmult(self, x):
        """Smoother operator: interior block of A_l (identity on
        constrained rows; the smoother's preconditioner is interior-masked,
        so constrained rows never feed an update)."""
        xm = jnp.where(self._int, x, 0)
        return jnp.where(self._int, self.op.apply_cells(xm), x)

    def precond(self, r):
        return jnp.where(self._int, self._inv_diag * r, 0)

    def residual_full_rows(self, d, u):
        """``d - A_l u`` with TRUE rows everywhere: interior rows carry the
        level residual, edge rows the down interface coupling
        (vmult_interface_down fused into the residual pass; ``u`` is
        interior-supported).  Domain-Dirichlet rows are zeroed — their test
        functions are not part of the global space."""
        t = d - self.op.apply_cells(jnp.where(self._int, u, 0))
        return jnp.where(self._bdry, 0, t)

    def interface_up(self, x):
        """``interior . A_l . edge`` — the defect change at interior rows
        from the edge values set by prolongation (vmult_interface_up,
        /root/reference/gpu/poisson_l.cu:418-436)."""
        xe = jnp.where(self._edge, x, 0)
        return jnp.where(self._int, self.op.apply_cells(xe), 0)


class LevelTransfer:
    """Unconstrained nested-mesh transfer between consecutive uniform-depth
    level meshes: prolongation = parent-cell point evaluation (edge and
    boundary values of the fine level ARE produced), restriction = exact
    transpose."""

    def __init__(self, fine: AdaptiveGrid, coarse: AdaptiveGrid, dtype):
        idx, w = fine.point_eval_table(coarse)
        self.idx = jnp.asarray(idx)
        self.w = jnp.asarray(w, dtype)
        self.n_coarse = coarse.n_dofs

    def prolongate(self, uc):
        return jnp.sum(uc[self.idx] * self.w, axis=-1)

    def restrict(self, rf):
        out = jnp.zeros(self.n_coarse, rf.dtype)
        return out.at[self.idx].add(rf[:, None] * self.w)


class LocalSmoothingMultigrid:
    """CG on the global adaptive system, preconditioned by one V-cycle of
    level-local smoothing (poisson_l's solver; reference smoother settings
    program.cc:349-365: range 15 / degree n_smoother / 15 eig its on the
    levels, range 1e-3 / auto degree / full eig on the coarsest)."""

    def __init__(self, grid: AdaptiveGrid, exact_fn: Callable,
                 rhs_fn: Callable, n_pre: int = 2, v_dtype=jnp.float32,
                 f_dtype=jnp.float64, smoothing_range: float = 15.0):
        self.grid = grid
        self.grids = [grid]        # driver API parity with the GC solver
        self.v_dtype, self.f_dtype = v_dtype, f_dtype
        forest = grid.forest
        L = forest.max_active_level
        self.maxlevel = L
        self.levels = [LocalLevel(forest, l, grid.degree, _grid_boundary(grid),
                                  v_dtype) for l in range(L + 1)]
        self.transfers = [None] + [
            LevelTransfer(self.levels[l].grid, self.levels[l - 1].grid,
                          v_dtype)
            for l in range(1, L + 1)
        ]
        assert not self.levels[0].edge.any(), \
            "coarsest level mesh must cover the whole domain"

        # global dof -> (finest active level, level dof) copy tables
        tol = 1e-12 * (abs(forest.extent) + abs(forest.origin) + 1.0)
        native_level = np.full(grid.n_dofs, -1, np.int64)
        native_ldof = np.full(grid.n_dofs, -1, np.int64)
        for l in range(L + 1):
            lv = self.levels[l]
            active_rows = [ci for ci, c in enumerate(lv.grid.cells)
                           if c in forest.active]
            if not active_rows:
                continue
            ldofs = np.unique(lv.grid.gidx[active_rows, :, 0])
            g_of = _match_coords(grid.dof_xy, lv.grid.dof_xy[ldofs], tol)
            sel = g_of >= 0        # hanging positions have no global dof
            native_level[g_of[sel]] = l      # finest wins (l ascending)
            native_ldof[g_of[sel]] = ldofs[sel]
        assert (native_level >= 0).all(), "every global dof sits on an active cell"
        self.copy_glb = []
        self.copy_lvl = []
        for l in range(L + 1):
            g_idx = np.nonzero(native_level == l)[0]
            self.copy_glb.append(jnp.asarray(g_idx))
            self.copy_lvl.append(jnp.asarray(native_ldof[g_idx]))

        # smoothers (reference poisson_l settings)
        self.smoothers = []
        for l, lv in enumerate(self.levels):
            example = jnp.zeros(lv.grid.n_dofs, v_dtype)
            if l == 0:
                sm = Chebyshev.create(
                    lv.vmult, None, smoothing_range=1e-3, degree=None,
                    eig_cg_n_iterations=lv.grid.n_dofs, kind=FIRST_KIND,
                    precond=lv.precond, example=example)
            else:
                sm = Chebyshev.create(
                    lv.vmult, None, smoothing_range=smoothing_range,
                    degree=n_pre, eig_cg_n_iterations=15, kind=FIRST_KIND,
                    precond=lv.precond, example=example)
            self.smoothers.append(sm)

        # global system (same as the global-coarsening solver)
        self.op_dp = AdaptiveLaplace(grid, f_dtype)
        dim = grid.dim
        vals = np.asarray(exact_fn([grid.dof_xy[:, d] for d in range(dim)]),
                          float)
        self.u_bc = jnp.asarray(np.where(grid.boundary, vals, 0.0), f_dtype)
        qxy = self.op_dp.quad_points()
        qc = [qxy[..., d] for d in range(dim)]
        f_quad = jnp.asarray(np.asarray(rhs_fn(qc), float), f_dtype)
        f_quad = jnp.broadcast_to(f_quad, (grid.n_cells, self.op_dp.N))
        self.rhs = self.op_dp.compute_rhs(f_quad, self.u_bc)
        self.exact_quad = jnp.asarray(np.asarray(exact_fn(qc), float), f_dtype)
        self._cg_jit = None

    # --------------------------------------------------------- V-cycle
    def v_cycle(self, r_global):
        """One local-smoothing V-cycle applied to a global residual."""
        L = self.maxlevel
        d = [jnp.zeros(lv.grid.n_dofs, r_global.dtype) for lv in self.levels]
        for l in range(L + 1):
            d[l] = d[l].at[self.copy_lvl[l]].set(r_global[self.copy_glb[l]])
        u = [None] * (L + 1)
        for l in range(L, 0, -1):
            u[l] = self.smoothers[l].vmult(d[l])
            t = self.levels[l].residual_full_rows(d[l], u[l])
            d[l - 1] = d[l - 1] + self.transfers[l].restrict(t)
        u[0] = self.smoothers[0].vmult(d[0])
        for l in range(1, L + 1):
            pu = self.transfers[l].prolongate(u[l - 1])
            u[l] = u[l] + pu
            d[l] = d[l] - self.levels[l].interface_up(pu)
            u[l] = self.smoothers[l].step(u[l], d[l])
        out = jnp.zeros_like(r_global)
        for l in range(L + 1):
            out = out.at[self.copy_glb[l]].set(u[l][self.copy_lvl[l]])
        return out

    def _precond(self, r):
        return self.v_cycle(r.astype(self.v_dtype)).astype(self.f_dtype)

    def solve_cg(self, rtol: float = 1e-9, max_iterations: int = 100):
        if self._cg_jit is None:
            self._cg_jit = jax.jit(
                partial(cg_solve, self.op_dp.vmult, precond=self._precond,
                        max_iterations=max_iterations, abs_tol=1e-16,
                        rtol=rtol))
        res: CGResult = self._cg_jit(self.rhs)
        its = int(res.iterations)
        red = float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
        sol = jnp.where(jnp.asarray(self.grid.boundary), self.u_bc, res.x)
        return sol, its, red

    def l2_error(self, sol) -> float:
        return float(self.op_dp.l2_error(sol, self.exact_quad))


def _grid_boundary(grid: AdaptiveGrid):
    """Recover a geometric boundary predicate from the global grid's mask
    (level meshes share nodes with the global mesh only where both exist;
    elsewhere the level-local face logic fills in)."""
    tol = 1e-12 * (np.abs(grid.dof_xy).max() + 1.0)
    bxy = grid.dof_xy[grid.boundary]

    def fn(xy):
        return _match_coords(np.ascontiguousarray(bxy),
                             np.ascontiguousarray(xy), tol) >= 0

    return fn
