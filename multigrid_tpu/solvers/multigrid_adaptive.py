"""Multigrid over adaptively refined mesh hierarchies (poisson_l).

The reference solves the hanging-node problem with deal.II's Multigrid +
local smoothing + MGInterfaceOperator edge matrices
(/root/reference/poisson_l/program.cc:338-416).  The TPU-native redesign
uses the GLOBAL-COARSENING formulation instead (deal.II's own modern
alternative, MGTransferGlobalCoarsening): the level spaces are the FULL
active meshes of the AMR history (each nested in the next), transfers are
point-evaluation gathers between nested meshes, and every level smooths on
its whole mesh — no interface matrices, no per-level cell masks, and every
level is one uniformly batched operator, which is exactly what the MXU
wants.  Convergence is mesh-independent like local smoothing.

Mixed precision follows the main solver: fp32 V-cycle inside the fp64
outer CG (multigrid_solver.h:437/456 cast points).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.adaptive import AdaptiveGrid
from ..ops.laplace_adaptive import AdaptiveLaplace
from .cg import CGResult, cg_solve
from .chebyshev import FIRST_KIND, Chebyshev


class NestedTransfer:
    """Prolongation = point evaluation of the coarse FE function at fine
    dof positions; restriction = exact adjoint."""

    def __init__(self, fine: AdaptiveGrid, coarse: AdaptiveGrid, dtype):
        idx, w = fine.point_eval_table(coarse)
        self.idx = jnp.asarray(idx)
        self.w = jnp.asarray(w, dtype)
        self.fine_interior = jnp.asarray(~fine.boundary)
        self.coarse_interior = jnp.asarray(~coarse.boundary)
        self.n_coarse = coarse.n_dofs

    def prolongate(self, uc):
        u = jnp.where(self.coarse_interior, uc, 0)
        uf = jnp.sum(u[self.idx] * self.w, axis=-1)
        return jnp.where(self.fine_interior, uf, 0)

    def restrict(self, rf):
        r = jnp.where(self.fine_interior, rf, 0)
        out = jnp.zeros(self.n_coarse, r.dtype)
        out = out.at[self.idx].add(r[:, None] * self.w)
        return jnp.where(self.coarse_interior, out, 0)


class AdaptiveMultigridSolver:
    """CG preconditioned by one V-cycle over the nested mesh history."""

    def __init__(
        self,
        grids: list[AdaptiveGrid],
        exact_fn: Callable,
        rhs_fn: Callable,
        n_pre: int = 2,
        v_dtype=jnp.float32,
        f_dtype=jnp.float64,
    ):
        self.grids = grids
        self.maxlevel = len(grids) - 1
        self.v_dtype, self.f_dtype = v_dtype, f_dtype
        self.ops = [AdaptiveLaplace(g, v_dtype) for g in grids]
        self.op_dp = AdaptiveLaplace(grids[-1], f_dtype)
        self.transfers = [None] + [
            NestedTransfer(grids[l], grids[l - 1], v_dtype)
            for l in range(1, len(grids))
        ]
        self.smoothers = []
        for l, op in enumerate(self.ops):
            example = jnp.zeros(grids[l].n_dofs, v_dtype)
            if l == 0:
                sm = Chebyshev.create(
                    op.vmult, op.inverse_diagonal(),
                    smoothing_range=1e-3, degree=None,
                    eig_cg_n_iterations=grids[l].n_dofs,
                    kind=FIRST_KIND, example=example,
                )
            else:
                sm = Chebyshev.create(
                    op.vmult, op.inverse_diagonal(),
                    smoothing_range=20.0, degree=n_pre,
                    eig_cg_n_iterations=15, kind=FIRST_KIND, example=example,
                )
            self.smoothers.append(sm)

        # boundary data + rhs on the finest grid
        g = grids[-1]
        dim = g.dim
        vals = np.asarray(
            exact_fn([g.dof_xy[:, d] for d in range(dim)]), float)
        self.u_bc = jnp.asarray(np.where(g.boundary, vals, 0.0), f_dtype)
        qxy = self.op_dp.quad_points()
        qc = [qxy[..., d] for d in range(dim)]
        f_quad = jnp.asarray(np.asarray(rhs_fn(qc), float), f_dtype)
        f_quad = jnp.broadcast_to(f_quad, (g.n_cells, self.op_dp.N))
        self.rhs = self.op_dp.compute_rhs(f_quad, self.u_bc)
        self.exact_quad = jnp.asarray(
            np.asarray(exact_fn(qc), float), f_dtype
        )
        self._cg_jit = None

    def v_cycle(self, level: int, defect):
        if level == 0:
            return self.smoothers[0].vmult(defect)
        upd = self.smoothers[level].vmult(defect)
        t = self.ops[level].vmult_residual(defect, upd)
        dc = self.transfers[level].restrict(t)
        corr = self.v_cycle(level - 1, dc)
        upd = upd + self.transfers[level].prolongate(corr)
        return self.smoothers[level].step(upd, defect)

    def _precond(self, r):
        return self.v_cycle(self.maxlevel, r.astype(self.v_dtype)).astype(
            self.f_dtype
        )

    def solve_cg(self, rtol: float = 1e-9, max_iterations: int = 100):
        if self._cg_jit is None:
            self._cg_jit = jax.jit(
                partial(cg_solve, self.op_dp.vmult, precond=self._precond,
                        max_iterations=max_iterations, abs_tol=1e-16,
                        rtol=rtol)
            )
        res: CGResult = self._cg_jit(self.rhs)
        its = int(res.iterations)
        red = float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
        g = self.grids[-1]
        sol = jnp.where(jnp.asarray(g.boundary), self.u_bc, res.x)
        return sol, its, red

    def l2_error(self, sol) -> float:
        return float(self.op_dp.l2_error(sol, self.exact_quad))
