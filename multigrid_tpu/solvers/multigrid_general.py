"""Mixed-precision multigrid on mapped multiblock (curved) meshes.

Same algorithm as :class:`multigrid_tpu.solvers.multigrid.MultigridSolver`
(the reference's MultigridSolver, /root/reference/common/multigrid_solver.h),
running on the general-geometry operator stack: per-quad-point merged
coefficients, index-table gather/scatter, multiblock transfers.  Used by
poisson_shell (variable coefficient, curved shell) and as the linear solver
inside minimal_surface's Newton loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.mapped import GeneralGrid, MappedMesh
from ..ops.laplace_general import GeneralLaplace
from ..ops.transfer_general import GeneralTransfer
from .cg import CGResult, cg_solve
from .chebyshev import FIRST_KIND, Chebyshev


class GeneralMultigridSolver:
    def __init__(
        self,
        mesh: MappedMesh,
        degree: int,
        exact_fn: Callable,
        rhs_fn: Callable,
        coef_fn: Optional[Callable] = None,
        n_pre: int = 2,
        n_post: int = 2,
        n_cycles: int = 1,
        v_dtype=jnp.float32,
        f_dtype=jnp.float64,
    ):
        assert n_pre == n_post
        self.mesh = mesh
        self.n_cycles = n_cycles
        self._n_pre = n_pre
        self.v_dtype, self.f_dtype = v_dtype, f_dtype
        self.minlevel = 0
        self.maxlevel = mesh.max_level
        L = mesh.n_levels

        self.grids = [GeneralGrid(mesh, l, degree) for l in range(L)]
        self.ops = []
        self.ops_dp = []
        for g in self.grids:
            coef = g.merged_coefficient(coef_fn)
            self.ops.append(GeneralLaplace(g, v_dtype, coef=coef))
            self.ops_dp.append(GeneralLaplace(g, f_dtype, coef=coef))
        self.transfers = [None] + [
            GeneralTransfer(self.grids[l], self.grids[l - 1], v_dtype, True)
            for l in range(1, L)
        ]
        self.transfers_nobc = [None] + [
            GeneralTransfer(self.grids[l], self.grids[l - 1], f_dtype, False)
            for l in range(1, L)
        ]

        self.bmask = [jnp.asarray(g.boundary) for g in self.grids]
        self.u_bc, self.rhs, self.exact_quad = [], [], []
        for l, g in enumerate(self.grids):
            coords = [g.node_coords[:, d] for d in range(g.dim)]
            vals = np.asarray(exact_fn(coords), np.float64)
            ubc = jnp.asarray(np.where(g.boundary, vals, 0.0), f_dtype)
            self.u_bc.append(ubc)
            qc = [g.quad_coords[..., d] for d in range(g.dim)]
            fq = np.broadcast_to(np.asarray(rhs_fn(qc), np.float64),
                                 g.jxw.shape)
            shape = (g.n_cells,) + (g.n,) * g.dim
            self.rhs.append(
                jax.jit(self.ops_dp[l].compute_rhs)(
                    jnp.asarray(fq.reshape(shape), f_dtype), ubc
                )
            )
            eq = np.broadcast_to(np.asarray(exact_fn(qc), np.float64), g.jxw.shape)
            self.exact_quad.append(jnp.asarray(eq.reshape(shape), f_dtype))

        self.smoothers = []
        for l in range(L):
            inv_diag = jax.jit(self.ops[l].inverse_diagonal)()
            if l > self.minlevel:
                sm = Chebyshev.create(
                    self.ops[l].vmult, inv_diag, smoothing_range=20.0,
                    degree=n_pre, eig_cg_n_iterations=15, kind=FIRST_KIND,
                )
            else:
                sm = Chebyshev.create(
                    self.ops[l].vmult, inv_diag, smoothing_range=1e-3,
                    degree=None, eig_cg_n_iterations=self.grids[l].n_dofs,
                    kind=FIRST_KIND,
                )
            self.smoothers.append(sm)
        self._fmg_jit = None
        self._cg_jit = None

    # ---------------------------------------------------------------- core
    def v_cycle(self, level: int, defect: jnp.ndarray, n_cyc: int) -> jnp.ndarray:
        if level == self.minlevel:
            return self.smoothers[level].vmult(defect)
        upd = None
        for _ in range(n_cyc):
            if upd is None:
                upd = self.smoothers[level].vmult(defect)
            else:
                upd = self.smoothers[level].step(upd, defect)
            t = self.ops[level].vmult_residual(defect, upd)
            dc = self.transfers[level].restrict(t)
            corr = self.v_cycle(level - 1, dc, 1)
            upd = upd + self.transfers[level].prolongate(corr)
            upd = self.smoothers[level].step(upd, defect)
        return upd

    def _fmg(self):
        d0 = self.rhs[0].astype(self.v_dtype)
        t = self.smoothers[0].vmult(d0)
        t = self.smoothers[0].step(t, d0)
        sol = t.astype(self.f_dtype)
        for l in range(1, self.maxlevel + 1):
            sol_bc = jnp.where(self.bmask[l - 1], self.u_bc[l - 1], sol)
            sol = self.transfers_nobc[l].prolongate(sol_bc)
            sol = jnp.where(self.bmask[l], 0.0, sol)
            res = self.ops_dp[l].vmult_residual(self.rhs[l], sol)
            upd = self.v_cycle(l, res.astype(self.v_dtype), self.n_cycles)
            sol = sol + upd.astype(self.f_dtype)
        return sol

    def solve(self) -> jnp.ndarray:
        if self._fmg_jit is None:
            self._fmg_jit = jax.jit(self._fmg)
        sol = self._fmg_jit()
        return jnp.where(self.bmask[self.maxlevel], self.u_bc[self.maxlevel], sol)

    def _precond(self, r):
        return self.v_cycle(self.maxlevel, r.astype(self.v_dtype), 1).astype(self.f_dtype)

    def solve_cg(self, rtol=1e-9, abs_tol=1e-16, max_iterations=1000, b=None):
        if self._cg_jit is None:
            self._cg_jit = jax.jit(
                partial(cg_solve, self.ops_dp[self.maxlevel].vmult,
                        precond=self._precond, max_iterations=max_iterations,
                        abs_tol=abs_tol, rtol=rtol)
            )
        res: CGResult = self._cg_jit(self.rhs[self.maxlevel] if b is None else b)
        its = int(res.iterations)
        red = float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
        sol = jnp.where(self.bmask[self.maxlevel], self.u_bc[self.maxlevel], res.x)
        return sol, its, red

    # --------------------------------------------------- nonlinear support
    def update_coefficients(self, coefs):
        """Replace per-level merged coefficients (device arrays shaped like
        op.C) and rebuild diagonals + Chebyshev smoothers — the per-Newton-
        iteration refresh of minimal_surface
        (/root/reference/minimal_surface/program.cc:458-489)."""
        for l, C in enumerate(coefs):
            self.ops[l].C = C.astype(self.v_dtype)
            self.ops_dp[l].C = C.astype(self.f_dtype)
        smoothers = []
        for l in range(len(self.grids)):
            inv_diag = jax.jit(self.ops[l].inverse_diagonal)()
            if l > self.minlevel:
                sm = Chebyshev.create(
                    self.ops[l].vmult, inv_diag, smoothing_range=20.0,
                    degree=self._n_pre, eig_cg_n_iterations=15,
                    kind=FIRST_KIND,
                )
            else:
                sm = Chebyshev.create(
                    self.ops[l].vmult, inv_diag, smoothing_range=1e-3,
                    degree=None, eig_cg_n_iterations=self.grids[l].n_dofs,
                    kind=FIRST_KIND,
                )
            smoothers.append(sm)
        self.smoothers = smoothers
        self._cg_jit = None
        self._fmg_jit = None

    def l2_error(self, level: int, sol: jnp.ndarray) -> float:
        u = jnp.where(self.bmask[level], self.u_bc[level], sol)
        return float(self.ops_dp[level].l2_error(u, self.exact_quad[level]))
