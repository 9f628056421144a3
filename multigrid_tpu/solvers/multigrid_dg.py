"""DG multigrid solvers.

* :class:`MultigridSolverDG` — SIP-DG system on the finest level with an
  auxiliary continuous FE_Q hierarchy below, the reference's
  ``MultigridSolverDG`` (/root/reference/common/multigrid_solver_dg.h:55-743):
  outer CG on the dp DG operator, preconditioned by one dg_v_cycle =
  DG Chebyshev(JacobiTransformed) pre-smooth -> residual restricted to the
  FE_Q space -> FE_Q V-cycle -> prolongate back -> DG post-smooth
  (multigrid_solver_dg.h:605-633).

* :class:`MultigridSolverDGPlain` — pure-DG h-multigrid, every level
  smoothed by Chebyshev + transformed Jacobi
  (/root/reference/common/multigrid_solver_dg_plain.h:54-591).

Smoother parameters follow the reference exactly: fine levels range 20 /
degree n_pre (finest: max(1, n_pre-1)), eig 15; coarse level auto-degree
with range 2e-3 (DG-over-CG) or 1e-5 (plain); DG level degree n_pre
(multigrid_solver_dg.h:266-304, multigrid_solver_dg_plain.h:186-213).
The outer CG uses ReductionControl(100, 1e-16, tolerance) and reports
fractional iterations log(tol)/log(rate)
(multigrid_solver_dg.h:410-424).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.brick import BrickMesh, DofGrid
from ..ops.dg import DGGrid, DGLaplace
from ..ops.dg_precond import JacobiTransformed
from ..ops.dg_transfer import CGDGCoupling, DGTransfer
from .cg import CGResult, cg_solve
from .chebyshev import FIRST_KIND, Chebyshev
from .multigrid import MultigridSolver


def _dg_grid_from_mesh(mesh: BrickMesh, level: int, degree: int, kind: str) -> DGGrid:
    J = np.diag(mesh.h(level))
    return DGGrid(
        cells=mesh.cells(level),
        jacobian=tuple(tuple(r) for r in J),
        degree=degree,
        kind=kind,
    )


def _quad_coords_block(grid: DGGrid, mesh: BrickMesh, level: int):
    """Coordinate arrays broadcastable to the DG block layout [C..., nq...]."""
    b = grid.basis
    dim = grid.dim
    out = []
    for d in range(dim):
        h = mesh.h(level)[d]
        line = mesh.origin[d] + h * np.arange(grid.cells[d])[:, None] + h * b.quad_points[None, :]
        shape = [1] * (2 * dim)
        shape[d] = grid.cells[d]
        shape[dim + d] = grid.n
        out.append(line.reshape(shape))
    return out


class _DGOuterCG:
    """Shared outer-CG machinery (multigrid_solver_dg.h:410-424)."""

    def reset_jit_caches(self):
        """Drop cached jitted callables (needed when the sharding hooks
        change after construction — see parallel/distributed.py)."""
        self._cg_jit = None

    def solve_cg(self, tolerance: float = 1e-3, max_iterations: int = 100):
        if self._cg_jit is None:
            self._cg_jit = jax.jit(
                partial(
                    cg_solve,
                    getattr(self, "op_dp_fast", self.op_dp).vmult,
                    precond=self._precond,
                    max_iterations=max_iterations,
                    abs_tol=1e-16,
                    rtol=tolerance,
                )
            )
        res: CGResult = self._cg_jit(self.rhs)
        its = int(res.iterations)
        rate = float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
        frac_its = np.log(tolerance) / np.log(rate) if rate < 1 else np.inf
        return res.x, frac_its, rate

    def l2_error(self, u, exact_quad):
        op = getattr(self, "op_ref", self.op_dp)
        return float(op.l2_error(u, exact_quad))


class MultigridSolverDG(_DGOuterCG):
    def __init__(
        self,
        mesh: BrickMesh,
        degree: int,
        exact_fn: Callable,
        rhs_fn: Callable,
        kind: str = "hermite",
        n_pre: int = 2,
        n_post: int = 2,
        v_dtype=jnp.float32,
        f_dtype=jnp.float64,
        sp_impl: str = "dense_chunked",
        dp_impl: str = "ozaki_chunked",
        dg_sp_impl: str = "auto",
    ):
        assert n_pre == n_post
        self.mesh = mesh
        # FE_Q hierarchy with the DG-solver smoother settings
        self.cg = MultigridSolver(
            mesh, degree, exact_fn, rhs_fn, n_pre=n_pre, n_post=n_post,
            n_cycles=1, v_dtype=v_dtype, f_dtype=f_dtype, sp_impl=sp_impl,
            coarse_smoothing_range=2e-3,
            finest_degree=max(1, n_pre - 1),
        )
        L = mesh.max_level
        self.dg_grid = _dg_grid_from_mesh(mesh, L, degree, kind)
        self.op = DGLaplace(self.dg_grid, v_dtype)
        self.op_ref = DGLaplace(self.dg_grid, f_dtype)   # rhs/error assembly
        # Fused Mosaic DG kernels (ops/pallas_dg) for the two hot matvec
        # streams of the solve: the outer-CG dp operator and the DG
        # smoother's sp operator.  MGT_DG_PALLAS gates the default
        # (CLAUDE.md: kernel defaults flip only on a passing hardware
        # gate); the dp pair kernel is bounded to p <= 4 (Ozaki
        # exact-accumulation), matching the XLA dp DG operator's bound.
        import os

        env = os.environ.get("MGT_DG_PALLAS", "")
        use_pallas = (env not in ("", "0") if env != ""
                      else jax.default_backend() not in ("cpu",)
                      and jax.device_count() == 1)   # GSPMD path stays XLA
        self._use_pallas = use_pallas and self.dg_grid.dim == 3
        if dp_impl == "df64":
            from ..ops.dg_df64 import DGLaplaceDF64

            self.op_dp = DGLaplaceDF64(self.dg_grid)
        elif dp_impl == "pallas" or (
                dp_impl in ("ozaki", "ozaki_chunked") and self._use_pallas
                and degree <= 4):
            from ..ops.pallas_dg import PallasDGOzaki

            self.op_dp = PallasDGOzaki(self.dg_grid)
        elif dp_impl in ("ozaki", "ozaki_chunked"):
            from ..ops.dg_ozaki import DGLaplaceOzaki

            self.op_dp = DGLaplaceOzaki(self.dg_grid)
        else:
            self.op_dp = self.op_ref
        self.jacobi = JacobiTransformed(self.op)
        if dg_sp_impl == "pallas" or (dg_sp_impl == "auto"
                                      and self._use_pallas):
            from ..ops.pallas_dg import PallasDGSP

            self._sp_op = PallasDGSP(self.dg_grid)
        else:
            self._sp_op = self.op
        self.coupling = CGDGCoupling(self.cg.grids[L], self.dg_grid, v_dtype)
        self.smooth_dg = Chebyshev.create(
            self._sp_op.vmult,
            None,
            smoothing_range=20.0,
            degree=n_pre,
            eig_cg_n_iterations=15,
            kind=FIRST_KIND,
            precond=self.jacobi.vmult,
            example=jnp.zeros(self.dg_grid.shape, v_dtype),
        )
        self._kdg = None
        if self._sp_op is not self.op:
            # Kernel-layout smoother twin: the whole dg_v_cycle runs on
            # persistent [cz+1, N, F] vectors — JacobiTransformed becomes
            # two dense [N, N] MXU matmuls, and the per-iteration
            # natural<->kernel conversions disappear (2 per cycle remain,
            # at the CG-coupling boundary).  The Chebyshev interval is
            # CLONED from the natural-layout estimate (the layout is a
            # dof permutation: identical spectrum — the FusedChebyshev
            # pattern, ops/pallas_windowed_sp.py).
            import dataclasses

            import numpy as _np

            spk = self._sp_op
            b = self.dg_grid.basis
            T3 = _np.kron(_np.kron(b.T, b.T), b.T)
            T3f = jnp.asarray(T3, v_dtype)
            T3tf = jnp.asarray(T3.T, v_dtype)
            # to_kernel zero-pads the halo layer + pad lanes: the Jacobi
            # multiply then PRESERVES the kernel vectors' zero invariant
            inv_diag_k = spk.to_kernel(self.jacobi.inv_diag)

            def jac_k(u, _T3=T3f, _T3t=T3tf, _d=inv_diag_k):
                hp = jax.lax.Precision.HIGHEST
                y = jnp.einsum("mn,znf->zmf", _T3t, u, precision=hp)
                y = y * _d
                return jnp.einsum("mn,znf->zmf", _T3, y, precision=hp)

            self._kdg = spk
            _fused = os.environ.get("MGT_DG_CHEB_FUSED", "1") not in ("",
                                                                      "0")
            if _fused:
                # action-3 analogue: residual + Jacobi + update fused into
                # the matvec kernel pass (ops/pallas_dg.FusedChebyshevDG)
                from ..ops.pallas_dg import FusedChebyshevDG

                spk.install_jacobi(T3, inv_diag_k)
                self.smooth_dg_k = FusedChebyshevDG(
                    spk, jac_k, theta=self.smooth_dg.theta,
                    delta=self.smooth_dg.delta,
                    degree=self.smooth_dg.degree)
            else:
                self.smooth_dg_k = dataclasses.replace(
                    self.smooth_dg, vmult_op=spk.vmult_persistent,
                    precond=jac_k)
        # rhs: DG mass integration of f only (multigrid_solver_dg.h:243-265;
        # NOTE the reference applies no weak boundary lift here)
        quads = _quad_coords_block(self.dg_grid, mesh, L)
        f_quad = jnp.asarray(np.asarray(rhs_fn(quads), np.float64), f_dtype)
        f_quad = jnp.broadcast_to(f_quad, self.dg_grid.shape)
        self.rhs = self.op_ref.compute_rhs(f_quad)
        self.exact_quad = jnp.asarray(
            np.broadcast_to(np.asarray(exact_fn(quads), np.float64), self.dg_grid.shape),
            f_dtype,
        )
        self.v_dtype, self.f_dtype = v_dtype, f_dtype
        self._cg_jit = None
        # DG-level sharding hook (identity on one device); the distributed
        # wrapper replaces it with ``lax.with_sharding_constraint``
        self._constrain_dg = lambda x: x

    def dg_v_cycle(self, defect: jnp.ndarray) -> jnp.ndarray:
        """multigrid_solver_dg.h:605-633."""
        defect = self._constrain_dg(defect)
        if self._kdg is not None:
            # kernel-layout cycle: DG vectors stay in the persistent
            # [cz+1, N, F] layout through both smoothers and the residual;
            # natural layout appears only at the CG-coupling boundary
            k = self._kdg
            dk = k.to_kernel(defect)
            upd = self.smooth_dg_k.vmult(dk)
            rk = dk - k.vmult_persistent(upd)
            r_cg = self.cg._constrain(
                self.cg.maxlevel,
                self.coupling.dg_to_cg(k.from_kernel(rk[:-1])))
            corr = self.cg.v_cycle(self.cg.maxlevel, r_cg, 1)
            upd = upd + k.to_kernel(self.coupling.cg_to_dg(corr))
            upd = self.smooth_dg_k.step(upd, dk)
            return k.from_kernel(upd[:-1])
        upd = self.smooth_dg.vmult(defect)
        r = self._sp_op.vmult_residual(defect, upd)
        r_cg = self.cg._constrain(self.cg.maxlevel, self.coupling.dg_to_cg(r))
        corr = self.cg.v_cycle(self.cg.maxlevel, r_cg, 1)
        upd = upd + self._constrain_dg(self.coupling.cg_to_dg(corr))
        return self.smooth_dg.step(upd, defect)

    def _precond(self, r: jnp.ndarray) -> jnp.ndarray:
        return self.dg_v_cycle(r.astype(self.v_dtype)).astype(self.f_dtype)


class MultigridSolverDGPlain(_DGOuterCG):
    def __init__(
        self,
        mesh: BrickMesh,
        degree: int,
        exact_fn: Callable,
        rhs_fn: Callable,
        kind: str = "gauss",
        n_pre: int = 3,
        n_post: int = 3,
        v_dtype=jnp.float32,
        f_dtype=jnp.float64,
        coeff_fn: Optional[Callable] = None,
        mapping: Optional[Callable] = None,
    ):
        """``coeff_fn``: optional smooth coefficient c(x) (callable on the
        broadcastable quad-coordinate arrays) for -div(c grad u); every
        level rebuilds its own operator by direct evaluation at that
        level's quadrature points (the h-MG analogue of the reference's
        per-level ``evaluate_coefficient``, multigrid_solver.h:177-186),
        and JacobiTransformed auto-routes to its exact per-cell path.

        ``mapping``: optional smooth chart [N, dim] block coords in
        [0,1]^dim -> physical, switching every level to the curved-geometry
        operator (ops/dg_curved.py, per-quad-point geometry; the mesh's own
        origin/lengths are superseded by the chart).  Composes with
        ``coeff_fn``."""
        assert n_pre == n_post
        self.mesh = mesh
        L = mesh.n_levels
        if mapping is not None:
            from ..ops.dg_curved import DGCurvedGrid

            self.grids = [
                DGCurvedGrid(mesh.cells(l), mapping, degree, kind, coeff_fn)
                for l in range(L)
            ]
        else:
            self.grids = [_dg_grid_from_mesh(mesh, l, degree, kind)
                          for l in range(L)]

        c_cache = {}

        def make_op(level, dtype):
            g = self.grids[level]
            if mapping is not None:
                from ..ops.dg_curved import DGLaplaceCurved

                return DGLaplaceCurved(g, dtype)
            if coeff_fn is None:
                return DGLaplace(g, dtype)
            from ..ops.dg import DGLaplaceVarCoeff

            if level not in c_cache:   # fp64 once per level; the finest
                #                        level feeds both v/f dtype ops
                quads = _quad_coords_block(g, mesh, level)
                c_cache[level] = np.broadcast_to(
                    np.asarray(coeff_fn(quads), np.float64), g.shape)
            return DGLaplaceVarCoeff(g, c_cache[level], dtype)

        self.ops = [make_op(l, v_dtype) for l in range(L)]
        self.op_dp = make_op(L - 1, f_dtype)
        # fused Mosaic kernels for the affine constant-coefficient 3-D
        # case (same gate as MultigridSolverDG: smoother matvecs + the
        # outer-CG dp matvec; JacobiTransformed, rhs assembly and error
        # evaluation stay on the XLA operators).  Curved / var-coeff
        # levels keep XLA throughout.
        import os

        env = os.environ.get("MGT_DG_PALLAS", "")
        use_pallas = (env not in ("", "0") if env != ""
                      else jax.default_backend() not in ("cpu",)
                      and jax.device_count() == 1)
        self._use_pallas = (use_pallas and mesh.dim == 3
                            and mapping is None and coeff_fn is None)
        self._sp_ops = list(self.ops)
        if self._use_pallas:
            from ..ops.pallas_dg import PallasDGOzaki, PallasDGSP

            self._sp_ops = [PallasDGSP(self.grids[l]) for l in range(L)]
            if degree <= 4:
                self.op_dp_fast = PallasDGOzaki(self.grids[L - 1])
        self.transfers = [None] + [
            DGTransfer(self.grids[l], self.grids[l - 1], v_dtype)
            for l in range(1, L)
        ]
        self.maxlevel = L - 1
        self.smoothers = []
        for l in range(L):
            jac = JacobiTransformed(self.ops[l])
            if l > 0:
                deg = n_pre if l < self.maxlevel else max(1, n_pre - 1)
                sm = Chebyshev.create(
                    self._sp_ops[l].vmult, None, smoothing_range=20.0,
                    degree=deg, eig_cg_n_iterations=15, kind=FIRST_KIND,
                    precond=jac.vmult,
                    example=jnp.zeros(self.grids[l].shape, v_dtype),
                )
            else:
                sm = Chebyshev.create(
                    self._sp_ops[l].vmult, None, smoothing_range=1e-5,
                    degree=None, eig_cg_n_iterations=self.grids[l].n_dofs,
                    kind=FIRST_KIND,
                    precond=jac.vmult,
                    example=jnp.zeros(self.grids[l].shape, v_dtype),
                )
            self.smoothers.append(sm)
        quads = (self.grids[-1].quad_phys if mapping is not None
                 else _quad_coords_block(self.grids[-1], mesh, L - 1))
        f_quad = jnp.asarray(np.asarray(rhs_fn(quads), np.float64), f_dtype)
        f_quad = jnp.broadcast_to(f_quad, self.grids[-1].shape)
        self.rhs = self.op_dp.compute_rhs(f_quad)
        self.exact_quad = jnp.asarray(
            np.broadcast_to(np.asarray(exact_fn(quads), np.float64), self.grids[-1].shape),
            f_dtype,
        )
        self.v_dtype, self.f_dtype = v_dtype, f_dtype
        self._cg_jit = None
        # per-level sharding hook (identity on one device); the distributed
        # wrapper replaces it with ``lax.with_sharding_constraint``
        self._constrain = lambda level, x: x

    def v_cycle(self, level: int, defect: jnp.ndarray) -> jnp.ndarray:
        """multigrid_solver_dg_plain.h:455-496."""
        defect = self._constrain(level, defect)
        if level == 0:
            return self.smoothers[0].vmult(defect)
        upd = self.smoothers[level].vmult(defect)
        t = self._sp_ops[level].vmult_residual(defect, upd)
        dc = self.transfers[level].restrict(t)
        corr = self.v_cycle(level - 1, dc)
        upd = upd + self._constrain(level, self.transfers[level].prolongate(corr))
        return self.smoothers[level].step(upd, defect)

    def _precond(self, r: jnp.ndarray) -> jnp.ndarray:
        return self.v_cycle(self.maxlevel, r.astype(self.v_dtype)).astype(self.f_dtype)
