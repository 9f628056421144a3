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
from ..ops.laplace_general_df64 import GeneralLaplaceDF64, split_pair
from ..ops.laplace_general_mxu import GeneralLaplaceMXU, GeneralLaplaceOzaki
from ..ops.transfer_general import GeneralTransfer, GeneralTransferDF64
from .cg import CGResult, cg_solve
from .chebyshev import FIRST_KIND, Chebyshev


class GeneralMultigridSolver:
    """Mixed-precision by default; ``pure_double=True`` selects the
    reference's second specialization — all-double V-cycle with (by
    convention there) fourth-kind Chebyshev smoothing on the fine levels
    (/root/reference/common/multigrid_solver.h:789-1285, esp. 945-963),
    which is what poisson_shell uses."""

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
        pure_double: bool = False,
        chebyshev_kind: str = FIRST_KIND,
        dp_df64: Optional[bool] = None,
        use_mxu: Optional[bool] = None,
        block_mode: Optional[bool] = None,
        bp_pad: Optional[int] = None,
    ):
        assert n_pre == n_post
        if pure_double:
            v_dtype = f_dtype
        # dp matvecs in compensated f32 pairs (ops/laplace_general_df64):
        # XLA's f64 emulation makes the native-f64 operator ~100x slower
        # than f32 on TPU (33 s best-of-3 CG at 1.6M shell dofs measured;
        # the 3.2M CG crashed the TPU worker).  Auto-on off-CPU.
        _dp_df64_auto = dp_df64 is None
        if dp_df64 is None:
            dp_df64 = jax.default_backend() != "cpu"
        self.dp_df64 = bool(dp_df64)
        # MXU-native operator forms (ops/laplace_general_mxu): the whole
        # gradient evaluation as shared-weight [cells,N]@[N,dim*nq]
        # matmuls — Ozaki bf16 limbs for dp, Precision.HIGHEST for f32.
        # The round-3 sweep-form df64 operator measured ~1 s per dp matvec
        # at 1.6M shell dofs (VPU-bound); the MXU form is the TPU-fast
        # path.  Auto-on off-CPU (on CPU the dense form is 25x the flops).
        import os

        if use_mxu is None:
            env = os.environ.get("MGT_GENERAL_MXU", "")
            if env != "":
                use_mxu = env not in ("0",)
            else:
                use_mxu = jax.default_backend() != "cpu"
        self.use_mxu = bool(use_mxu)
        # Block-padded layout (mesh/mapped.BlockLayout + ops/laplace_block):
        # the gather/segment-sum operators are SCATTER-BOUND on TPU
        # (hardware: 0.005 GDoF/s dp at 1.6M, docs/tpu_r4/general_gate.log)
        # — block mode stores per-block node lattices with duplicated
        # seams so cell localization is reshape-based window ops and only
        # an O(surface) seam sum remains.  All solver vectors are then
        # block-padded [M]; inner products use dedup weights.
        if block_mode is None:
            env = os.environ.get("MGT_GENERAL_BLOCK", "")
            if env != "":
                block_mode = env not in ("0",)
            else:
                block_mode = self.use_mxu and self.dp_df64
        self.block_mode = bool(block_mode)
        if self.block_mode and _dp_df64_auto:
            # an explicitly requested block mode implies the pair dp
            # operators (there is no native-f64 block twin) — e.g.
            # MGT_GENERAL_BLOCK=1 on CPU for verification runs
            self.dp_df64 = True
        if self.block_mode:
            assert self.dp_df64, "block mode rides the pair dp operators"
        # pure-double on TPU = the whole V-cycle rides the pair operators
        self._pure_pair = self.dp_df64 and pure_double
        self.mesh = mesh
        self.n_cycles = n_cycles
        self._n_pre = n_pre
        self._chebyshev_kind = chebyshev_kind
        self.v_dtype, self.f_dtype = v_dtype, f_dtype
        self.minlevel = 0
        self.maxlevel = mesh.max_level
        L = mesh.n_levels

        self.grids = [GeneralGrid(mesh, l, degree) for l in range(L)]
        self.ops = []
        self.ops_dp = []
        self.ops_dfp = []
        if self.block_mode:
            from ..ops.laplace_block import (BlockGeneralMXU,
                                             BlockGeneralOzaki)

            _pair_cls = BlockGeneralOzaki
            _sp_cls = BlockGeneralMXU
            # bp_pad (or MGT_GENERAL_PAD): round every level's bp vector
            # length to a multiple so it shards evenly over a device mesh
            if bp_pad is None:
                bp_pad = int(os.environ.get("MGT_GENERAL_PAD", "1") or "1")
            for g in self.grids:
                g._bp_pad = int(bp_pad)
            self.layouts = [g.block_layout() for g in self.grids]
        else:
            _pair_cls = (GeneralLaplaceOzaki if self.use_mxu
                         else GeneralLaplaceDF64)
            _sp_cls = GeneralLaplaceMXU if self.use_mxu else GeneralLaplace
            self.layouts = None
        # on the MXU pair path, rhs assembly and l2_error ride the pair
        # operators, so the native-f64 twin (emulated-f64 einsums + a
        # second full-size f64 coefficient transfer per level) is never
        # needed — built lazily only if something still asks for it
        # (minimal_surface's field evaluations do)
        self._mxu_setup = (self.use_mxu or self.block_mode) and self.dp_df64
        _dp_builders = []
        for g in self.grids:
            coef = g.merged_coefficient(coef_fn)
            hi = None
            if self.dp_df64:
                shape = (g.n_cells,) + (g.n,) * g.dim + (coef.shape[-1],)
                coef_r = np.asarray(coef, np.float64).reshape(shape)
                hi_np = coef_r.astype(np.float32)
                lo_np = (coef_r - hi_np.astype(np.float64)).astype(np.float32)
                hi = jnp.asarray(hi_np)
                dfp = _pair_cls(g, coef=(hi, jnp.asarray(lo_np)))
            else:
                dfp = None
            self.ops_dfp.append(dfp)
            if self._pure_pair:
                self.ops.append(dfp)
            elif hi is not None and v_dtype == jnp.float32:
                # the sp coefficient IS the pair's hi plane: share the
                # device array instead of shipping a second ~600 MB copy
                self.ops.append(_sp_cls(g, v_dtype, coef=hi))
            else:
                self.ops.append(_sp_cls(g, v_dtype, coef=coef))
            if self._mxu_setup:
                _dp_builders.append((g, coef_fn))
            else:
                self.ops_dp.append(GeneralLaplace(g, f_dtype, coef=coef))
        if self._mxu_setup:
            class _LazyDP:
                def __init__(_s, builders, dtype):
                    _s._b = builders
                    _s._v = [None] * len(builders)
                    _s._dtype = dtype

                def __len__(_s):
                    return len(_s._b)

                def __getitem__(_s, i):
                    if _s._v[i] is None:
                        g_, cf = _s._b[i]
                        _s._v[i] = GeneralLaplace(g_, _s._dtype, coef_fn=cf)
                    return _s._v[i]

            self.ops_dp = _LazyDP(_dp_builders, f_dtype)
        if self.block_mode:
            from ..ops.transfer_block import BlockTransfer, BlockTransferPair

            self.transfers = [None] + [
                (BlockTransferPair(self.grids[l], self.grids[l - 1], True)
                 if self._pure_pair
                 else BlockTransfer(self.grids[l], self.grids[l - 1],
                                    v_dtype, True))
                for l in range(1, L)
            ]
            self.transfers_nobc = [None] + [
                BlockTransferPair(self.grids[l], self.grids[l - 1], False)
                for l in range(1, L)
            ]
        elif self._pure_pair:
            self.transfers = [None] + [
                GeneralTransferDF64(self.grids[l], self.grids[l - 1], True)
                for l in range(1, L)
            ]
        else:
            self.transfers = [None] + [
                GeneralTransfer(self.grids[l], self.grids[l - 1], v_dtype, True)
                for l in range(1, L)
            ]
        if self.block_mode:
            pass
        elif self.dp_df64:
            # the dp FMG solution prolongation must not ride emulated f64
            self.transfers_nobc = [None] + [
                GeneralTransferDF64(self.grids[l], self.grids[l - 1], False)
                for l in range(1, L)
            ]
        else:
            self.transfers_nobc = [None] + [
                GeneralTransfer(self.grids[l], self.grids[l - 1], f_dtype, False)
                for l in range(1, L)
            ]

        if self.block_mode:
            self.bmask = [jnp.asarray(~lay.interior) for lay in self.layouts]
        else:
            self.bmask = [jnp.asarray(g.boundary) for g in self.grids]
        self.u_bc, self.rhs, self.exact_quad = [], [], []
        for l, g in enumerate(self.grids):
            coords = [g.node_coords[:, d] for d in range(g.dim)]
            vals = np.asarray(exact_fn(coords), np.float64)
            # ship u_bc SPARSE (boundary = O(surface) nodes) and densify
            # on device: the dense f64 vector is ~100 MB/level at the 13M
            # shell size over a ~15 MB/s tunnel
            if self.block_mode:
                lay = self.layouts[l]
                # only REAL boundary positions carry values — the shard
                # pad tail is interior=False but has no dof behind it
                bidx = np.nonzero(~lay.interior[:lay.M])[0]
                ubc = jnp.zeros(lay.M_pad, f_dtype).at[jnp.asarray(bidx)].set(
                    jnp.asarray(vals[lay.inverse[bidx]], f_dtype))
            else:
                bidx = np.nonzero(g.boundary)[0]
                ubc = jnp.zeros(g.n_dofs, f_dtype).at[
                    jnp.asarray(bidx)].set(jnp.asarray(vals[bidx], f_dtype))
            self.u_bc.append(ubc)
            qc = [g.quad_coords[..., d] for d in range(g.dim)]
            fq = np.broadcast_to(np.asarray(rhs_fn(qc), np.float64),
                                 g.jxw.shape)
            shape = (g.n_cells,) + (g.n,) * g.dim
            # EAGER on purpose: jitting this setup-only assembly embeds the
            # per-quad-point merged coefficient (C, ~300 MB at 3M dofs) and
            # jxw into the compile payload — the remote compile server
            # rejects it (HTTP 413, measured on the shell ladder cycle 9).
            # Eager ops ship device-array operands, not constants.
            if self._mxu_setup:
                # pair-path assembly: host f*JxW, Ozaki mass matmul,
                # pair A·u_bc — no emulated-f64 einsums anywhere
                self.rhs.append(self.ops_dfp[l].compute_rhs_pair(
                    (fq * g.jxw).reshape(shape), ubc))
            else:
                self.rhs.append(self.ops_dp[l].compute_rhs(
                    jnp.asarray(fq.reshape(shape), f_dtype), ubc))
            eq = np.broadcast_to(np.asarray(exact_fn(qc), np.float64), g.jxw.shape)
            self.exact_quad.append(jnp.asarray(eq.reshape(shape), f_dtype))

        # Every setup-time jit below passes C and inv_diag as ARGUMENTS —
        # as closure constants the per-quad-point coefficients are ~300 MB
        # of compile payload at 3M dofs and the remote compile server
        # rejects the program (HTTP 413, measured on the shell ladder).
        self._cg_param_jits = {}
        self._eig_jits = {}
        self._inv_diag_jits = {}
        from .chebyshev import (eig_estimate_start_vector,
                                interval_from_spectrum, tridiag_extremes)

        self.smoothers = []
        self._inv_diag = []
        for l in range(L):
            inv_diag = self._inv_diag_jit(l)(self.ops[l].C)
            self._inv_diag.append(inv_diag)
            rhs0 = eig_estimate_start_vector((self.grids[l].n_dofs,), v_dtype)
            if self.block_mode:
                # same start pattern seen through the bp copies, so the
                # Lanczos estimate matches the flat path's
                rhs0 = self.layouts[l].expand(rhs0)
            a_, b_, o_ = self._eig_jit(l)(rhs0, self.ops[l].C, inv_diag)
            max_eig, min_eig = tridiag_extremes(a_, b_, o_)
            if l > self.minlevel:
                kind = chebyshev_kind
                theta, delta, n_apps = interval_from_spectrum(
                    max_eig, min_eig, 20.0, n_pre, kind)
            else:
                kind = FIRST_KIND
                theta, delta, n_apps = interval_from_spectrum(
                    max_eig, min_eig, 1e-3, None, kind)
            self.smoothers.append(Chebyshev(
                vmult_op=self.ops[l].vmult,
                precond=lambda r, _d=inv_diag: _d * r,
                theta=theta, delta=delta, degree=n_apps,
                max_eig=max_eig, min_eig=min_eig, kind=kind))
        self._fmg_jit = None
        # Pytree-parameterized solve path (one compile across Newton steps).
        # ALWAYS populated: the per-level merged coefficients are ~11x n_dofs
        # each (125 quad points x 6 symmetric components per cell) and, as
        # jit closure constants, get embedded into the HLO — 145 MB of
        # StableHLO at 0.4M dofs, shipped to the (possibly remote) compiler
        # on every solve program.  As pytree ARGUMENTS they cost nothing.
        self._params = dict(
            C_sp=[op.C for op in self.ops],
            C_dp=[self._dp_op(l).C for l in range(L)],
            inv_diag=list(self._inv_diag),
            theta=[sm.theta for sm in self.smoothers],
            delta=[sm.delta for sm in self.smoothers],
            coarse_degree=jnp.asarray(self.smoothers[0].degree, jnp.int32),
        )

    # ---------------------------------------------------------------- core
    def _dp_op(self, level: int):
        """dp operator for FMG residuals and the outer CG matvec: the
        pair-arithmetic twin on TPU, native f64 elsewhere."""
        return self.ops_dfp[level] if self.dp_df64 else self.ops_dp[level]

    def _smoother_at(self, level: int, params=None):
        """Level smoother; with ``params`` the coefficient, diagonal and
        Chebyshev interval are read from the pytree (traced values)."""
        if params is None:
            return self.smoothers[level]
        import dataclasses

        op = self.ops[level]
        C = params["C_sp"][level]
        inv_diag = params["inv_diag"][level]
        sm = self.smoothers[level]
        degree = sm.degree if level > self.minlevel else params["coarse_degree"]
        return dataclasses.replace(
            sm,
            vmult_op=lambda x: op.vmult(x, C=C),
            precond=lambda r: inv_diag * r,
            theta=params["theta"][level],
            delta=params["delta"][level],
            degree=degree,
        )

    def v_cycle(self, level: int, defect: jnp.ndarray, n_cyc: int,
                params=None) -> jnp.ndarray:
        sm = self._smoother_at(level, params)
        if level == self.minlevel:
            return sm.vmult(defect)
        C = None if params is None else params["C_sp"][level]
        upd = None
        for _ in range(n_cyc):
            if upd is None:
                upd = sm.vmult(defect)
            else:
                upd = sm.step(upd, defect)
            t = self.ops[level].vmult_residual(defect, upd, C=C)
            dc = self.transfers[level].restrict(t)
            corr = self.v_cycle(level - 1, dc, 1, params)
            upd = upd + self.transfers[level].prolongate(corr)
            upd = sm.step(upd, defect)
        return upd

    def _fmg(self, rhs, u_bc, params):
        sm0 = self._smoother_at(0, params)
        d0 = rhs[0].astype(self.v_dtype)
        t = sm0.vmult(d0)
        t = sm0.step(t, d0)
        sol = t.astype(self.f_dtype)
        for l in range(1, self.maxlevel + 1):
            sol_bc = jnp.where(self.bmask[l - 1], u_bc[l - 1], sol)
            sol = self.transfers_nobc[l].prolongate(sol_bc)
            sol = jnp.where(self.bmask[l], 0.0, sol)
            res = self._dp_op(l).vmult_residual(
                rhs[l], sol,
                C=None if params is None else params["C_dp"][l])
            upd = self.v_cycle(l, res.astype(self.v_dtype), self.n_cycles,
                               params)
            sol = sol + upd.astype(self.f_dtype)
        return sol

    def solve(self) -> jnp.ndarray:
        if self._fmg_jit is None:
            self._fmg_jit = jax.jit(self._fmg)
        sol = self._fmg_jit(self.rhs, self.u_bc, self._params)
        sol = jnp.where(self.bmask[self.maxlevel], self.u_bc[self.maxlevel], sol)
        # API boundary: block mode is an internal layout — callers always
        # receive the flat [n_dofs] dof vector (advisor r4 medium finding)
        if self.block_mode:
            sol = self.layouts[self.maxlevel].collapse(sol)
        return sol

    def _precond(self, r, params=None):
        return self.v_cycle(
            self.maxlevel, r.astype(self.v_dtype), 1, params
        ).astype(self.f_dtype)

    def solve_cg(self, rtol=1e-9, abs_tol=1e-16, max_iterations=1000, b=None):
        L = self.maxlevel
        # Layout contract (advisor r4): the bp layout stays internal.  A
        # caller-supplied ``b`` is answered in ITS layout (the nonlinear
        # Newton loop streams bp residuals and expects bp updates); the
        # default path expands rhs internally and collapses the solution
        # back to the flat [n_dofs] dof vector.
        bp_io = self.block_mode and (
            b is not None and b.shape[0] == self.layouts[L].M_pad)
        if b is None:
            b = self.rhs[L]
        elif self.block_mode and not bp_io:
            b = self.layouts[L].expand(jnp.asarray(b))
        # keyed on the stopping criteria: a later call with different
        # tolerances must not silently reuse the first compile
        key = (rtol, abs_tol, max_iterations)
        if key not in self._cg_param_jits:
            weight = (jnp.asarray(self.layouts[L].weights)
                      if self.block_mode else None)
            self._cg_param_jits[key] = jax.jit(
                lambda bb, params: cg_solve(
                    lambda x: self._dp_op(L).vmult(x, C=params["C_dp"][L]),
                    bb,
                    precond=lambda r: self._precond(r, params),
                    max_iterations=max_iterations,
                    abs_tol=abs_tol, rtol=rtol,
                    weight=weight,
                )
            )
        res: CGResult = self._cg_param_jits[key](b, self._params)
        its = int(res.iterations)
        red = float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
        sol = jnp.where(self.bmask[L], self.u_bc[L], res.x)
        if self.block_mode and not bp_io:
            sol = self.layouts[L].collapse(sol)
        return sol, its, red

    # --------------------------------------------------- nonlinear support
    def _eig_jit(self, level: int):
        """Per-level jitted Lanczos sweep with (rhs, C, inv_diag) as
        ARGUMENTS — compiled once, reused every Newton step."""
        if level not in self._eig_jits:
            from .chebyshev import lanczos_body

            op = self.ops[level]
            n_it = 15 if level > self.minlevel else self.grids[level].n_dofs
            dot = self._bp_dot(level)

            def f(rhs, C, inv_diag):
                return lanczos_body(
                    lambda x: op.vmult(x, C=C), lambda r: inv_diag * r,
                    n_it, rhs, dot=dot,
                )

            self._eig_jits[level] = jax.jit(f)
        return self._eig_jits[level]

    def _bp_dot(self, level: int):
        """Dedup-weighted inner product for block-padded vectors (None on
        the flat layout): keeps Lanczos/CG arithmetic identical to the
        true dof space despite seam copies."""
        if not self.block_mode:
            return None
        w = jnp.asarray(self.layouts[level].weights)

        def dot(a, b):
            from .cg import _dot as _cgdot

            return _cgdot(a * w.astype(a.dtype), b)

        return dot

    def _inv_diag_jit(self, level: int):
        if level not in self._inv_diag_jits:
            self._inv_diag_jits[level] = jax.jit(self.ops[level].inverse_diagonal)
        return self._inv_diag_jits[level]

    def update_coefficients(self, coefs):
        """Replace per-level merged coefficients (device arrays shaped like
        op.C) — the per-Newton-iteration refresh of minimal_surface
        (/root/reference/minimal_surface/program.cc:458-489).

        TPU-native design: coefficients, diagonals and Chebyshev intervals
        become a PYTREE passed as a jit argument, so the CG/V-cycle program
        compiles ONCE and Newton iterations only swap device arrays.  Only
        the tiny Lanczos tridiagonal eigensolve runs on the host."""
        from .chebyshev import eig_estimate_start_vector, interval_from_spectrum, tridiag_extremes

        L = len(self.grids)
        if self.dp_df64:
            C_dp = [split_pair(jnp.asarray(C, jnp.float64)) for C in coefs]
        else:
            C_dp = [jnp.asarray(C, self.f_dtype) for C in coefs]
        if self._pure_pair:
            C_sp = C_dp
        else:
            C_sp = [jnp.asarray(C, self.v_dtype) for C in coefs]
        inv_diag = [self._inv_diag_jit(l)(C_sp[l]) for l in range(L)]
        theta, delta = [], []
        coarse_degree = None
        for l in range(L):
            rhs0 = eig_estimate_start_vector(
                (self.grids[l].n_dofs,), self.v_dtype
            )
            if self.block_mode:
                rhs0 = self.layouts[l].expand(rhs0)
            a, b_, o = self._eig_jit(l)(rhs0, C_sp[l], inv_diag[l])
            max_eig, min_eig = tridiag_extremes(a, b_, o)
            if l > self.minlevel:
                th, de, _ = interval_from_spectrum(
                    max_eig, min_eig, 20.0, self._n_pre,
                    self._chebyshev_kind,
                )
            else:
                th, de, n_apps = interval_from_spectrum(
                    max_eig, min_eig, 1e-3, None, FIRST_KIND
                )
                coarse_degree = n_apps
            theta.append(th)
            delta.append(de)
        self._params = dict(
            C_sp=C_sp, C_dp=C_dp, inv_diag=inv_diag,
            theta=theta, delta=delta,
            coarse_degree=jnp.asarray(coarse_degree, jnp.int32),
        )
        # keep the object-level coefficients in sync for the non-param
        # entry points (rhs assembly, l2_error, direct vmult use)
        for l in range(L):
            self.ops[l].C = C_sp[l]
            if not self._mxu_setup:
                # the lazy native-f64 twins are setup-only; touching them
                # here would build them (f64 transfer + emulated einsums)
                self.ops_dp[l].C = jnp.asarray(coefs[l], self.f_dtype)
            if self.dp_df64:
                self.ops_dfp[l].C = C_dp[l]
        # rebuild the static smoothers so the non-param paths (solve()/
        # _fmg(), v_cycle(params=None)) smooth the NEW operator with the
        # NEW diagonal/interval, not the stale __init__ values
        import dataclasses

        new_smoothers = []
        for l in range(L):
            sm = self.smoothers[l]
            deg = sm.degree if l > self.minlevel else int(coarse_degree)
            new_smoothers.append(dataclasses.replace(
                sm,
                vmult_op=partial(self.ops[l].vmult, C=C_sp[l]),
                precond=lambda r, _d=inv_diag[l]: _d * r,
                theta=theta[l], delta=delta[l], degree=deg,
            ))
        self.smoothers = new_smoothers
        # _fmg_jit/_cg_param_jits stay valid: coefficients, diagonals and
        # intervals are pytree ARGUMENTS of those programs, not constants

    def l2_error(self, level: int, sol: jnp.ndarray) -> float:
        if self.block_mode and sol.shape[0] == self.grids[level].n_dofs:
            sol = self.layouts[level].expand(sol)
        u = jnp.where(self.bmask[level], self.u_bc[level], sol)
        if self._mxu_setup:
            jxw32 = (None if self._pure_pair
                     else getattr(self.ops[level], "jxw", None))
            return float(self.ops_dfp[level].l2_error(
                u, self.exact_quad[level], jxw32))
        return float(self.ops_dp[level].l2_error(u, self.exact_quad[level]))

    def v_cycle_timed(self, level: int, defect: jnp.ndarray, n_cyc: int,
                      timings) -> jnp.ndarray:
        """Instrumented V-cycle on the general (mapped-mesh) hierarchy,
        filling a utils.timing.LevelTimings table — the reference prints
        this after every solve (common/multigrid_solver.h:347-371)."""
        if not hasattr(self, "_timed_jits"):
            self._timed_jits = {}

        def _jit_of(key, fn):
            if key not in self._timed_jits:
                self._timed_jits[key] = jax.jit(fn)
            return self._timed_jits[key]

        # coefficients/diagonals/intervals ride the params pytree as jit
        # ARGUMENTS here too (closure constants = the HTTP 413 payload)
        P = self._params
        if level == self.minlevel:
            return timings.coarse(
                _jit_of((level, "coarse"),
                        lambda d, prm, _l=level: self._smoother_at(
                            _l, prm).vmult(d)), defect, P)
        upd = None
        smv = _jit_of((level, "smv"),
                      lambda d, prm, _l=level: self._smoother_at(
                          _l, prm).vmult(d))
        sstep = _jit_of((level, "sstep"),
                        lambda u, d, prm, _l=level: self._smoother_at(
                            _l, prm).step(u, d))
        for _ in range(n_cyc):
            if upd is None:
                upd = timings.timed(level, "smoother", smv, defect, P)
            else:
                upd = timings.timed(level, "smoother", sstep, upd, defect, P)
            t = timings.timed(
                level, "mg_mv",
                _jit_of((level, "resid"),
                        lambda d, u, prm, _l=level: self.ops[_l].vmult_residual(
                            d, u, C=prm["C_sp"][_l])),
                defect, upd, P)
            dc = timings.timed(
                level, "restrict",
                _jit_of((level, "restrict"), self.transfers[level].restrict),
                t)
            corr = self.v_cycle_timed(level - 1, dc, 1, timings)
            pro = timings.timed(
                level, "prolongate",
                _jit_of((level, "prolong"), self.transfers[level].prolongate),
                corr)
            upd = upd + pro
            upd = timings.timed(level, "smoother", sstep, upd, defect, P)
        return upd
