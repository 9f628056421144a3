"""Mixed-precision geometric multigrid solver (FMG + CG-with-V-cycle).

TPU-native rebuild of the reference ``MultigridSolver``
(/root/reference/common/multigrid_solver.h:96-782): a float32 V-cycle inside
a float64 outer iteration, Chebyshev smoothing (degree = n_pre on fine
levels, auto-degree Chebyshev-as-coarse-solver on the coarsest level), 2:1
tensorized transfers, inhomogeneous Dirichlet data handled by residual
lifting.  Precision casts happen at exactly the reference's two points:
dp residual -> sp defect (multigrid_solver.h:437) and sp correction -> dp
solution add (multigrid_solver.h:456).

All solve paths are jittable; level recursion unrolls at trace time (static
level count), which XLA compiles into one fused program per config — the TPU
analogue of the reference's templated kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.brick import BrickMesh, DofGrid
from ..ops.laplace import DiagCoef, LaplaceOperator, make_diag_coef
from ..ops.transfer import Transfer
from .cg import CGResult, cg_solve
from ..ops.df64 import norm_f64
from .chebyshev import FIRST_KIND, Chebyshev


def _eval_on(coords, fn):
    """Evaluate ``fn(list_of_coordinate_arrays)`` (numpy, fp64)."""
    return fn(coords)


def _cy_chunk() -> int:
    """y-chunk rows per fused-kernel grid step (MGT_CY_CHUNK, default 16:
    kernel_profile18 measured cy_chunk=16 ~10-23%% faster on both fused
    kernels; full-shape hardware gates bit-exact and the flagship solve
    A/B won — FMG 0.6440 s / dp matvec 3.63 GDoF/s vs 0.6542 / 3.24 at
    32 (docs/tpu_r4/{dpwin,spwin}_cy16.log, bench_cy16.log,
    2026-08-20)."""
    import os

    return int(os.environ.get("MGT_CY_CHUNK", "16") or "16")


def _win_cx_ok(cx: int) -> bool:
    """Eligibility of the fused windowed Mosaic kernels for a level with
    ``cx`` cells along x.  Exact multiples of the 128 lane tile always
    qualify; other widths run on a zero-padded window geometry
    (ops/pallas_windowed_sp.PallasWindowedSP pad docs) when the padding
    waste stays under 2.0x — even at 2x pad the fused kernels net out
    over the XLA fallbacks (hardware A/B 2026-08-19: flagship FMG
    0.781 s with the 64-cell L6 admitted vs 0.795 s without, same L2,
    docs/tpu_r3/bench_pad2.log; cx >= 64 for one tile).
    ``MGT_WIN_PAD=0`` restricts engagement to exact multiples; any other
    numeric value overrides the max pad ratio."""
    import os

    if cx % 128 == 0:
        return True
    env = os.environ.get("MGT_WIN_PAD", "1")
    if env in ("", "0"):
        return False
    max_ratio = 2.0 if env == "1" else float(env)
    cxp = -(-cx // 128) * 128
    return cxp / cx <= max_ratio


def _bc_faces_host(g: DofGrid, exact_fn) -> list[np.ndarray]:
    """Analytic boundary values as 2*dim face slabs (axis d kept with
    extent 1), ordered [(d, side) for d for side in (0, 1)] — the compact
    wire format of the inhomogeneous Dirichlet data
    (cf. /root/reference/common/multigrid_solver.h:224-253, which also
    interpolates only face support points)."""
    nodes = g.node_coords()
    faces = []
    for d in range(g.dim):
        for side in (0, 1):
            idx = 0 if side == 0 else g.shape[d] - 1
            sub = [np.take(a, [idx], axis=d) if e == d else a
                   for e, a in enumerate(nodes)]
            shp = list(g.shape)
            shp[d] = 1
            vals = np.broadcast_to(
                np.asarray(exact_fn(sub), np.float64), shp)
            faces.append(np.ascontiguousarray(vals))
    return faces


def _dense_bc_host(g: DofGrid, faces: list[np.ndarray]) -> np.ndarray:
    """Dense host u_bc node grid from face slabs (host-only scratch for
    the numpy rhs assembly; never shipped to the device)."""
    out = np.zeros(g.shape, np.float64)
    i = 0
    for d in range(g.dim):
        for side in (0, 1):
            idx = [slice(None)] * g.dim
            idx[d] = slice(0, 1) if side == 0 else slice(
                g.shape[d] - 1, g.shape[d])
            out[tuple(idx)] = faces[i]
            i += 1
    return out


class MultigridSolver:
    """FE_Q(p) Poisson multigrid on a structured brick.

    Parameters mirror the reference ctor
    (/root/reference/common/multigrid_solver.h:100-106): analytic solution
    (Dirichlet data), right-hand side, scalar coefficient (constant for the
    brick fast path), pre/post smoothing degree, number of V-cycles in FMG.
    """

    def __init__(
        self,
        mesh: BrickMesh,
        degree: int,
        exact_fn: Callable,
        rhs_fn: Callable,
        coefficient: float = 1.0,
        n_pre: int = 2,
        n_post: int = 2,
        n_cycles: int = 1,
        v_dtype=jnp.float32,
        f_dtype=jnp.float64,
        sp_impl: str = "dense_chunked",
        dp_impl: str = "ozaki_chunked",
        coarse_smoothing_range: float = 1e-3,
        finest_degree: Optional[int] = None,
        chebyshev_kind: str = FIRST_KIND,
    ):
        assert n_pre == n_post, "reference requires equal pre/post degree"
        import os as _os
        import time as _time
        _timing = bool(_os.environ.get("MGT_SETUP_TIMING"))
        _t0 = _time.perf_counter()

        def _tick(label):
            nonlocal _t0
            if _timing:
                t = _time.perf_counter()
                print(f"# setup {label}: {t - _t0:.2f} s", flush=True)
                _t0 = t

        self.mesh = mesh
        self.degree = degree
        self.n_cycles = n_cycles
        self.v_dtype = v_dtype
        self.f_dtype = f_dtype
        self.minlevel = 0
        self.maxlevel = mesh.max_level
        L = mesh.n_levels

        self.grids = [DofGrid(mesh, l, degree) for l in range(L)]
        self.ops = [
            LaplaceOperator(g, v_dtype, make_diag_coef(g, coefficient))
            for g in self.grids
        ]
        self.ops_dp = [
            LaplaceOperator(g, f_dtype, make_diag_coef(g, coefficient))
            for g in self.grids
        ]
        # hot-path operator implementations; the sum-factorized einsum ops
        # above stay for setup tasks (rhs assembly, diagonals, L2 errors).
        # The "*_chunked" variants lax.map over z-cell layers (on-chip
        # working sets, required at the 135M-dof flagship); below the
        # threshold the monolithic single-matmul form is cheaper.
        chunk_threshold = 1_000_000
        if sp_impl in ("dense", "dense_chunked", "pallas_windowed"):
            from ..ops.laplace_dense import DenseLaplaceF32, DenseLaplaceF32Chunked

            def _sp(g):
                if (sp_impl in ("dense_chunked", "pallas_windowed")
                        and g.dim == 3 and g.n_dofs > chunk_threshold):
                    return DenseLaplaceF32Chunked(g, make_diag_coef(g, coefficient))
                return DenseLaplaceF32(g, make_diag_coef(g, coefficient))

            self.sp_ops = [_sp(g) for g in self.grids]
        else:
            self.sp_ops = self.ops
        if dp_impl == "pallas_fused":
            # fully-fused Mosaic kernel (ops/pallas_fused.py) where its
            # constraints hold (p=4, 3-D, cx % 128 == 0, large grid);
            # XLA Ozaki chunked otherwise
            from ..ops.laplace_dense import DenseLaplaceOzaki, DenseLaplaceOzakiChunked
            from ..ops.pallas_fused import PallasFusedOzaki

            def _dp(g):
                if (g.dim == 3 and g.degree == 4 and g.cells[2] % 128 == 0
                        and g.n_dofs > chunk_threshold):
                    return PallasFusedOzaki(g, make_diag_coef(g, coefficient))
                if g.dim == 3 and g.n_dofs > chunk_threshold:
                    return DenseLaplaceOzakiChunked(
                        g, make_diag_coef(g, coefficient))
                return DenseLaplaceOzaki(g, make_diag_coef(g, coefficient))

            self.dp_ops = [_dp(g) for g in self.grids]
        elif dp_impl == "pallas_windowed":
            # windowed-pair fused Mosaic kernel for the dp CG hot loop
            # (ops/pallas_windowed; 2.09 GDoF/s at 135M vs 1.09 XLA), with
            # the XLA chunked Ozaki operator behind every node-grid entry
            # point.  Interpret mode keeps the path testable off-TPU.
            from ..ops.laplace_dense import DenseLaplaceOzaki, DenseLaplaceOzakiChunked
            from ..ops.pallas_windowed import WindowedHybridOzaki

            interpret = jax.default_backend() != "tpu"

            def _dp(g):
                if (g.dim == 3 and g.degree == 4
                        and (interpret or (_win_cx_ok(g.cells[2])
                                           and g.n_dofs > chunk_threshold))):
                    return WindowedHybridOzaki(
                        g, make_diag_coef(g, coefficient),
                        interpret=interpret, cy_chunk=_cy_chunk())
                if g.dim == 3 and g.n_dofs > chunk_threshold:
                    return DenseLaplaceOzakiChunked(
                        g, make_diag_coef(g, coefficient))
                return DenseLaplaceOzaki(g, make_diag_coef(g, coefficient))

            self.dp_ops = [_dp(g) for g in self.grids]
        elif dp_impl in ("ozaki", "ozaki_chunked"):
            from ..ops.laplace_dense import DenseLaplaceOzaki, DenseLaplaceOzakiChunked

            def _dp(g):
                try:
                    if (dp_impl == "ozaki_chunked" and g.dim == 3
                            and g.n_dofs > chunk_threshold):
                        return DenseLaplaceOzakiChunked(
                            g, make_diag_coef(g, coefficient))
                    return DenseLaplaceOzaki(g, make_diag_coef(g, coefficient))
                except ValueError:
                    # Ozaki exact-accumulation bound fails for (p+1)^dim
                    # beyond ~146 (degree >= 5 in 3-D): fall back to the
                    # compensated df64 operator, which has no such bound
                    from ..ops.laplace_df64 import LaplaceOperatorDF64

                    return LaplaceOperatorDF64(g, make_diag_coef(g, coefficient))

            self.dp_ops = [_dp(g) for g in self.grids]
        elif dp_impl == "df64":
            from ..ops.laplace_df64 import LaplaceOperatorDF64

            self.dp_ops = [
                LaplaceOperatorDF64(g, make_diag_coef(g, coefficient))
                for g in self.grids
            ]
        else:
            self.dp_ops = self.ops_dp
        _tick("operators")
        # constrained transfer (V-cycle, sp) and unconstrained (solution, dp)
        # The per-axis banded-MXU-matmul flavor (ops/transfer.MatmulTransfer)
        # is the TPU default: hardware A/B 2026-08-18 measured flagship FMG
        # 0.919 s vs 1.050 s with the gather/sweep/scatter transfers (whose
        # cross-lane window relayouts are glue, not FLOPs, on the MXU), same
        # L2 error.  On CPU the ~50x FLOP inflation of the dense band is a
        # loss — keep the windowed flavor there.  MGT_MATMUL_TRANSFER=0/1
        # overrides either way.
        _mmt = _os.environ.get("MGT_MATMUL_TRANSFER")
        use_mmt = (jax.default_backend() == "tpu" if _mmt is None
                   else _mmt not in ("", "0"))
        _TransferCls = Transfer
        if use_mmt and v_dtype == jnp.float32:
            from ..ops.transfer import MatmulTransfer as _TransferCls
        self.transfers = [None] + [
            _TransferCls(self.grids[l], self.grids[l - 1], v_dtype,
                         constrained=True)
            for l in range(1, L)
        ]
        # dp flavor of the banded-matmul transfer (Ozaki bf16-limb MXU
        # matmuls, ops/transfer.OzakiMatmulTransfer) for the FMG solution
        # prolongations — TPU default: hardware A/B 2026-08-19 measured
        # flagship FMG 0.814 s vs 0.878 s on the windowed dp transfers,
        # same L2 error (docs/tpu_r3/bench_dpmm.log); CPU-verified to
        # 1e-14 against the df64 window path.  MGT_DP_MM_TRANSFER=0/1
        # overrides either way (CPU keeps the windowed flavor: the dense
        # band's FLOP inflation is a loss off the MXU).
        _dpmm = _os.environ.get("MGT_DP_MM_TRANSFER")
        use_dpmm = (jax.default_backend() == "tpu" if _dpmm is None
                    else _dpmm not in ("", "0"))
        _DpTransferCls = Transfer
        if f_dtype == jnp.float64 and use_dpmm:
            from ..ops.transfer import OzakiMatmulTransfer as _DpTransferCls
        self.transfers_nobc = [None] + [
            _DpTransferCls(self.grids[l], self.grids[l - 1], f_dtype,
                           constrained=False)
            for l in range(1, L)
        ]
        _tick("transfers")

        # boundary data + rhs per level (multigrid_solver.h:224-262);
        # masks kept as per-axis factors (LazyMaskList) so jitted solves
        # embed only 1-D constants — a materialized 513^3 mask per level
        # would overflow the remote-compile payload at the flagship size
        from ..ops.masks import LazyMaskList, interior_axes_jnp

        self.bmask = LazyMaskList(
            [interior_axes_jnp(g) for g in self.grids], invert=True
        )
        _tick("masks")
        # u_bc lives as 2*dim FACE slabs per level, never as a dense node
        # grid: the dense array is zero off the boundary, and shipping it
        # over the device link costs ~70 s/GB at the flagship (measured —
        # the link, not the host compute, dominated u_bc[7] = 100 s);
        # _impose_bc re-creates the where(bmask, u_bc, x) semantics from
        # the slabs on device.
        self.u_bc = []
        self.rhs = []
        self._exact_fn = exact_fn
        self._exact_quad_cache = {}
        for l, g in enumerate(self.grids):
            faces_np = _bc_faces_host(g, exact_fn)
            if _timing and l == 0:
                _tick("u_bc[0] host faces")
            dev_faces = [jnp.asarray(f, f_dtype) for f in faces_np]
            if _timing and l == 0:
                jax.block_until_ready(dev_faces)
                _tick("u_bc[0] device transfer")
            self.u_bc.append(dev_faces)
            _tick(f"u_bc[{l}]")
            if g.dim == 3 and isinstance(self.ops_dp[l].coef, DiagCoef):
                # 3-D separable grids assemble the dp rhs on the HOST at
                # EVERY level (native fp64, no device compile): the on-device
                # fp64-emulation assembly costs minutes of compile per level
                # (143 s for the COARSEST level alone at the flagship, ~25
                # min unrolled at 135M); the dgemm host path takes seconds.
                # When the driver declares a rank-1 separable rhs_fn, the
                # M f part becomes an on-device outer product of 1-D
                # assembled vectors and only thin -A u_bc boundary slabs
                # cross the link (vs the full dense rhs, 70 s at 135M).
                from ..ops.laplace import compute_rhs_host

                sep = getattr(rhs_fn, "separable_1d", None)
                # separable device assembly only where the link transfer
                # hurts; small levels ship dense (also keeps the disjoint
                # slab decomposition away from its < 2(p+1)-plane edge case)
                if sep is not None and g.n_dofs > 4_000_000:
                    self.rhs.append(self._rhs_separable_device(
                        l, g, sep(g.dim), faces_np))
                else:
                    self.rhs.append(jnp.asarray(
                        compute_rhs_host(g, rhs_fn, _dense_bc_host(g, faces_np),
                                         self.ops_dp[l].coef), f_dtype))
            else:
                quads = g.quad_coords_interleaved()
                f_quad = jnp.asarray(
                    np.asarray(rhs_fn(quads), dtype=np.float64), f_dtype)
                ubc = self._impose_bc(
                    self.u_bc[l], jnp.zeros(g.shape, f_dtype))
                rhs_fn_op = (self.ops_dp[l].compute_rhs_chunked
                             if g.dim == 3 and g.n_dofs > 4_000_000
                             else self.ops_dp[l].compute_rhs)
                self.rhs.append(jax.jit(rhs_fn_op)(f_quad, ubc))
                del f_quad, ubc
            _tick(f"rhs[{l}]")

        # Chebyshev smoothers (multigrid_solver.h:268-291).  The diagonal
        # preconditioner is rebuilt in-graph from separable factors at each
        # trace (op.inverse_diagonal is O(1-D constants)); capturing a
        # materialized inv_diag array would embed an O(N) literal per level.
        self.smoothers = []
        for l in range(L):
            _op = self.ops[l]
            precond = lambda r, _o=_op: _o.inverse_diagonal() * r
            example = jnp.zeros(self.grids[l].shape, v_dtype)
            if l > self.minlevel:
                # deal.II semantics: smoother_data.degree = n_pre literally
                # (/root/reference/common/multigrid_solver.h:275); the
                # interval/degree mapping lives in Chebyshev.create.
                deg = n_pre
                if finest_degree is not None and l == self.maxlevel:
                    deg = finest_degree
                sm = Chebyshev.create(
                    self.sp_ops[l].vmult,
                    None,
                    smoothing_range=20.0,
                    degree=deg,
                    eig_cg_n_iterations=15,
                    kind=chebyshev_kind,
                    precond=precond,
                    example=example,
                )
            else:
                sm = Chebyshev.create(
                    self.sp_ops[l].vmult,
                    None,
                    smoothing_range=coarse_smoothing_range,
                    degree=None,
                    eig_cg_n_iterations=self.grids[l].n_dofs,
                    kind=FIRST_KIND,
                    precond=precond,
                    example=example,
                )
            self.smoothers.append(sm)
            _tick(f"smoother[{l}]")

        # windowed sp smoother path (sp_impl="pallas_windowed"): on
        # qualifying levels the V-cycle carries its vectors in the fused
        # Mosaic kernel's persistent x-windowed layout
        # (ops/pallas_windowed_sp), eliminating the XLA window/scatter
        # relayouts that bound the dense-element path.  The windowed
        # Chebyshev clones the node smoother's estimated interval (same
        # operator spectrum; the Lanczos estimate ran on the node path).
        self._sp_win = {}
        if sp_impl == "pallas_windowed":
            from ..ops.pallas_windowed_sp import (FusedChebyshev,
                                                  PallasWindowedSP,
                                                  windowed_inv_diag_factory)

            interpret = jax.default_backend() != "tpu"
            for l in range(self.minlevel + 1, L):
                g = self.grids[l]
                if not (g.dim == 3 and g.degree == 4
                        and isinstance(self.ops[l].coef, DiagCoef)
                        and (interpret or (_win_cx_ok(g.cells[2])
                                           and g.n_dofs > chunk_threshold))):
                    continue
                opw = PallasWindowedSP(g, make_diag_coef(g, coefficient),
                                       interpret=interpret,
                                       cy_chunk=_cy_chunk())
                opw.install_diag_factors(self.ops[l])
                inv_diag = windowed_inv_diag_factory(opw, self.ops[l])
                sm = self.smoothers[l]
                if sm.kind == FIRST_KIND:
                    smw = FusedChebyshev(
                        opw, inv_diag, theta=sm.theta, delta=sm.delta,
                        degree=sm.degree, max_eig=sm.max_eig,
                        min_eig=sm.min_eig)
                else:
                    smw = Chebyshev(
                        vmult_op=opw.vmult_windowed,
                        precond=lambda r, _f=inv_diag: _f() * r,
                        theta=sm.theta, delta=sm.delta, degree=sm.degree,
                        max_eig=sm.max_eig, min_eig=sm.min_eig, kind=sm.kind)
                self._sp_win[l] = (opw, smw)
                _tick(f"sp_win[{l}]")

        # composed windowed-boundary transfers at windowed levels
        # (ops/transfer.WindowedMatmulTransfer): fold the node<->window
        # lane relayout into the banded x-axis transfer factor, removing
        # one full relayout pass per restrict/prolongate in the windowed
        # V-cycle body (the ~150 ms/roundtrip flagship glue,
        # docs/tpu_r3/fmg_profile4.log).  TPU default: hardware A/B
        # 2026-08-19 measured flagship FMG 0.746 s vs 0.801 s, same L2
        # error (docs/tpu_r3/bench_wt.log).  MGT_WIN_TRANSFER=0/1
        # overrides either way; requires the MatmulTransfer sp flavor.
        self._win_transfers = {}
        _wtr = _os.environ.get("MGT_WIN_TRANSFER")
        _use_wtr = (jax.default_backend() == "tpu" if _wtr is None
                    else _wtr not in ("", "0"))
        if self._sp_win and _use_wtr:
            from ..ops.transfer import (MatmulTransfer as _MMT,
                                        WindowedMatmulTransfer)

            for l, (opw, _) in self._sp_win.items():
                if isinstance(self.transfers[l], _MMT):
                    self._win_transfers[l] = WindowedMatmulTransfer(
                        self.transfers[l], opw)

        self._fmg_jit = None
        self._cg_jit = None
        self._vmult_dp_jit = None
        self._vmult_sp_jit = None
        self._vcycle_jits = {}
        self._resid_jits = {}
        self._misc_jits = {}
        # per-level sharding hook (identity on one device).  The distributed
        # wrapper (parallel/distributed.py) replaces it with
        # ``lax.with_sharding_constraint`` so GSPMD keeps every level's
        # vectors domain-decomposed — the TPU analogue of the reference's
        # per-level MPI partitioners (multigrid_solver.h:151-200).
        self._constrain = lambda level, x: x
        # the windowed sp path auto-disables when a distributed wrapper
        # replaces the hook (sharding constraints act on node grids)
        self._constrain_default = self._constrain

    def reset_jit_caches(self):
        """Drop all cached jitted callables (needed when the sharding hook
        changes after construction)."""
        self._fmg_jit = None
        self._cg_jit = None
        self._vmult_dp_jit = None
        self._vmult_sp_jit = None
        self._vcycle_jits = {}
        self._resid_jits = {}
        self._misc_jits = {}
        # the stepped-CG programs close over _precond/_constrain too
        if hasattr(self, "_cg_step_cache"):
            self._cg_step_cache = {}
        # device placement of the windowed-pair rhs follows the sharding
        self._rhs_win = None

    def _impose_bc(self, faces, x: jnp.ndarray) -> jnp.ndarray:
        """Overwrite the Dirichlet boundary of ``x`` with the stored
        analytic face values — identical to ``jnp.where(boundary_mask,
        u_bc_dense, x)`` with the dense u_bc never materialized or
        transferred (edge/corner nodes are set more than once with the
        same value)."""
        i = 0
        for d in range(x.ndim):
            for side in (0, 1):
                f = faces[i]
                i += 1
                idx = [slice(None)] * x.ndim
                idx[d] = (slice(0, 1) if side == 0
                          else slice(x.shape[d] - 1, x.shape[d]))
                x = x.at[tuple(idx)].set(f.astype(x.dtype))
        return x

    def _rhs_separable_device(self, level: int, g: DofGrid, factors,
                              faces_np) -> jnp.ndarray:
        """dp rhs ``b = M f - A u_bc`` assembled ON DEVICE for rank-1
        separable f = prod_d factors[d](x_d): the mass term is an outer
        product of 1-D host-assembled vectors (exact — the cells containing
        a node and the quadrature both factorize per axis), and only thin
        node slabs of the boundary correction cross the device link
        (6*(p+1) planes at the flagship vs the full dense rhs: 63 MB vs
        1.08 GB at ~15 MB/s measured link rate)."""
        from ..ops.laplace import (_scatter_pair_host,
                                   compute_bc_slab_correction_host)

        b = g.basis
        S = np.asarray(b.S, np.float64)
        qw = np.asarray(b.quad_weights, np.float64)
        vs = []
        for d in range(3):
            xq = np.asarray(g.axis_quads[d], np.float64)     # [nc, q]
            fd = np.asarray(factors[d](xq), np.float64)
            m = (fd * qw[None, :]) @ S                       # [nc, n]
            vs.append(_scatter_pair_host(m, g.degree))       # [N_d]
        vs[0] = vs[0] * g.jxw_scalar
        import os as _os
        import time as _time

        _timing = _os.environ.get("MGT_SETUP_TIMING")
        _t = _time.perf_counter()
        slabs, slices = [], []
        if any(np.any(f) for f in faces_np):
            # O(surface) host assembly over the 6 boundary cell blocks —
            # the dense O(volume) path cost 37 s single-core at 135M dofs
            slices, arrs = compute_bc_slab_correction_host(
                g, faces_np, self.ops_dp[level].coef)
            if _timing:
                print(f"#   rhs[{level}] host correction: "
                      f"{_time.perf_counter()-_t:.2f} s", flush=True)
                _t = _time.perf_counter()
            slabs = [jnp.asarray(a, self.f_dtype) for a in arrs]
            jax.block_until_ready(slabs)
            if _timing:
                print(f"#   rhs[{level}] slab transfer: "
                      f"{_time.perf_counter()-_t:.2f} s", flush=True)
                _t = _time.perf_counter()

        # EAGER: the jitted form of this 8-op build recompiled every run at
        # level 6 (~21 s/run, persistent-cache miss of unknown cause)
        # while level 7 cached — eager ops have no compile payload at all
        r = (jnp.asarray(vs[0], self.f_dtype)[:, None, None]
             * (jnp.asarray(vs[1], self.f_dtype)[None, :, None]
                * jnp.asarray(vs[2], self.f_dtype)[None, None, :]))
        for sl, a in zip(slices, slabs):
            r = r.at[sl].add(a)
        out = jnp.where(self.bmask[level], 0.0, r)
        if _timing:
            jax.block_until_ready(out)
            print(f"#   rhs[{level}] build: "
                  f"{_time.perf_counter()-_t:.2f} s", flush=True)
        return out

    def exact_on_quad(self, level: int) -> jnp.ndarray:
        """Analytic solution at the quadrature points of one level (lazily
        built: at the flagship size this array is ~2GB dp and is only
        needed by the analysis paths, never by the timed solves)."""
        if level not in self._exact_quad_cache:
            quads = self.grids[level].quad_coords_interleaved()
            self._exact_quad_cache[level] = jnp.asarray(
                np.asarray(self._exact_fn(quads), dtype=np.float64), self.f_dtype
            )
        return self._exact_quad_cache[level]

    def _jit_of(self, key, fn):
        if key not in self._misc_jits:
            self._misc_jits[key] = jax.jit(fn)
        return self._misc_jits[key]

    def _vcycle_jit(self, level: int, n_cyc: int):
        key = (level, n_cyc)
        if key not in self._vcycle_jits:
            self._vcycle_jits[key] = jax.jit(
                lambda d, _l=level, _n=n_cyc: self.v_cycle(_l, d, _n)
            )
        return self._vcycle_jits[key]

    def _residual_jit(self, level: int):
        if level not in self._resid_jits:
            self._resid_jits[level] = jax.jit(self.dp_ops[level].vmult_residual)
        return self._resid_jits[level]

    # ------------------------------------------------------------- v-cycle
    def v_cycle(self, level: int, defect: jnp.ndarray, n_cyc: int) -> jnp.ndarray:
        """Returns the correction; multigrid_solver.h:640-681."""
        defect = self._constrain(level, defect)
        if level == self.minlevel:
            return self.smoothers[level].vmult(defect)
        if (level in self._sp_win
                and self._constrain is self._constrain_default):
            return self._v_cycle_windowed(level, defect, n_cyc)
        upd = None
        for c in range(n_cyc):
            if upd is None:
                upd = self.smoothers[level].vmult(defect)
            else:
                upd = self.smoothers[level].step(upd, defect)
            t = self.sp_ops[level].vmult_residual(defect, upd)
            dc = self.transfers[level].restrict(t)
            corr = self.v_cycle(level - 1, dc, 1)
            upd = upd + self._constrain(level, self.transfers[level].prolongate(corr))
            upd = self.smoothers[level].step(upd, defect)
        return upd

    def _v_cycle_windowed(self, level: int, defect: jnp.ndarray,
                          n_cyc: int) -> jnp.ndarray:
        """Level body on persistent windowed sp vectors (the fused Mosaic
        smoother path, ops/pallas_windowed_sp): all Chebyshev matvecs and
        vector updates stay in the kernel's x-windowed layout; the node
        grid appears only at the restrict/prolongate boundary and at
        entry/exit.  Same math as the node body above — the window map is
        a bijection on interior dofs with consistent duplicate slots."""
        opw, _ = self._sp_win[level]
        return opw.from_windowed(self._v_cycle_windowed_core(
            level, opw.to_windowed(defect), n_cyc))

    def _v_cycle_windowed_core(self, level: int, d: jnp.ndarray,
                               n_cyc: int) -> jnp.ndarray:
        """Windowed-in/windowed-out level body: the zero-relayout entry the
        pair-native CG preconditioner calls directly (its residual already
        lives in the dp kernel's windowed pair layout, whose hi plane IS
        the f32 defect)."""
        opw, smw = self._sp_win[level]
        wt = self._win_transfers.get(level)
        upd = None
        for c in range(n_cyc):
            upd = smw.vmult(d) if upd is None else smw.step(upd, d)
            t = opw.resid_fused(upd, d)
            if wt is not None:
                dc = wt.restrict_win(t)
            else:
                dc = self.transfers[level].restrict(opw.from_windowed(t))
            corr = self.v_cycle(level - 1, dc, 1)
            if wt is not None:
                cw = wt.prolongate_win(corr)
            else:
                cw = opw.to_windowed(self.transfers[level].prolongate(corr))
            upd = upd + cw
            upd = smw.step(upd, d)
        return upd

    # ----------------------------------------------------------------- FMG
    def _fmg(self, rhs, u_bc, rhs_win=None):
        """Full multigrid: multigrid_solver.h:386-476.  ``rhs``/``u_bc`` are
        jit arguments (per-level lists): baking them into the closure would
        serialize GBs of literals into the compile payload.

        ``rhs_win`` (optional, {level: windowed pair of the constrained
        rhs}): at windowed-smoother levels the dp residual is emitted
        straight into the fused kernel's layout as an f32 defect
        (PallasWindowedOzaki.residual_defect_win) and the V-cycle runs its
        zero-relayout core — the pair->node->window roundtrip between
        residual and smoother disappears (MGT_PAIR_FMG)."""
        sols = []
        d0 = rhs[0].astype(self.v_dtype)
        t = self.smoothers[0].vmult(d0)
        t = self.smoothers[0].step(t, d0)
        sol = t.astype(self.f_dtype)
        sols.append(sol)
        for l in range(1, self.maxlevel + 1):
            sol_bc = self._impose_bc(u_bc[l - 1], sol)
            if (rhs_win is not None and l in rhs_win
                    and l in getattr(self, "_pro_win", {})
                    and l in self._sp_win
                    and self._constrain is self._constrain_default):
                sol = self._fmg_level_pair(l, sol_bc, rhs_win)
                sols.append(sol)
                continue
            sol = self._constrain(l, self.transfers_nobc[l].prolongate(sol_bc))
            sol = jnp.where(self.bmask[l], 0.0, sol)
            if (rhs_win is not None and l in rhs_win
                    and l in self._sp_win
                    and self._constrain is self._constrain_default):
                dw = self.dp_ops[l].win.residual_defect_win(rhs_win[l], sol)
                updw = self._v_cycle_windowed_core(l, dw, self.n_cycles)
                upd = self._sp_win[l][0].from_windowed(updw)
            else:
                res = self.dp_ops[l].vmult_residual(rhs[l], sol)
                upd = self.v_cycle(l, res.astype(self.v_dtype), self.n_cycles)
            sol = sol + upd.astype(self.f_dtype)
            sols.append(sol)
        return sols

    def _fmg_level_pair(self, l: int, sol_bc, rhs_win):
        """One FMG level step with the solution kept in the dp kernel's
        windowed pair layout end-to-end (MGT_PAIR_FMG_PRO): masked
        window-composed pair prolongation (OzakiWindowedProlongate) ->
        in-layout dp residual -> zero-relayout V-cycle core -> pair
        correction add; the f64 node grid materializes ONCE, at exit.
        Same math as the node branch in :meth:`_fmg` (the composed factor
        values are an exact host-f64 permutation of the banded ones)."""
        from ..ops.df64 import df64_add

        win = self.dp_ops[l].win
        sw = self._pro_win[l].prolongate_win(sol_bc)
        dw = win.residual_defect_win_pair(rhs_win[l], sw)
        updw = self._v_cycle_windowed_core(l, dw, self.n_cycles)
        sh, sl = df64_add(sw[:, 0], sw[:, 1], updw, jnp.zeros_like(updw))
        return win.from_windowed_pair(sh, sl)

    def _build_rhs_win(self):
        """{level: windowed pair of the constrained rhs} for MGT_PAIR_FMG
        (one-time setup work; rhs is constant across solves).  Only levels
        where the dp windowed kernel and the sp windowed smoother share the
        same padded window geometry qualify."""
        import os as _os

        if getattr(self, "_rhs_win", None) is not None:
            return self._rhs_win
        self._rhs_win = {}
        # TPU default: hardware A/B 2026-08-19 measured flagship FMG
        # 0.7075 s (with MGT_WIN_TRANSFER) vs 0.746 s without the pair
        # handoff, same L2 error (docs/tpu_r3/bench_wtpair.log).
        _pf = _os.environ.get("MGT_PAIR_FMG")
        _use_pf = (jax.default_backend() == "tpu" if _pf is None
                   else _pf not in ("", "0"))
        if not _use_pf:
            return self._rhs_win
        for l, (opw, _) in self._sp_win.items():
            w = getattr(self.dp_ops[l], "win", None)
            if w is None or (w.cxp, w.Yp) != (opw.cxp, opw.Yp):
                continue
            self._rhs_win[l] = jax.jit(
                lambda r, _w=w: _w.to_windowed(
                    jnp.where(_w.interior, r, 0)))(self.rhs[l])
        return self._rhs_win

    def _build_pro_win(self, rhs_win):
        """{level: OzakiWindowedProlongate} for MGT_PAIR_FMG_PRO: keep the
        FMG solution in the dp windowed pair layout through prolongate ->
        residual -> correction add (setup-time factor build; qualifies
        exactly where the pair residual handoff does)."""
        import os as _os

        if getattr(self, "_pro_win", None) is not None:
            return self._pro_win
        self._pro_win = {}
        # TPU default: hardware A/B 2026-08-19 measured flagship FMG
        # 0.6567 s vs 0.6596 s on the node-materializing path, same L2
        # error 4.369e-10 (docs/tpu_r3/bench_pairpro.log vs
        # bench_limbs5.log) — a small win, and it drops the per-level
        # f64 node round trip's HBM churn.
        _pp = _os.environ.get("MGT_PAIR_FMG_PRO")
        _use = (jax.default_backend() == "tpu" if _pp is None
                else _pp not in ("", "0"))
        if not (_use and rhs_win):
            return self._pro_win
        from ..ops.transfer import OzakiWindowedProlongate

        for l in rhs_win:
            w = self.dp_ops[l].win
            self._pro_win[l] = OzakiWindowedProlongate(
                self.grids[l], self.grids[l - 1], w)
        return self._pro_win

    def solve(self) -> jnp.ndarray:
        """FMG solve; returns the finest-level solution incl. boundary
        values (cf. get_solution, multigrid_solver.h:376-382)."""
        rhs_win = self._build_rhs_win()
        self._build_pro_win(rhs_win)
        if self._fmg_jit is None:
            L = self.maxlevel
            # boundary reinstatement folded into the same program: one
            # dispatch per solve, and XLA fuses the where into the final
            # level's correction add (a full read+write pass saved)
            self._fmg_jit = jax.jit(lambda rhs, ubc, rw: self._impose_bc(
                ubc[L], self._fmg(rhs, ubc, rw)[-1]))
        return self._fmg_jit(self.rhs, self.u_bc, rhs_win)

    def solve_analyze(self, compute_errors: Optional[bool] = None):
        """FMG with per-level residual/error reporting
        (multigrid_solver.h:404-475, do_analyze branch).  Returns
        (solution, per-level dict list, v-cycle reduction rate).

        ONE jitted program computes everything in-graph — a farm of
        separately-jitted per-level pieces accumulates executables (and
        their reserved arenas) on the device backend and exhausts HBM at
        the flagship sizes.  ``compute_errors`` adds in-graph per-level L2
        errors; defaults to True below 4M dofs and False above (the
        exact-value arrays would crowd HBM — callers get the finest-level
        error from :meth:`l2_error`, which runs on the host at scale)."""
        if compute_errors is None:
            compute_errors = self.grids[self.maxlevel].n_dofs <= 4_000_000
        key = ("analyze", compute_errors)
        if key not in self._misc_jits:

            # residual REDUCTION ratios need ~1e-7 relative accuracy, not
            # dp: f32 norms avoid dot_f64's pair/partial-sum buffers, which
            # push the analyzed program past HBM at the 135M flagship
            def _norm(v):
                if v.dtype == jnp.float64 and not compute_errors:
                    return jnp.linalg.norm(v.astype(jnp.float32)).astype(
                        jnp.float64)
                return norm_f64(v) if v.dtype == jnp.float64 else (
                    jnp.linalg.norm(v))

            def analyzed(rhs, u_bc, exact_quads):
                d0 = rhs[0].astype(self.v_dtype)
                t = self.v_cycle(0, d0, 1)
                t = self.smoothers[0].step(t, d0)
                sol = t.astype(self.f_dtype)
                stats = []
                for l in range(1, self.maxlevel + 1):
                    sol_bc = self._impose_bc(u_bc[l - 1], sol)
                    sol = self._constrain(
                        l, self.transfers_nobc[l].prolongate(sol_bc))
                    if compute_errors:
                        u_full = self._impose_bc(u_bc[l], sol)
                        err_start = self.ops_dp[l].l2_error(
                            u_full, exact_quads[l])
                    else:
                        err_start = jnp.nan
                    sol = jnp.where(self.bmask[l], 0.0, sol)
                    res = self.dp_ops[l].vmult_residual(rhs[l], sol)
                    res_start = _norm(res)
                    upd = self.v_cycle(l, res.astype(self.v_dtype),
                                       self.n_cycles)
                    sol = sol + upd.astype(self.f_dtype)
                    res_end = _norm(
                        self.dp_ops[l].vmult_residual(rhs[l], sol))
                    if compute_errors:
                        u_full = self._impose_bc(u_bc[l], sol)
                        err_end = self.ops_dp[l].l2_error(
                            u_full, exact_quads[l])
                    else:
                        err_end = jnp.nan
                    stats.append((err_start, res_start, res_end, err_end))
                return sol, stats

            self._misc_jits[key] = jax.jit(analyzed)

        eq = ([self.exact_on_quad(l) for l in range(self.maxlevel + 1)]
              if compute_errors else
              [jnp.zeros((), self.f_dtype)] * (self.maxlevel + 1))
        sol, stats = self._misc_jits[key](self.rhs, self.u_bc, eq)
        report = []
        reduction = 1.0
        for l, (e0, r0, r1, e1) in enumerate(stats, start=1):
            reduction = (float(r1) / float(r0)) ** (1.0 / self.n_cycles)
            report.append(
                dict(level=l, error_start=float(e0), residual_start=float(r0),
                     residual_end=float(r1), error_end=float(e1),
                     reduction=reduction)
            )
        solution = self._impose_bc(self.u_bc[self.maxlevel], sol)
        return solution, report, reduction

    # ------------------------------------------------------------------ CG
    def _precond(self, r: jnp.ndarray) -> jnp.ndarray:
        """V-cycle preconditioner in sp (multigrid_solver.h:497-510)."""
        upd = self.v_cycle(self.maxlevel, r.astype(self.v_dtype), 1)
        return upd.astype(self.f_dtype)

    def solve_cg(self, rtol: float = 1e-9, abs_tol: float = 1e-16,
                 max_iterations: int = 1000):
        """CG on the dp operator preconditioned by one V-cycle
        (multigrid_solver.h:483-493).  Returns (solution_with_bc, iterations,
        reduction_per_iteration).  Above ~64M dofs the iteration is stepped
        from the host with donated carries (see cg_solve_stepped); with the
        windowed hybrid dp operator installed (dp_impl="pallas_windowed")
        the stepped CG runs pair-native on persistent windowed vectors.

        Padded window geometries carry their pad waste into EVERY CG
        dp matvec, pair axpy and pair dot (8 iterations at rtol 1e-9),
        unlike FMG whose dp work is once per level — hardware A/B
        2026-08-19 (docs/tpu_r3/ladder_mid_pad.log vs the XLA-fallback
        rows): pair-CG wins at 1.14x pad (90.5M: 2.38 vs 3.38 s) but
        loses at 1.33x/1.6x (57M: 2.50 vs 1.97 s; 33M: 1.48 vs 1.22 s).
        ``MGT_PAIR_CG_PAD`` (default 1.25) caps the pad ratio for the
        pair-native CG path; beyond it the node-grid CG paths run."""
        import os as _os

        L = self.maxlevel
        _win = getattr(self.dp_ops[L], "win", None)
        if _win is not None and not _win.interpret:
            _env = _os.environ.get("MGT_PAIR_CG_PAD")
            _cap = 1.25 if _env in (None, "") else float(_env)
            if _win.cxp / self.grids[L].cells[2] > _cap:
                _win = None
        if _win is not None:
            from .cg import cg_solve_stepped_pair

            if not hasattr(self, "_cg_step_cache"):
                self._cg_step_cache = {}
            # when the finest-level V-cycle runs windowed too, hand the CG
            # a windowed preconditioner: the whole CG iteration then has
            # ZERO node-grid relayouts (the dp pair layout and the sp
            # windowed layout share the same geometry)
            use_win_pc = (L in self._sp_win
                          and self._constrain is self._constrain_default)
            res: CGResult = cg_solve_stepped_pair(
                self.dp_ops[L].win,
                self.rhs[L],
                precond_f32=None if use_win_pc else (
                    lambda rn: self._constrain(L, self.v_cycle(L, rn, 1))),
                precond_win=(lambda rw: self._v_cycle_windowed_core(
                    L, rw, 1)) if use_win_pc else None,
                max_iterations=max_iterations,
                abs_tol=abs_tol, rtol=rtol,
                _jit_cache=self._cg_step_cache,
            )
            its = int(res.iterations)
            red = (
                float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
            )
            sol = self._impose_bc(self.u_bc[L], res.x)
            return sol, its, red
        if self.grids[self.maxlevel].n_dofs > 64_000_000:
            from .cg import cg_solve_stepped

            if not hasattr(self, "_cg_step_cache"):
                self._cg_step_cache = {}
            # carry FLAT dp vectors: 3-D [513,513,513] f64 arrays pad ~27%
            # on the (8,128) tile grid (1.27 GB instead of 1.0 GB each);
            # 1-D layouts pad negligibly.  The operator/preconditioner
            # reshape internally.
            shape = self.grids[self.maxlevel].shape
            L = self.maxlevel
            res: CGResult = cg_solve_stepped(
                lambda pf: self.dp_ops[L].vmult(pf.reshape(shape)).reshape(-1),
                self.rhs[L].reshape(-1),
                precond=lambda rf: self._precond(rf.reshape(shape)).reshape(-1),
                max_iterations=max_iterations,
                abs_tol=abs_tol, rtol=rtol,
                _jit_cache=self._cg_step_cache,
            )
            its = int(res.iterations)
            red = (
                float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
            )
            sol = self._impose_bc(self.u_bc[L], res.x.reshape(shape))
            return sol, its, red
        if self._cg_jit is None:
            self._cg_jit = jax.jit(
                partial(
                    cg_solve,
                    self.dp_ops[self.maxlevel].vmult,
                    precond=self._precond,
                    max_iterations=max_iterations,
                    abs_tol=abs_tol,
                    rtol=rtol,
                )
            )
        res: CGResult = self._cg_jit(self.rhs[self.maxlevel])
        its = int(res.iterations)
        red = (
            float(res.final_norm / res.initial_norm) ** (1.0 / max(its, 1))
        )
        sol = self._impose_bc(self.u_bc[self.maxlevel], res.x)
        return sol, its, red

    # ----------------------------------------------------------- analysis
    def l2_error(self, level: int, sol: jnp.ndarray) -> float:
        g = self.grids[level]
        if g.dim == 3 and g.n_dofs > 4_000_000:
            # analysis path at flagship sizes runs on the HOST: exact-value
            # arrays + padded einsum temps in HBM would crowd out the solve
            from ..ops.laplace import l2_error_host

            u = self._impose_bc(self.u_bc[level], sol)
            return l2_error_host(g, np.asarray(u), self._exact_fn)
        u = self._impose_bc(self.u_bc[level], sol)
        return float(self._jit_of((level, "l2err"), self.ops_dp[level].l2_error)(
            u, self.exact_on_quad(level)))

    def v_cycle_timed(self, level: int, defect: jnp.ndarray, n_cyc: int,
                      timings) -> jnp.ndarray:
        """Instrumented V-cycle filling a LevelTimings table
        (cf. /root/reference/common/multigrid_solver.h:640-681)."""
        if level == self.minlevel:
            return timings.coarse(
                self._jit_of((level, "coarse"), self.smoothers[level].vmult),
                defect,
            )
        if (level in self._sp_win
                and self._constrain is self._constrain_default):
            return self._v_cycle_timed_windowed(level, defect, n_cyc, timings)
        upd = None
        sm = self.smoothers[level]
        for _ in range(n_cyc):
            if upd is None:
                upd = timings.timed(
                    level, "smoother", self._jit_of((level, "smv"), sm.vmult),
                    defect,
                )
            else:
                upd = timings.timed(
                    level, "smoother", self._jit_of((level, "sstep"), sm.step),
                    upd, defect,
                )
            t = timings.timed(
                level, "mg_mv",
                self._jit_of((level, "resid"), self.sp_ops[level].vmult_residual),
                defect, upd,
            )
            dc = timings.timed(
                level, "restrict",
                self._jit_of((level, "restrict"), self.transfers[level].restrict),
                t,
            )
            corr = self.v_cycle_timed(level - 1, dc, 1, timings)
            pro = timings.timed(
                level, "prolongate",
                self._jit_of((level, "prolong"), self.transfers[level].prolongate),
                corr,
            )
            upd = upd + pro
            upd = timings.timed(
                level, "smoother", self._jit_of((level, "sstep"), sm.step),
                upd, defect,
            )
        return upd

    def _v_cycle_timed_windowed(self, level: int, defect: jnp.ndarray,
                                n_cyc: int, timings) -> jnp.ndarray:
        """Timed twin of _v_cycle_windowed so the per-level wall-time table
        measures the solve path actually in use; layout conversions are
        booked under mg_vec."""
        opw, smw = self._sp_win[level]
        d = timings.timed(level, "mg_vec",
                          self._jit_of((level, "towin"), opw.to_windowed),
                          defect)
        upd = None
        for _ in range(n_cyc):
            if upd is None:
                upd = timings.timed(
                    level, "smoother",
                    self._jit_of((level, "wsmv"), smw.vmult), d)
            else:
                upd = timings.timed(
                    level, "smoother",
                    self._jit_of((level, "wsstep"), smw.step), upd, d)
            t_w = timings.timed(
                level, "mg_mv",
                self._jit_of((level, "wresid"), opw.resid_fused), upd, d)
            t = timings.timed(
                level, "mg_vec",
                self._jit_of((level, "fromwin"), opw.from_windowed), t_w)
            dc = timings.timed(
                level, "restrict",
                self._jit_of((level, "restrict"), self.transfers[level].restrict),
                t,
            )
            corr = self.v_cycle_timed(level - 1, dc, 1, timings)
            pro = timings.timed(
                level, "prolongate",
                self._jit_of((level, "prolong"), self.transfers[level].prolongate),
                corr,
            )
            cw = timings.timed(
                level, "mg_vec",
                self._jit_of((level, "towin"), opw.to_windowed), pro)
            upd = upd + cw
            upd = timings.timed(
                level, "smoother",
                self._jit_of((level, "wsstep"), smw.step), upd, d)
        return timings.timed(
            level, "mg_vec",
            self._jit_of((level, "fromwin"), opw.from_windowed), upd)

    def matvec_native(self, x: jnp.ndarray) -> jnp.ndarray:
        """Convert an f64 node grid to the finest dp operator's persistent
        vector format (identity for node-grid operators; windowed f32 pair
        for the hybrid).  Benchmark inputs go through this ONCE, outside
        the timed loop — mirroring the reference, whose matvec benchmark
        runs on vectors already in its ghosted layout."""
        op = self.dp_ops[self.maxlevel]
        if getattr(op, "win", None) is not None:
            return self._jit_of(("mv", "towin"), lambda v: op.win.to_windowed(
                jnp.where(op.win.interior, v, 0)))(x)
        return x

    def do_matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """dp matvec benchmark entry (multigrid_solver.h:623-628); operates
        on the native dp vector format (see matvec_native)."""
        op = self.dp_ops[self.maxlevel]
        if self._vmult_dp_jit is None:
            fn = (op.win.vmult_windowed
                  if getattr(op, "win", None) is not None else op.vmult)
            self._vmult_dp_jit = jax.jit(fn)
        return self._vmult_dp_jit(x)

    def matvec_native_sp(self, x: jnp.ndarray) -> jnp.ndarray:
        """Convert an sp node grid to the finest sp operator's persistent
        vector format (windowed when the fused smoother kernel is
        installed; identity otherwise).  Cf. matvec_native."""
        if self.maxlevel in self._sp_win:
            opw, _ = self._sp_win[self.maxlevel]
            return self._jit_of(("mvsp", "towin"), lambda v: opw.to_windowed(
                jnp.where(opw.interior, v, 0)))(x)
        return x

    def do_matvec_smoother(self, x: jnp.ndarray) -> jnp.ndarray:
        """sp matvec benchmark entry (multigrid_solver.h:632-637); operates
        on the native sp vector format (see matvec_native_sp)."""
        if self._vmult_sp_jit is None:
            if self.maxlevel in self._sp_win:
                fn = self._sp_win[self.maxlevel][0].vmult_windowed
            else:
                fn = self.sp_ops[self.maxlevel].vmult
            self._vmult_sp_jit = jax.jit(fn)
        return self._vmult_sp_jit(x)
