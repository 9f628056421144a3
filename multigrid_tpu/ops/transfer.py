"""Tensorized 2:1 multigrid transfer on structured node grids.

TPU-native replacement for deal.II ``MGTransferMatrixFree``
(/root/reference/common/multigrid_solver.h:208-222, 668, 674): prolongation
applies the 1-D two-child embedding matrix ``P[(2p+1), (p+1)]`` per axis on
coarse-cell windows and scatters to the fine grid with touch-count weights
(1/valence averaging, as deal.II does); ``restrict`` is the exact adjoint.

Two flavors exist, as in the reference: an unconstrained transfer for
prolongating solutions with inhomogeneous boundary values
(``mg_transfer_no_boundary``) and a constrained one for the V-cycle that
zeroes Dirichlet nodes on both levels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh.brick import DofGrid
from .laplace import apply_1d
from .masks import bcast_and, bcast_prod, interior_axes_jnp
from .windows import gather_cells, scatter_cells


class Transfer:
    def __init__(self, fine: DofGrid, coarse: DofGrid, dtype=jnp.float32,
                 constrained: bool = True):
        assert fine.level == coarse.level + 1
        assert fine.degree == coarse.degree
        self.fine = fine
        self.coarse = coarse
        self.constrained = constrained
        b = fine.basis
        p = fine.degree
        self.n = p + 1
        self.nf = 2 * p + 1
        self.P = jnp.asarray(b.P, dtype)
        self.Pt = jnp.asarray(b.P.T, dtype)
        self._df64 = dtype == jnp.float64
        if self._df64:
            from .df64 import SplitMatrix

            self._Pd = SplitMatrix(b.P)
            self._Ptd = SplitMatrix(b.P.T)
        # touch-count weights on the fine grid: fine nodes on interior
        # *coarse*-cell boundaries are produced by two coarse windows
        # separable factors only: full-grid weight/mask constants would be
        # embedded as O(N) literals in every jitted V-cycle
        self._weight_axes = []
        for d in range(fine.dim):
            ncc = coarse.cells[d]
            line = np.ones(ncc * 2 * p + 1)
            if ncc > 1:
                line[2 * p : -1 : 2 * p] = 0.5
            self._weight_axes.append(jnp.asarray(line, dtype))
        self._fine_axes = interior_axes_jnp(fine)
        self._coarse_axes = interior_axes_jnp(coarse)

    @property
    def weights(self):
        return bcast_prod(self._weight_axes)

    @property
    def fine_interior(self):
        return bcast_and(self._fine_axes)

    @property
    def coarse_interior(self):
        return bcast_and(self._coarse_axes)

    # full-grid gather windows ([Ncz,9,Ncy,9,Ncx,9] interleaved) tile-pad
    # ~3.6x on TPU (lane 64->128, sublane 9->16) — 4.8 GB of HLO temp at the
    # 135M finest transfer, the allocation that OOMed the pair-CG step
    # program.  Above this many fine dofs the 3-D sweeps run chunked by
    # coarse-z cell layer (lax.map + additive 1-plane boundary merge, the
    # DenseLaplaceF32Chunked pattern): peak window temp drops by ~Ncz.
    _CHUNK_DOFS = 4_000_000

    def _chunked(self) -> bool:
        return (self.fine.dim == 3 and not self._df64
                and self.fine.n_dofs > self._CHUNK_DOFS
                and self.coarse.cells[0] > 1)

    def prolongate(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        u = u_coarse
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0)
        if self._df64:
            return self._prolongate_df64(u)
        if self._chunked():
            uf = self._prolongate_chunked(u) * self.weights
        else:
            w = gather_cells(u, self.n)
            for d in range(self.fine.dim):
                w = apply_1d(w, self.P, 2 * d + 1)
            uf = scatter_cells(w, self.nf) * self.weights
        if self.constrained:
            uf = jnp.where(self.fine_interior, uf, 0)
        return uf

    def restrict(self, u_fine: jnp.ndarray) -> jnp.ndarray:
        """Adjoint of :meth:`prolongate` (deal.II ``restrict_and_add`` without
        the add, which the caller does on a zeroed vector,
        /root/reference/common/multigrid_solver.h:667-668)."""
        u = u_fine
        if self.constrained:
            u = jnp.where(self.fine_interior, u, 0)
        if self._df64:
            return self._restrict_df64(u)
        if self._chunked():
            uc = self._restrict_chunked(u * self.weights)
        else:
            w = gather_cells(u * self.weights, self.nf)
            for d in range(self.fine.dim):
                w = apply_1d(w, self.Pt, 2 * d + 1)
            uc = scatter_cells(w, self.n)
        if self.constrained:
            uc = jnp.where(self.coarse_interior, uc, 0)
        return uc

    # ------------------------------------------------- chunked 3-D flavors
    def _restrict_chunked(self, uw: jnp.ndarray) -> jnp.ndarray:
        """Per coarse-z-layer: fine planes [zi*2p, zi*2p+2p+1) -> windows
        [1,nf,Ncy,nf,Ncx,nf] -> Pt sweeps -> coarse slab [n z-planes];
        adjacent slabs share one coarse plane (additive merge)."""
        import jax

        p = self.fine.degree
        ncz = self.coarse.cells[0]
        Yc, Xc = self.coarse.shape[1], self.coarse.shape[2]

        def body(zi):
            s = jax.lax.dynamic_slice_in_dim(uw, zi * 2 * p, self.nf, axis=0)
            w = gather_cells(s, self.nf)
            for d in range(3):
                w = apply_1d(w, self.Pt, 2 * d + 1)
            return scatter_cells(w, self.n)            # [n, Yc, Xc]

        slabs = jax.lax.map(body, jnp.arange(ncz))
        main = slabs[:, :p].reshape(ncz * p, Yc, Xc)
        tail = jnp.concatenate(
            [jnp.zeros((ncz, p - 1, Yc, Xc), slabs.dtype), slabs[:, p:]],
            axis=1).reshape(ncz * p, Yc, Xc)
        return (jnp.pad(main, ((0, 1), (0, 0), (0, 0)))
                + jnp.pad(tail, ((1, 0), (0, 0), (0, 0))))

    def _prolongate_chunked(self, u: jnp.ndarray) -> jnp.ndarray:
        """Adjoint chunking: coarse planes [zi*p, zi*p+p+1) -> P sweeps ->
        fine slab [nf z-planes]; 1-fine-plane additive overlap."""
        import jax

        p = self.fine.degree
        ncz = self.coarse.cells[0]
        Y, X = self.fine.shape[1], self.fine.shape[2]

        def body(zi):
            s = jax.lax.dynamic_slice_in_dim(u, zi * p, self.n, axis=0)
            w = gather_cells(s, self.n)
            for d in range(3):
                w = apply_1d(w, self.P, 2 * d + 1)
            return scatter_cells(w, self.nf)           # [nf, Y, X]

        slabs = jax.lax.map(body, jnp.arange(ncz))
        s2 = 2 * p
        main = slabs[:, :s2].reshape(ncz * s2, Y, X)
        tail = jnp.concatenate(
            [jnp.zeros((ncz, s2 - 1, Y, X), slabs.dtype), slabs[:, s2:]],
            axis=1).reshape(ncz * s2, Y, X)
        return (jnp.pad(main, ((0, 1), (0, 0), (0, 0)))
                + jnp.pad(tail, ((1, 0), (0, 0), (0, 0))))

    # --------------------------------------------------------- df64 flavor
    # (see class MatmulTransfer below for the MXU banded-matmul flavor)
    # fp64 transfers on TPU must avoid the native-f64 einsum (XLA emulation
    # is ~100x slower: 540 ms vs 8 ms at 17M dofs); the P sweeps run as
    # compensated f32-pair contractions instead.  The touch-count weights
    # are powers of two, so the final scaling is exact per component.
    def _prolongate_df64(self, u):
        from .df64 import apply_1d_df64, join_f64, split_f64
        from .laplace_df64 import scatter_cells_df64

        uh, ul = split_f64(u)
        wh = gather_cells(uh, self.n)
        wl = gather_cells(ul, self.n)
        for d in range(self.fine.dim):
            wh, wl = apply_1d_df64(wh, wl, self._Pd, 2 * d + 1)
        yh, yl = scatter_cells_df64(wh, wl)
        wgt = self.weights.astype(jnp.float32)   # powers of two: exact
        uf = join_f64(yh * wgt, yl * wgt)
        if self.constrained:
            uf = jnp.where(self.fine_interior, uf, 0)
        return uf

    def _restrict_df64(self, u):
        from .df64 import apply_1d_df64, join_f64, split_f64
        from .laplace_df64 import scatter_cells_df64

        uh, ul = split_f64(u)
        wgt = self.weights.astype(jnp.float32)
        wh = gather_cells(uh * wgt, self.nf)
        wl = gather_cells(ul * wgt, self.nf)
        for d in range(self.fine.dim):
            wh, wl = apply_1d_df64(wh, wl, self._Ptd, 2 * d + 1)
        yh, yl = scatter_cells_df64(wh, wl)
        uc = join_f64(yh, yl)
        if self.constrained:
            uc = jnp.where(self.coarse_interior, uc, 0)
        return uc


class MatmulTransfer(Transfer):
    """Per-axis dense banded transfer matrices on the MXU.

    The tensorized transfer is separable: prolongation = (M_z (x) M_y (x)
    M_x) u_c with M_d = W_d S_d, where S_d block-sums the 1-D two-child
    embedding P over coarse cells and W_d holds the touch-count weights —
    so each axis is ONE banded [fine_d, coarse_d] matmul, and restriction
    contracts the transposes.  This replaces the gather-window/sweep/
    scatter pipeline (whose cross-lane window relayouts are the measured
    glue wall of the XLA paths at scale) with three MXU GEMMs; enabled in
    the solver via MGT_MATMUL_TRANSFER=1 pending hardware A/B.  Same
    deal.II ``MGTransferMatrixFree`` semantics as the base class.
    """

    def __init__(self, fine: DofGrid, coarse: DofGrid, dtype=jnp.float32,
                 constrained: bool = True):
        super().__init__(fine, coarse, dtype, constrained)
        assert not self._df64, "matmul transfer is the sp V-cycle flavor"
        import numpy as _np

        b = fine.basis
        p = fine.degree
        self._M = []
        for d in range(fine.dim):
            ncc = coarse.cells[d]
            Xf, Xc = 2 * p * ncc + 1, p * ncc + 1
            S = _np.zeros((Xf, Xc))
            for c in range(ncc):
                S[2 * p * c: 2 * p * c + 2 * p + 1,
                  p * c: p * c + p + 1] += _np.asarray(b.P, _np.float64)
            w = _np.ones(Xf)
            if ncc > 1:
                w[2 * p: -1: 2 * p] = 0.5
            self._M.append(jnp.asarray(w[:, None] * S, dtype))

    def _axis_mm(self, u, d: int, restrict: bool):
        import jax

        M = self._M[d]
        out = jnp.tensordot(u, M, axes=[[d], [0 if restrict else 1]],
                            precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out, -1, d)

    def prolongate(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        u = u_coarse
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0)
        for d in range(self.fine.dim):
            u = self._axis_mm(u, d, restrict=False)
        if self.constrained:
            u = jnp.where(self.fine_interior, u, 0)
        return u

    def restrict(self, u_fine: jnp.ndarray) -> jnp.ndarray:
        u = u_fine
        if self.constrained:
            u = jnp.where(self.fine_interior, u, 0)
        for d in range(self.fine.dim):
            u = self._axis_mm(u, d, restrict=True)
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0)
        return u


class WindowedMatmulTransfer:
    """Composed windowed-boundary V-cycle transfer for windowed sp levels.

    At fused-smoother levels the V-cycle's restrict source and prolongate
    target live in the kernel's persistent x-windowed layout ``[Z, Yp, G]``
    (ops/pallas_windowed_sp.XWindowMap).  The node<->window relayout is a
    lane-permutation matmul in x, and :class:`MatmulTransfer`'s x factor is
    a banded matmul in x — so the two COMPOSE into one ``[G, Xc]`` /
    ``[Xc, G]`` factor whose entries are exactly a lane permutation of the
    banded factor (a 0/1 permutation placed in f64 on the host: no value
    changes, no accuracy change vs the node path beyond f32 summation
    order).  This removes one full relayout pass over the fine array per
    restrict and per prolongate — the measured ~150 ms/roundtrip glue of
    the flagship V-cycle (docs/tpu_r3/fmg_profile4.log).

    Fine-interior constraint masks are separable and absorbed into the
    factor rows; the coarse-side mask stays an elementwise ``where`` on the
    8x-smaller coarse grid.  Semantics match ``MatmulTransfer(constrained=
    True)`` around ``to_windowed``/``from_windowed`` (deal.II constrained
    ``MGTransferMatrixFree``, /root/reference/common/multigrid_solver.h:
    208-222).
    """

    def __init__(self, base: MatmulTransfer, opw):
        import jax

        assert isinstance(base, MatmulTransfer) and base.constrained
        assert base.fine.dim == 3
        self.base = base
        self._hi = jax.lax.Precision.HIGHEST
        fine = base.fine
        X = fine.shape[2]
        mf = [np.asarray(a, np.float64) for a in base._fine_axes]
        M = [np.asarray(base._M[d], np.float64) * mf[d][:, None]
             for d in range(3)]
        Pw, Pu = opw.xmap._mats()          # [Xp, G], [G, Xp]
        # x-axis factors composed with the window permutation (exact in f64)
        self._Cr = jnp.asarray(Pu[:, :X] @ M[2], jnp.float32)   # [G, Xc]
        self._Cp = jnp.asarray(M[2].T @ Pw[:X], jnp.float32)    # [Xc, G]
        self._My = jnp.asarray(M[1], jnp.float32)
        self._Mz = jnp.asarray(M[0], jnp.float32)
        self._Y = fine.shape[1]
        self._Yp = opw.Yp

    def restrict_win(self, w: jnp.ndarray) -> jnp.ndarray:
        """Windowed fine ``[Z, Yp, G]`` -> constrained coarse node grid."""
        u = jnp.tensordot(w[:, : self._Y], self._Cr, axes=[[2], [0]],
                          precision=self._hi)                  # [Z, Y, Xc]
        u = jnp.moveaxis(jnp.tensordot(u, self._My, axes=[[1], [0]],
                                       precision=self._hi), -1, 1)
        u = jnp.moveaxis(jnp.tensordot(u, self._Mz, axes=[[0], [0]],
                                       precision=self._hi), -1, 0)
        return jnp.where(self.base.coarse_interior, u, 0)

    def prolongate_win(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        """Constrained coarse node grid -> windowed fine ``[Z, Yp, G]``."""
        u = jnp.where(self.base.coarse_interior, u_coarse, 0)
        u = jnp.moveaxis(jnp.tensordot(u, self._Mz, axes=[[0], [1]],
                                       precision=self._hi), -1, 0)
        u = jnp.moveaxis(jnp.tensordot(u, self._My, axes=[[1], [1]],
                                       precision=self._hi), -1, 1)
        u = jnp.tensordot(u, self._Cp, axes=[[2], [0]],
                          precision=self._hi)                  # [Z, Y, G]
        return jnp.pad(u, ((0, 0), (0, self._Yp - self._Y), (0, 0)))


# --------------------------------------------------------------------------
# dp (f64) flavor of MatmulTransfer: exact-bf16-limb (Ozaki) MXU matmuls
# --------------------------------------------------------------------------

def _ozaki_band_groups(A: np.ndarray, n_limbs: int, max_m: int):
    """Limb-split a banded f64 matrix [K, Nout] into the triangular
    scale-group stacks of the dp operator scheme
    (ops/laplace_dense.DenseLaplaceOzaki.__init__): group m contracts
    input-limb prefix l = 0..m against matrix limbs k = m-l in one bf16
    MXU pass with exact f32 accumulation."""
    from .laplace_dense import _LIMB_BITS, _split_limbs_f64

    sigma, limbs = _split_limbs_f64(A, n_limbs, _LIMB_BITS)
    groups = [
        jnp.asarray(np.vstack([limbs[m - l] for l in range(m + 1)]),
                    jnp.bfloat16)
        for m in range(max_m + 1)
    ]
    return np.float64(sigma), groups


class OzakiMatmulTransfer(Transfer):
    """dp (f64) per-axis banded transfer matrices on the MXU.

    The df64 base-class flavor windows the grid into coarse-cell blocks and
    runs width-(p+1) compensated contractions on the VPU — correct, but the
    gather/scatter relayouts and elementwise two_prod chains are glue on a
    matmul machine.  This flavor reuses the dp operator's Ozaki scheme
    (ops/laplace_dense.py): each axis is ONE banded [fine_d, coarse_d]
    contraction evaluated as triangular scale-group bf16 matmuls with exact
    f32 accumulation, and the (hi, lo) f32 pair rides through all three
    axes (half the HBM traffic of f64 intermediates).  Exactness of the
    accumulation holds because a banded row contributes at most
    2*(p+1) nonzero products per group term — the dense zeros add exactly.

    Accuracy: ~2^(-7*n_limbs) relative to the per-line max (2^-49 at the
    7-limb default — the dp operator's own guarantee), vs the
    elementwise-relative df64 path; both are ~5 orders below the
    discretization-accuracy needs of the FMG dp prolongate
    (/root/reference/common/multigrid_solver.h:415).

    ``MGT_DPMM_LIMBS`` trades accuracy for speed: the FMG V-cycle pair
    after each prolongation contracts any prolongation perturbation by
    its residual-reduction factor (~0.14^2 at 2 cycles), so a 5-limb
    transfer (2^-35 per line -> ~6e-13 effective in the FMG solution)
    still sits 3 orders below the flagship discretization error while
    cutting the triangular matmul passes 28 -> 15 and the df64
    accumulation chain 6 -> 4.  TPU default is 5: hardware A/B 2026-08-19
    measured flagship FMG 0.6596 s vs 0.7067 s at 7 limbs, identical L2
    error 4.369e-10 under bench.py's host-side guard
    (docs/tpu_r3/bench_limbs5.log).  Off-TPU the default stays 7 (the
    CPU regression tier pins the dp transfer at df64-class 1e-14
    accuracy, and only the MXU makes the extra limbs costly).
    """

    _N_LIMBS = 7
    _MAX_M = 6

    def __init__(self, fine: DofGrid, coarse: DofGrid, dtype=jnp.float64,
                 constrained: bool = True, n_limbs: int | None = None):
        super().__init__(fine, coarse, dtype, constrained)
        assert self._df64, "OzakiMatmulTransfer is the dp flavor"
        import os

        from .laplace_dense import _LIMB_BITS

        if n_limbs is None:
            env = os.environ.get("MGT_DPMM_LIMBS")
            if env in (None, "", "0"):
                import jax as _jax

                n_limbs = (5 if _jax.default_backend() == "tpu"
                           else self._N_LIMBS)
            else:
                n_limbs = int(env)
        assert 2 <= n_limbs <= 7, n_limbs
        self._N_LIMBS = n_limbs
        self._MAX_M = n_limbs - 1

        p = fine.degree
        # the banded accumulation bound (see class docstring)
        assert (2 * _LIMB_BITS
                + np.log2((self._MAX_M + 1) * 2 * (p + 1))) < 24
        self._gp = []   # prolongate: contract coarse axis, A = M^T
        self._gr = []   # restrict:   contract fine axis,   A = M
        for d in range(fine.dim):
            M = self._banded_axis_matrix(d)
            self._gp.append(_ozaki_band_groups(
                M.T, self._N_LIMBS, self._MAX_M))
            self._gr.append(_ozaki_band_groups(
                M, self._N_LIMBS, self._MAX_M))

    def _banded_axis_matrix(self, d: int) -> np.ndarray:
        """Host f64 banded transfer factor M_d = W_d S_d for axis ``d``
        (the MatmulTransfer factor, incl. touch-count weights)."""
        b = self.fine.basis
        p = self.fine.degree
        ncc = self.coarse.cells[d]
        Xf, Xc = 2 * p * ncc + 1, p * ncc + 1
        S = np.zeros((Xf, Xc))
        for c in range(ncc):
            S[2 * p * c: 2 * p * c + 2 * p + 1,
              p * c: p * c + p + 1] += np.asarray(b.P, np.float64)
        w = np.ones(Xf)
        if ncc > 1:
            w[2 * p: -1: 2 * p] = 0.5
        return w[:, None] * S

    @staticmethod
    def _limb_split_pair(xh, xl, n_limbs):
        """Per-line scaled limb extraction from an f32 pair [M, K]
        (ops/laplace_dense.DenseLaplaceOzaki._limb_split_device, with the
        line = the contraction axis)."""
        from .df64 import two_sum
        from .laplace_dense import _LIMB_BITS

        s = jnp.max(jnp.abs(xh), axis=1, keepdims=True)
        from .laplace_general_mxu import pow2_ceil_f32

        # exact power-of-2 scale (f32 exp2 is inexact on integer args —
        # CLAUDE.md exp2 note; migrated r5 from exp2(ceil(log2)))
        sigma = pow2_ceil_f32(jnp.maximum(s, 1e-30))
        sigma = jnp.where(s > 0, sigma, 1.0)
        rh = xh / sigma
        rl = xl / sigma
        limbs = []
        for k in range(n_limbs):
            scale = np.float32(2.0 ** (_LIMB_BITS * (k + 1)))
            inv = np.float32(2.0 ** (-_LIMB_BITS * (k + 1)))
            chopped = jnp.round(rh * scale) * inv
            rh = rh - chopped  # exact (aligned grids)
            rh, rl = two_sum(rh, rl)
            limbs.append(
                (chopped * np.float32(2.0 ** (_LIMB_BITS * k))
                 ).astype(jnp.bfloat16))
        return sigma, limbs

    def _axis_mm_pair(self, xh, xl, d: int, restrict: bool, grp=None):
        """One banded axis contraction on an f32 pair, df64-accurate.
        ``grp`` overrides the factor groups (OzakiWindowedProlongate's
        masked/window-composed factors)."""
        from .df64 import df64_add
        from .laplace_dense import _LIMB_BITS

        sigma_A, groups = ((self._gr if restrict else self._gp)[d]
                           if grp is None else grp)
        K = groups[0].shape[0]
        shape_in = xh.shape
        xh = jnp.moveaxis(xh, d, -1).reshape(-1, K)
        xl = jnp.moveaxis(xl, d, -1).reshape(-1, K)
        sigma, limbs = self._limb_split_pair(xh, xl, self._N_LIMBS)
        packed = jnp.concatenate(limbs, axis=1)           # [M, n_limbs*K]
        acc_h = acc_l = None
        for m in range(self._MAX_M + 1):
            Ym = jnp.dot(packed[:, : (m + 1) * K], groups[m],
                         preferred_element_type=jnp.float32)
            delta = np.float32(sigma_A * 2.0 ** (-_LIMB_BITS * m))
            term = Ym * delta * sigma
            if acc_h is None:
                acc_h, acc_l = term, jnp.zeros_like(term)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, term,
                                        jnp.zeros_like(term))
        n_out = groups[0].shape[1]
        out_shape = shape_in[:d] + shape_in[d + 1:] + (n_out,)
        acc_h = jnp.moveaxis(acc_h.reshape(out_shape), -1, d)
        acc_l = jnp.moveaxis(acc_l.reshape(out_shape), -1, d)
        return acc_h, acc_l

    def _all_axes(self, u, restrict: bool):
        from .df64 import join_f64, split_f64

        xh, xl = split_f64(u)
        for d in range(self.fine.dim):
            xh, xl = self._axis_mm_pair(xh, xl, d, restrict)
        return join_f64(xh, xl)

    def prolongate(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        u = u_coarse
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0)
        uf = self._all_axes(u, restrict=False)
        if self.constrained:
            uf = jnp.where(self.fine_interior, uf, 0)
        return uf

    def restrict(self, u_fine: jnp.ndarray) -> jnp.ndarray:
        u = u_fine
        if self.constrained:
            u = jnp.where(self.fine_interior, u, 0)
        uc = self._all_axes(u, restrict=True)
        if self.constrained:
            uc = jnp.where(self.coarse_interior, uc, 0)
        return uc


class OzakiWindowedProlongate(OzakiMatmulTransfer):
    """dp FMG solution prolongation emitted straight into the fused dp
    kernel's windowed pair layout ``[Z, 2, Yp, G]``.

    The FMG per-level step (/root/reference/common/multigrid_solver.h:
    404-456) prolongates the dp solution, interior-masks it, and feeds it
    to the dp residual.  With the pair residual handoff (MGT_PAIR_FMG,
    PallasWindowedOzaki.residual_defect_win) that costs a join_f64 +
    where + split_f64 + node->window relayout roundtrip over the full
    fine grid between the transfer and the kernel.  This flavor removes
    all of it: the fine-interior mask is separable and absorbed into the
    per-axis banded factor rows (zeroed boundary rows, exact), and the
    x-axis factor is composed with the 0/1 window permutation
    (WindowedMatmulTransfer's trick, exact in f64 on the host — columns
    of the composed factor are copies of masked banded columns, so the
    exact-accumulation band bound is unchanged), so the third axis
    contraction EMITS window lanes and the (hi, lo) pair never leaves
    the pair representation.  Duplicate window slots get bit-identical
    values (identical composed columns) and pad slots exact zeros — the
    consistency invariants ``vmult_windowed`` assumes.

    Accuracy class: identical to :class:`OzakiMatmulTransfer` (same limb
    scheme, same factor values, one fewer f64 rounding at the node
    materialization it skips)."""

    def __init__(self, fine: DofGrid, coarse: DofGrid, win,
                 n_limbs: int | None = None):
        super().__init__(fine, coarse, jnp.float64, constrained=False,
                         n_limbs=n_limbs)
        assert fine.dim == 3
        assert (fine.shape[0], fine.shape[1]) == (win.Z, win.Y)
        self._win = win
        self._Yp = win.Yp
        mf = [np.asarray(a, np.float64) for a in self._fine_axes]
        Mm = [mf[d][:, None] * self._banded_axis_matrix(d)
              for d in range(3)]
        Pw, _ = win.xmap._mats()                        # [Xp, G] 0/1
        Ax = np.zeros((Mm[2].shape[1], win.Xp))         # [Xc, Xp]
        Ax[:, : fine.shape[2]] = Mm[2].T
        self._gpw = [
            _ozaki_band_groups(Mm[0].T, self._N_LIMBS, self._MAX_M),
            _ozaki_band_groups(Mm[1].T, self._N_LIMBS, self._MAX_M),
            _ozaki_band_groups(Ax @ np.asarray(Pw, np.float64),
                               self._N_LIMBS, self._MAX_M),
        ]

    def prolongate_win(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        """Coarse node grid (incl. boundary values — the inhomogeneous
        lift) -> interior-masked fine windowed pair [Z, 2, Yp, G]."""
        from .df64 import split_f64

        xh, xl = split_f64(u_coarse)
        for d in range(3):
            xh, xl = self._axis_mm_pair(xh, xl, d, restrict=False,
                                        grp=self._gpw[d])
        w = jnp.stack([xh, xl], axis=1)                 # [Z, 2, Y, G]
        return jnp.pad(
            w, ((0, 0), (0, 0), (0, self._Yp - w.shape[2]), (0, 0)))
