"""Dense-element-matrix Laplace apply: the MXU-native fast path.

For an affine cell with constant coefficient, the matrix-free quadrature
operator is EXACTLY the (p+1)^dim x (p+1)^dim element stiffness matrix
``K = sum_d c_d * kron(..., L_d, ..., M_e, ...)`` (the (p+1)-point Gauss rule
integrates the degree<=2p integrands exactly).  At p=4 in 3-D, K is 125x125 —
a single MXU tile — so the whole operator application is ONE batched matmul
``[cells, 125] @ [125, 125]`` plus the window gather/scatter.  This replaces
the reference's sum-factorized even-odd sweeps
(/root/reference/common/matrix_vector_kernel.h) with the arrangement the MXU
actually wants; measured 2x faster than the einsum sum-factorization at p=4
and far ahead of the CPU reference.

Two precisions:

* ``DenseLaplaceF32``: plain f32 matmul (the smoother/sp path,
  counterpart of the reference's float V-cycle operator);
* ``DenseLaplaceOzaki``: full fp64-accuracy dp apply via the Ozaki
  splitting — both operands are decomposed into 7-bit-mantissa limbs so
  every bf16xbf16 product is exact and the f32 MXU accumulation over the
  (up to ~1000-term) contraction stays exact; limb pairs are grouped by
  total scale into one matmul per group.  This is the "double-double via
  MXU" plan of SURVEY.md §7 (hard part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.brick import DofGrid
from .df64 import df64_add, join_f64, split_f64, two_sum
from .laplace import DiagCoef, make_diag_coef
from .masks import bcast_and, interior_axes_jnp
from .windows import gather_cells, scatter_cells
from .laplace_df64 import scatter_cells_df64


def element_matrix(grid: DofGrid, coef: DiagCoef | None = None) -> np.ndarray:
    """Exact element stiffness for the affine brick cell (fp64)."""
    coef = coef if coef is not None else make_diag_coef(grid)
    b = grid.basis
    dim = grid.dim
    K = None
    for d in range(dim):
        mat = np.array([[1.0]])
        for e in range(dim):
            mat = np.kron(mat, b.L if e == d else b.M)
        term = coef.values[d] * mat
        K = term if K is None else K + term
    return K


class _DenseBase:
    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None):
        self.grid = grid
        self.dim = grid.dim
        self.n = grid.basis.n
        self.N = self.n**self.dim
        self.cells = grid.cells
        self.K = element_matrix(grid, coef)
        self._interior_axes = interior_axes_jnp(grid)
        dim = self.dim
        # interleaved [C0,n,C1,n,...] <-> flat [C, N] permutations
        self._to_flat = tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
        self._from_flat = tuple(np.argsort(self._to_flat))

    @property
    def interior(self):
        """Interior mask rebuilt from 1-D factors at trace time (a full
        materialized mask would bloat every jit payload by O(N))."""
        return bcast_and(self._interior_axes)

    def _gather_flat(self, x):
        w = gather_cells(x, self.n)
        return w.transpose(self._to_flat).reshape(-1, self.N)

    def _scatter_flat(self, y):
        dim = self.dim
        w = y.reshape(self.cells + (self.n,) * dim).transpose(self._from_flat)
        return scatter_cells(w, self.n)


class DenseLaplaceF32(_DenseBase):
    """sp A·u as one batched MXU matmul per apply."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None):
        super().__init__(grid, coef)
        self.K32 = jnp.asarray(self.K.T, jnp.float32)  # y = u @ K^T, K sym

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        xm = jnp.where(self.interior, src, 0)
        u = self._gather_flat(xm)
        y = jnp.dot(u, self.K32, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        out = self._scatter_flat(y)
        return jnp.where(self.interior, out, src)

    def vmult_residual(self, rhs, lhs):
        xm = jnp.where(self.interior, lhs, 0)
        u = self._gather_flat(xm)
        y = jnp.dot(u, self.K32, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        out = self._scatter_flat(y)
        return jnp.where(self.interior, rhs - out, rhs - lhs)


class DenseLaplaceF32Chunked(DenseLaplaceF32):
    """sp A·u chunked by z-cell layer (lax.map): per-layer working sets stay
    on-chip — 3.7 GDoF/s at 135M dofs on one v5e (2.5x the monolithic
    whole-grid variant and the CPU reference)."""

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        assert self.dim == 3
        p = self.grid.degree
        n = self.n
        cz, cy, cx = self.cells
        Z, Y, X = self.grid.shape
        xm = jnp.where(self.interior, src, 0).astype(jnp.float32)

        def window_yx(s):
            a = s[:, : Y - 1, :].reshape(n, cy, p, X)
            b = s[:, 1:, :].reshape(n, cy, p, X)[:, :, p - 1 : p, :]
            w = jnp.concatenate([a, b], axis=2)
            a = w[..., : X - 1].reshape(n, cy, n, cx, p)
            b = w[..., 1:].reshape(n, cy, n, cx, p)[..., p - 1 : p]
            w = jnp.concatenate([a, b], axis=4)
            return w.transpose(1, 3, 0, 2, 4).reshape(cy * cx, self.N)

        def unwindow_yx(y):
            w = y.reshape(cy, cx, n, n, n).transpose(2, 0, 3, 1, 4)
            main = w[..., :p].reshape(n, cy, n, cx * p)
            tail = jnp.concatenate(
                [jnp.zeros((n, cy, n, cx, p - 1), w.dtype), w[..., p:]], axis=4
            ).reshape(n, cy, n, cx * p)
            sx = (jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, 1)))
                  + jnp.pad(tail, ((0, 0), (0, 0), (0, 0), (1, 0))))
            main = sx[:, :, :p, :].reshape(n, cy * p, X)
            tail = jnp.concatenate(
                [jnp.zeros((n, cy, p - 1, X), sx.dtype), sx[:, :, p:, :]], axis=2
            ).reshape(n, cy * p, X)
            return (jnp.pad(main, ((0, 0), (0, 1), (0, 0)))
                    + jnp.pad(tail, ((0, 0), (1, 0), (0, 0))))

        def body(zi):
            s = jax.lax.dynamic_slice_in_dim(xm, zi * p, n, axis=0)
            y = jnp.dot(window_yx(s), self.K32,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            return unwindow_yx(y)

        slabs = jax.lax.map(body, jnp.arange(cz))
        main = slabs[:, :p].reshape(cz * p, Y, X)
        tail = jnp.concatenate(
            [jnp.zeros((cz, p - 1, Y, X), jnp.float32), slabs[:, p:]], axis=1
        ).reshape(cz * p, Y, X)
        out = (jnp.pad(main, ((1 - 1, 1), (0, 0), (0, 0)))
               + jnp.pad(tail, ((1, 0), (0, 0), (0, 0))))
        return jnp.where(self.interior, out, src.astype(jnp.float32))

    def vmult_residual(self, rhs, lhs):
        y = self.vmult(jnp.where(self.interior, lhs, 0))
        y = jnp.where(self.interior, y, 0)
        return jnp.where(self.interior, rhs - y, rhs - lhs)


# ------------------------------------------------------------------ Ozaki
_LIMB_BITS = 7        # 2*7 + log2(7*125) < 24: f32 accumulation stays exact
_N_LIMBS = 7          # 7*7 = 49 bits of mantissa coverage per operand
_MAX_M = 6            # pairs with k+l <= 6: measured rel error ~2e-15.
# 6 limbs / max_m 5 (42 bits, 4e-12) was ~25% faster but its operator
# inexactness amplified through A^{-1} to an L2-error floor of ~1e-9 in the
# converged CG solutions — visible against the reference transcript above
# 33M dofs (df64 A/B at 33M: 4.3508e-9 == ref 4.351e-9; 6-limb: 4.419e-9).


def _split_limbs_f64(K: np.ndarray, n_limbs: int, limb_bits: int = _LIMB_BITS):
    """Host-side exact limb split of an f64 matrix: K = sigma * sum 2^{-bk} L_k
    with L_k holding b-bit-mantissa values exactly representable in bf16
    (b = ``limb_bits`` <= 8; default 7 for the dp operators, 8 for the sp
    windowed kernel, ops/pallas_windowed_sp.py)."""
    sigma = 2.0 ** np.ceil(np.log2(np.abs(K).max()))
    r = K / sigma
    limbs = []
    for k in range(n_limbs):
        scale = 2.0 ** (limb_bits * (k + 1))
        chopped = np.round(r * scale) / scale
        # keep limb magnitudes < 2^{-bk}: representable with b-bit mantissa
        limbs.append((chopped * 2.0 ** (limb_bits * k)).astype(np.float32))
        r = r - chopped
    return sigma, limbs


class DenseLaplaceOzaki(_DenseBase):
    """dp A·u with fp64-level accuracy from exact bf16 MXU matmuls.

    Pipeline: split f64 input into an f32 pair; gather to cell layout;
    per-cell power-of-2 scaling; extract 7-bit limbs; one bf16 matmul per
    scale group m (contraction over all pairs k+l = m at once); compensated
    recombination; compensated window scatter.
    """

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None,
                 n_limbs: int = _N_LIMBS, max_m: int = _MAX_M):
        super().__init__(grid, coef)
        # exact-f32-accumulation certification: every bf16 limb product has
        # a 2*_LIMB_BITS-bit mantissa, and the largest scale-group matmul
        # contracts (max_m+1)*N such terms; the sum stays exactly
        # representable in f32 only while 2*_LIMB_BITS + log2 terms < 24.
        # Beyond that (degree >= 5 in 3-D) dp accuracy would degrade
        # unannounced — callers must pick the df64 path instead.
        if (max_m + 1) * self.N >= 2 ** (24 - 2 * _LIMB_BITS):
            raise ValueError(
                f"Ozaki exact-accumulation bound violated: "
                f"({max_m + 1})*{self.N} >= 2^{24 - 2 * _LIMB_BITS}; "
                "use the df64 dp operator for this element size")
        self.n_limbs = n_limbs
        self.max_m = max_m
        sigma, limbs = _split_limbs_f64(self.K.T, n_limbs)
        self.sigma_K = sigma
        # TRIANGULAR group matmuls: scale group m contracts input-limb
        # prefix l = 0..m against K-limbs k = m-l in one MXU pass of
        # exactly (m+1)N x N — sum of block-products over all groups is
        # sum(m+1) = 28 for 7 limbs, vs 49 for the padded square block
        # matrix (which spent 43% of its MACs on structural zeros)
        N = self.N
        self.K_groups = [
            jnp.asarray(
                np.vstack([limbs[m - l] for l in range(m + 1)]), jnp.bfloat16
            )
            for m in range(max_m + 1)
        ]

    def _limb_split_device(self, uh, ul):
        """Per-cell scaled 7-bit limb extraction from an f32 pair [C, N]."""
        s = jnp.max(jnp.abs(uh), axis=1, keepdims=True)
        from .laplace_general_mxu import pow2_ceil_f32

        # exact power-of-2 scale (f32 exp2 is inexact on integer args —
        # CLAUDE.md exp2 note; migrated r5 from exp2(ceil(log2)))
        sigma = pow2_ceil_f32(jnp.maximum(s, 1e-30))
        sigma = jnp.where(s > 0, sigma, 1.0)
        rh = uh / sigma
        rl = ul / sigma
        limbs = []
        for k in range(self.n_limbs):
            scale = np.float32(2.0 ** (_LIMB_BITS * (k + 1)))
            inv = np.float32(2.0 ** (-_LIMB_BITS * (k + 1)))
            chopped = jnp.round(rh * scale) * inv
            rh = rh - chopped  # exact (aligned grids)
            rh, rl = two_sum(rh, rl)
            limbs.append((chopped * np.float32(2.0 ** (_LIMB_BITS * k))).astype(jnp.bfloat16))
        return sigma, limbs

    def _apply_flat(self, uh, ul):
        """[C,N] f32 pair -> [C,N] df64 pair of A_cell @ u."""
        sigma, limbs = self._limb_split_device(uh, ul)
        packed = jnp.concatenate(limbs, axis=1)          # [C, n_limbs*N]
        acc_h = acc_l = None
        N = self.N
        for m in range(self.max_m + 1):
            # group m: input-limb prefix against the stacked K-limbs (see
            # __init__); f32 accumulation stays exact per group
            Ym = jnp.dot(packed[:, : (m + 1) * N], self.K_groups[m],
                         preferred_element_type=jnp.float32)
            # stored limbs carry 2^{7k}/2^{7l}; the true pair scale is 2^{-7m};
            # scale by exact powers of two (per-cell sigma and group scale)
            delta = np.float32(self.sigma_K * 2.0 ** (-_LIMB_BITS * m))
            term = Ym * delta * sigma
            if acc_h is None:
                acc_h, acc_l = term, jnp.zeros_like(term)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, term, jnp.zeros_like(term))
        return acc_h, acc_l

    def apply_cells_df64(self, xh, xl):
        uh = self._gather_flat(xh)
        ul = self._gather_flat(xl)
        yh, yl = self._apply_flat(uh, ul)
        dim = self.dim
        wh = yh.reshape(self.cells + (self.n,) * dim).transpose(self._from_flat)
        wl = yl.reshape(self.cells + (self.n,) * dim).transpose(self._from_flat)
        return scatter_cells_df64(wh, wl)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        xm = jnp.where(self.interior, src, 0)
        xh, xl = split_f64(xm)
        yh, yl = self.apply_cells_df64(xh, xl)
        return jnp.where(self.interior, join_f64(yh, yl), src)

    def vmult_residual(self, rhs, lhs):
        xm = jnp.where(self.interior, lhs, 0)
        xh, xl = split_f64(xm)
        yh, yl = self.apply_cells_df64(xh, xl)
        return jnp.where(self.interior, rhs - join_f64(yh, yl), rhs - lhs)


class DenseLaplaceOzakiChunked(DenseLaplaceOzaki):
    """Memory-lean Ozaki apply: a ``lax.map`` over z-cell layers so only one
    layer's intermediates (windows, limbs, matmul result) are live at a
    time — required for the 135M-dof flagship case on a 16GB chip (the
    whole-grid variant materializes ~10GB of glue).  Same math, same
    accuracy; the z-direction overlap is resolved by a compensated
    shifted add over the per-layer output slabs."""

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        assert self.dim == 3
        p = self.grid.degree
        n = self.n
        cz, cy, cx = self.cells
        Z, Y, X = self.grid.shape
        xm = jnp.where(self.interior, src, 0)
        xh, xl = split_f64(xm)

        def window_yx(s):
            # [n, Y, X] -> [cy*cx, n^3]
            a = s[:, : Y - 1, :].reshape(n, cy, p, X)
            b_ = s[:, 1:, :].reshape(n, cy, p, X)[:, :, p - 1 : p, :]
            w = jnp.concatenate([a, b_], axis=2)          # [n, cy, n, X]
            a = w[..., : X - 1].reshape(n, cy, n, cx, p)
            b_ = w[..., 1:].reshape(n, cy, n, cx, p)[..., p - 1 : p]
            w = jnp.concatenate([a, b_], axis=4)          # [n, cy, n, cx, n]
            return w.transpose(1, 3, 0, 2, 4).reshape(cy * cx, self.N)

        from .laplace_df64 import scatter_cells_df64

        # scatter_cells_df64 expects [C0,n0,C1,n1,C2,n2]; per layer we have
        # one z-cell, so feed [1, n, cy, n, cx, n] and get back [n, Y, X]
        def body2(zi):
            sh = jax.lax.dynamic_slice_in_dim(xh, zi * p, n, axis=0)
            sl_ = jax.lax.dynamic_slice_in_dim(xl, zi * p, n, axis=0)
            uh = window_yx(sh)
            ul = window_yx(sl_)
            yh, yl = self._apply_flat(uh, ul)
            wh = yh.reshape(1, cy, cx, n, n, n).transpose(0, 3, 1, 4, 2, 5)
            wl = yl.reshape(1, cy, cx, n, n, n).transpose(0, 3, 1, 4, 2, 5)
            oh, ol = scatter_cells_df64(wh, wl)
            return oh, ol

        slabs_h, slabs_l = jax.lax.map(body2, jnp.arange(cz))
        # z-overlap compensated add (layer zi covers planes [zi*p, zi*p+p])
        mh = slabs_h[:, :p].reshape(cz * p, Y, X)
        ml_ = slabs_l[:, :p].reshape(cz * p, Y, X)
        th = jnp.concatenate(
            [jnp.zeros((cz, p - 1, Y, X), jnp.float32), slabs_h[:, p:]], axis=1
        ).reshape(cz * p, Y, X)
        tl = jnp.concatenate(
            [jnp.zeros((cz, p - 1, Y, X), jnp.float32), slabs_l[:, p:]], axis=1
        ).reshape(cz * p, Y, X)
        pad_t = ((0, 1), (0, 0), (0, 0))
        pad_h = ((1, 0), (0, 0), (0, 0))
        yh, yl = df64_add(
            jnp.pad(mh, pad_t), jnp.pad(ml_, pad_t),
            jnp.pad(th, pad_h), jnp.pad(tl, pad_h),
        )
        return jnp.where(self.interior, join_f64(yh, yl), src)

    def vmult_residual(self, rhs, lhs):
        y = self.vmult(jnp.where(self.interior, lhs, 0))
        y = jnp.where(self.interior, y, 0)
        return jnp.where(self.interior, rhs - y, rhs - lhs)
