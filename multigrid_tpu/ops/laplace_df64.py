"""Double-float (f32-pair) FE_Q Laplace operator for the dp outer iteration.

Same pipeline as :class:`multigrid_tpu.ops.laplace.LaplaceOperator`
(/root/reference/common/laplace_operator.h:527-558) but every contraction is
a compensated df64 sweep (:mod:`multigrid_tpu.ops.df64`).  Interface takes
and returns native float64 arrays so the surrounding solver code (CG vector
updates, norms) is unchanged — only the HBM-heavy operator pipeline avoids
XLA's slow f64 emulation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh.brick import DofGrid
from .df64 import (
    SplitMatrix,
    apply_1d_df64,
    df64_add,
    join_f64,
    quick_two_sum,
    split_f64,
    two_prod,
)
from .laplace import DiagCoef, make_diag_coef
from .windows import gather_cells, scatter_cells
from .masks import bcast_and, interior_axes_jnp


class SplitConst:
    """Pre-split exact f64 constant array for df64 elementwise multiply."""

    def __init__(self, c: np.ndarray):
        c = np.asarray(c, np.float64)
        hi = c.astype(np.float32)
        lo = (c - hi.astype(np.float64)).astype(np.float32)
        from .df64 import _mask_split_np

        hhi, hlo = _mask_split_np(np.ascontiguousarray(hi))
        self.hi = jnp.asarray(hi)
        self.lo = jnp.asarray(lo)
        self.hi_split = (jnp.asarray(hhi), jnp.asarray(hlo))


def df64_mul_const(xh, xl, c: SplitConst):
    p, e = two_prod(xh, c.hi, bhi=c.hi_split[0], blo=c.hi_split[1])
    e = e + (xh * c.lo + xl * c.hi)
    return quick_two_sum(p, e)


def _scatter_axis_df64(yh, yl, axis):
    """Compensated version of windows.scatter_axis: overlapping window
    columns are summed with two_sum so the hi-part additions do not round
    (corner dofs receive up to 2^dim contributions)."""
    pre = yh.shape[:axis]
    n_cells = yh.shape[axis]
    window = yh.shape[axis + 1]
    post = yh.shape[axis + 2 :]
    s = window - 1

    def slc(a, lo, hi_):
        idx = [slice(None)] * a.ndim
        idx[axis + 1] = slice(lo, hi_)
        return a[tuple(idx)]

    def parts(y):
        main = slc(y, 0, s).reshape(pre + (n_cells * s,) + post)
        lastcol = slc(y, s, s + 1)
        zeros = jnp.zeros(pre + (n_cells, s - 1) + post, dtype=y.dtype)
        tail = jnp.concatenate([zeros, lastcol], axis=axis + 1).reshape(
            pre + (n_cells * s,) + post
        )
        pad_t = [(0, 0)] * main.ndim
        pad_t[axis] = (0, 1)
        pad_h = [(0, 0)] * main.ndim
        pad_h[axis] = (1, 0)
        return jnp.pad(main, pad_t), jnp.pad(tail, pad_h)

    mh, th = parts(yh)
    ml, tl = parts(yl)
    return df64_add(mh, ml, th, tl)


def scatter_cells_df64(yh, yl):
    dim = yh.ndim // 2
    for d in range(dim):
        yh, yl = _scatter_axis_df64(yh, yl, d)
    return yh, yl


class LaplaceOperatorDF64:
    """dp A·u on a structured brick level in compensated float32 pairs."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None):
        self.grid = grid
        b = grid.basis
        self.n = b.n
        self.dim = grid.dim
        self.S = SplitMatrix(b.S)
        self.St = SplitMatrix(b.S.T)
        self.D = SplitMatrix(b.D_col)
        self.Dt = SplitMatrix(b.D_col.T)
        coef = coef if coef is not None else make_diag_coef(grid)
        qw = b.quad_weights
        w3 = np.ones([1] * (2 * self.dim))
        for d in range(self.dim):
            shape = [1] * (2 * self.dim)
            shape[2 * d + 1] = self.n
            w3 = w3 * qw.reshape(shape)
        self.cw = [SplitConst(coef.values[d] * w3) for d in range(self.dim)]
        self._interior_axes = interior_axes_jnp(grid)

    @property
    def interior(self):
        return bcast_and(self._interior_axes)

    def _sweep_all(self, h, l, M: SplitMatrix):
        for d in range(self.dim):
            h, l = apply_1d_df64(h, l, M, 2 * d + 1)
        return h, l

    def apply_cells_df64(self, xh, xl):
        n = self.n
        wh, wl = gather_cells(xh, n), gather_cells(xl, n)
        uh, ul = self._sweep_all(wh, wl, self.S)
        acc = None
        for d in range(self.dim):
            gh, gl = apply_1d_df64(uh, ul, self.D, 2 * d + 1)
            gh, gl = df64_mul_const(gh, gl, self.cw[d])
            th, tl = apply_1d_df64(gh, gl, self.Dt, 2 * d + 1)
            acc = (th, tl) if acc is None else df64_add(acc[0], acc[1], th, tl)
        yh, yl = self._sweep_all(acc[0], acc[1], self.St)
        return scatter_cells_df64(yh, yl)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """f64 -> f64, identity rows on Dirichlet nodes
        (/root/reference/common/laplace_operator.h:573-601)."""
        xm = jnp.where(self.interior, src, 0)
        xh, xl = split_f64(xm)
        yh, yl = self.apply_cells_df64(xh, xl)
        y = join_f64(yh, yl)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs: jnp.ndarray, lhs: jnp.ndarray) -> jnp.ndarray:
        xm = jnp.where(self.interior, lhs, 0)
        xh, xl = split_f64(xm)
        yh, yl = self.apply_cells_df64(xh, xl)
        y = join_f64(yh, yl)
        return jnp.where(self.interior, rhs - y, rhs - lhs)
