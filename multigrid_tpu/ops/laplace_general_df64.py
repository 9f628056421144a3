"""Double-float (f32-pair) general-geometry Laplace operator.

The dp counterpart of :class:`multigrid_tpu.ops.laplace_general.GeneralLaplace`
for the mapped multiblock (curved) meshes — poisson_shell's outer CG matvec
and FMG residuals (/root/reference/common/laplace_operator.h:493-522 driven
in double from /root/reference/common/multigrid_solver.h:516-619).  XLA's
f64 emulation makes the native-f64 ``GeneralLaplace`` ~100x slower than f32
on TPU (measured: 33 s best-of-3 CG at 1.6M shell dofs, ~1.2 s per dp
matvec); this class runs the whole sum-factorized pipeline in compensated
float32 pairs (:mod:`multigrid_tpu.ops.df64`, ~2^-45 relative accuracy —
ample for the reference's dp targets) and only the final segment-sum
scatter and the interface vectors are native f64.

Design notes (TPU-first):
- gathers of the (hi, lo) components are exact in any dtype;
- every 1-D basis contraction is an :func:`ops.df64.apply_1d_df64` sweep
  (VPU broadcast form — the contraction length is p+1, too small for MXU);
- the per-quad-point symmetric merged coefficient is carried as an exact
  (hi, lo) f32 pair; products use ``two_prod`` + first-order cross terms;
- the additive scatter joins each cell value to f64 FIRST (exact: hi and lo
  do not overlap) and segment-sums in f64, so the up-to-2^dim contributions
  per shared node accumulate without f32 rounding.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..mesh.mapped import GeneralGrid
from .df64 import (
    SplitMatrix,
    _dekker_split,
    apply_1d_df64,
    df64_add,
    quick_two_sum,
    split_f64,
)
from .laplace import sym_components, sym_index


def two_prod_masked(a, b):
    """Exact f32 product via the bitmask Dekker split — NO f64 anywhere.

    The f64-widening ``df64.two_prod`` is correct as written, but when its
    operands are jit ARGUMENTS XLA:CPU duplicates the defining
    ``convert_f32(mul_f64)`` into every consumer fusion and the emitter
    elides the narrowing convert there — the compensated sums downstream
    then cancel against the full-precision product and the error term
    comes out wrong by exactly the two_prod error (measured: traced-C
    vmult at 4e-8 rel while the constant-C program is 1e-14; an
    ``optimization_barrier`` does NOT survive the XLA:CPU pipeline).  The
    masked form is immune by construction: every partial product is a
    12-bit x 12-bit mantissa product, exact in f32, so FMA contraction
    and precision propagation cannot change any intermediate.
    """
    ahi, alo = _dekker_split(a)
    bhi, blo = _dekker_split(b)
    p = a * b
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def split_pair(C):
    """Exact (hi, lo) f32 pair of an f64 array (numpy or traced jnp)."""
    if isinstance(C, tuple):
        return C
    hi = C.astype(jnp.float32)
    lo = (C - hi.astype(C.dtype)).astype(jnp.float32)
    return hi, lo


class GeneralLaplaceDF64:
    """dp A·u on a mapped multiblock level in compensated float32 pairs.

    Same interface contract as ``GeneralLaplace(grid, float64)``: ``vmult``
    and ``vmult_residual`` take and return native float64 vectors with
    identity rows on Dirichlet nodes, and accept a coefficient override
    ``C`` (an (hi, lo) pair, or an f64 array split on the fly) so jitted
    solves can pass it as a pytree argument.
    """

    def __init__(self, grid: GeneralGrid, coef: Optional[np.ndarray] = None,
                 coef_fn=None):
        self.grid = grid
        b = grid.basis
        self.n = b.n
        self.dim = grid.dim
        self.S = SplitMatrix(b.S)
        self.St = SplitMatrix(b.S.T)
        self.D = SplitMatrix(b.D_col)
        self.Dt = SplitMatrix(b.D_col.T)
        if coef is None:
            coef = grid.merged_coefficient(coef_fn)
        if isinstance(coef, tuple):
            # pre-split device pair (hi, lo) — lets the solver ship ONE
            # f32 hi plane shared with the sp operator instead of
            # re-transferring ~600 MB per level at the 13M shell size
            self.C = coef
        else:
            shape = (grid.n_cells,) + (self.n,) * self.dim + (coef.shape[-1],)
            coef = np.asarray(coef, np.float64).reshape(shape)
            hi = coef.astype(np.float32)
            lo = (coef - hi.astype(np.float64)).astype(np.float32)
            self.C = (jnp.asarray(hi), jnp.asarray(lo))
        self.cell_nodes = jnp.asarray(grid.cell_nodes)
        self.interior = jnp.asarray(~grid.boundary)
        self.n_dofs = grid.n_dofs

    # ------------------------------------------------------------- helpers
    def _gather(self, u):
        w = jnp.take(u, self.cell_nodes, axis=0)
        return w.reshape((self.grid.n_cells,) + (self.n,) * self.dim)

    def _scatter_add_f64(self, yh, yl):
        """join-first f64 segment sum: the join is exact, the shared-node
        accumulation then rounds only at f64."""
        y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
        return jnp.zeros(self.n_dofs, jnp.float64).at[
            self.cell_nodes.reshape(-1)
        ].add(y.reshape(-1))

    def _sweep_all(self, h, l, M: SplitMatrix):
        for d in range(self.dim):
            h, l = apply_1d_df64(h, l, M, 1 + d)
        return h, l

    def _quad_op(self, g, Cp):
        """out[a] = sum_b C[..., sym(a,b)] * g[b] in df64."""
        Chi, Clo = Cp
        dim = self.dim
        out = []
        for a in range(dim):
            sh = sl = None
            for b_ in range(dim):
                s = sym_index(dim, a, b_)
                ch = Chi[..., s]
                cl = Clo[..., s]
                gh, gl = g[b_]
                p, e = two_prod_masked(gh, ch)
                e = e + (gh * cl + gl * ch)
                if sh is None:
                    sh, sl = quick_two_sum(p, e)
                else:
                    sh, sl = df64_add(sh, sl, p, e)
            out.append((sh, sl))
        return out

    def apply_cells_pair(self, xh, xl, Cp):
        uh, ul = self._sweep_all(self._gather(xh), self._gather(xl), self.S)
        g = [apply_1d_df64(uh, ul, self.D, 1 + d) for d in range(self.dim)]
        q = self._quad_op(g, Cp)
        acc = apply_1d_df64(q[0][0], q[0][1], self.Dt, 1)
        for d in range(1, self.dim):
            t = apply_1d_df64(q[d][0], q[d][1], self.Dt, 1 + d)
            acc = df64_add(acc[0], acc[1], t[0], t[1])
        yh, yl = self._sweep_all(acc[0], acc[1], self.St)
        return yh, yl

    # --------------------------------------------------------------- vmult
    def vmult(self, src: jnp.ndarray, C=None) -> jnp.ndarray:
        Cp = self.C if C is None else split_pair(C)
        xm = jnp.where(self.interior, src, 0.0)
        xh, xl = split_f64(xm)
        y = self._scatter_add_f64(*self.apply_cells_pair(xh, xl, Cp))
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs: jnp.ndarray, lhs: jnp.ndarray,
                       C=None) -> jnp.ndarray:
        Cp = self.C if C is None else split_pair(C)
        xm = jnp.where(self.interior, lhs, 0.0)
        xh, xl = split_f64(xm)
        y = self._scatter_add_f64(*self.apply_cells_pair(xh, xl, Cp))
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    # ------------------------------------------------------------ diagonal
    def inverse_diagonal(self, C=None) -> jnp.ndarray:
        """Closed-form operator diagonal in df64 pairs, f64 out — the dp
        twin of ``GeneralLaplace.inverse_diagonal`` (setup-only; the f64
        form runs in XLA's emulated f64 on TPU)."""
        Cp = self.C if C is None else split_pair(C)
        Chi, Clo = Cp
        b = self.grid.basis
        dh = dl = None
        for s_, (a, bb) in enumerate(sym_components(self.dim)):
            f = 1.0 if a == bb else 2.0
            th, tl = Chi[..., s_] * f, Clo[..., s_] * f
            for e in range(self.dim):
                Ta = b.D_col @ b.S if a == e else b.S
                Tb = b.D_col @ b.S if bb == e else b.S
                th, tl = apply_1d_df64(
                    th, tl, SplitMatrix(np.asarray(Ta * Tb).T), 1 + e)
            if dh is None:
                dh, dl = th, tl
            else:
                dh, dl = df64_add(dh, dl, th, tl)
        diag = self._scatter_add_f64(dh, dl)
        diag = jnp.where(self.interior, diag, 1.0)
        return 1.0 / diag
