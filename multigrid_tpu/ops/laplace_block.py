"""Block-padded general-geometry operators: the scatter-free curved path.

Hardware finding (docs/tpu_r4/general_gate.log, 2026-08-20): the
gather/segment-sum general operators are SCATTER-BOUND on TPU — at 1.6M
shell dofs the sp einsum matvec costs 77 ms and the Ozaki dp form 309 ms
(0.005 GDoF/s, vs 3.6 on the brick path), with the 24.6M-element XLA
scatter-add dominating both.  Mapped multiblock meshes are logically
STRUCTURED per block, so the TPU-first layout is the block-padded
("bp") vector (mesh/mapped.BlockLayout): per-block node lattices
concatenated, seam nodes stored once per block — cell localization then
becomes the same reshape-based window ops as the brick path
(ops/windows, zero scatter primitives) and only an O(surface)
duplicate-sum (sorted segment_sum) remains index-based.

This is the exact design stance of the brick flagship (windowed pair
layout with duplicated cell boundaries), applied at the block level.
Reference counterpart: the per-rank partitioned vectors + ghost dofs of
deal.II's Partitioner (/root/reference/common/laplace_operator.h:56-164
operating on ghosted vectors); here the "ghosts" are the seam copies and
the continuity fix-up is the seam sum.

Interface contract: all vectors are CONSISTENT bp arrays [M]
(every copy of a shared dof holds the same value); ``vmult`` keeps
identity rows on the Dirichlet boundary exactly like the flat-path
operators.  Inner products must use ``BlockLayout.weights``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.mapped import BlockLayout, GeneralGrid
from .df64 import df64_add, join_f64, split_f64, sum_f64
from .laplace import sym_index
from .laplace_df64 import scatter_cells_df64
from .laplace_general_df64 import GeneralLaplaceDF64
from .laplace_general_mxu import OzakiMatmul, build_grad_matrices
from .windows import gather_cells, scatter_cells


def _perms(dim: int):
    to_flat = tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
    return to_flat, tuple(np.argsort(to_flat))


class _BlockBase:
    def __init__(self, grid: GeneralGrid, coef=None, coef_fn=None):
        self.grid = grid
        self.layout: BlockLayout = grid.block_layout()
        self.dim = grid.dim
        self.n = grid.basis.n
        self.N = self.n ** self.dim
        self._to_flat, self._from_flat = _perms(self.dim)
        if coef is None:
            coef = grid.merged_coefficient(coef_fn)
        self._set_coef(coef)
        self.interior = jnp.asarray(self.layout.interior)
        Gd = build_grad_matrices(grid.basis, self.dim)
        self.Gd = Gd

    def _cells_of_block(self, arr, bi):
        """Slice a [n_cells, ...]-leading array to block bi's cells."""
        o = self.layout.cell_offsets
        return arr[o[bi]:o[bi + 1]]

    def _n_cells_b(self, bi):
        o = self.layout.cell_offsets
        return o[bi + 1] - o[bi]

    def _gather_block(self, x, bi):
        """bp vector slice -> [C_b, N] cell-flat (reshape-only)."""
        o = self.layout.offsets[bi]
        shp = self.layout.node_shapes[bi]
        xb = jax.lax.dynamic_slice_in_dim(
            x, o, int(np.prod(shp)), axis=0).reshape(shp)
        w = gather_cells(xb, self.n)
        return w.transpose(self._to_flat).reshape(-1, self.N)

    def _scatter_block(self, y, bi):
        """[C_b, N] -> bp block slice (additive window scatter)."""
        cells = self.grid.block_cells[bi]
        w = y.reshape(tuple(cells) + (self.n,) * self.dim).transpose(
            self._from_flat)
        return scatter_cells(w, self.n).reshape(-1)


class BlockGeneralMXU(_BlockBase):
    """f32 general A·u on block-padded vectors (smoother path)."""

    def __init__(self, grid: GeneralGrid, dtype=jnp.float32, coef=None,
                 coef_fn=None):
        self.dtype = dtype
        super().__init__(grid, coef, coef_fn)
        Gf = np.hstack([G.T for G in self.Gd])
        self.Gf = jnp.asarray(Gf, dtype)
        self.Gb = jnp.asarray(Gf.T, dtype)

    def _set_coef(self, coef):
        if isinstance(coef, jnp.ndarray):
            self.C = coef
        else:
            shape = (self.grid.n_cells,) + (self.grid.n,) * self.grid.dim \
                + (coef.shape[-1],)
            self.C = jnp.asarray(np.asarray(coef).reshape(shape), self.dtype)

    def apply_blocks(self, x, C=None):
        C = self.C if C is None else C
        dim, N = self.dim, self.N
        parts = []
        for bi in range(len(self.layout.node_shapes)):
            u = self._gather_block(x, bi)
            g = jnp.dot(u, self.Gf, preferred_element_type=self.dtype,
                        precision=jax.lax.Precision.HIGHEST)
            nc = u.shape[0]
            g = g.reshape(nc, dim, N)
            Cq = self._cells_of_block(C, bi).reshape(nc, N, -1)
            t = []
            for a in range(dim):
                acc = None
                for b_ in range(dim):
                    term = Cq[..., sym_index(dim, a, b_)] * g[:, b_, :]
                    acc = term if acc is None else acc + term
                t.append(acc)
            t = jnp.stack(t, axis=1).reshape(nc, dim * N)
            y = jnp.dot(t, self.Gb, preferred_element_type=self.dtype,
                        precision=jax.lax.Precision.HIGHEST)
            parts.append(self._scatter_block(y, bi))
        return self.layout.seam_sum(
            self.layout.pad_tail(jnp.concatenate(parts)))

    def vmult(self, src, C=None):
        xm = jnp.where(self.interior, src, 0)
        y = self.apply_blocks(xm, C)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs, lhs, C=None):
        xm = jnp.where(self.interior, lhs, 0)
        y = self.apply_blocks(xm, C)
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    def inverse_diagonal(self, C=None):
        """Closed-form diagonal (ops/laplace_general.inverse_diagonal) on
        the bp layout: per-block window scatter + seam sum."""
        from .laplace import apply_1d, sym_components

        C = self.C if C is None else C
        b = self.grid.basis
        dim = self.dim
        comps = sym_components(dim)
        diag_cells = None
        for s, (a, bb) in enumerate(comps):
            term = C[..., s] * (1.0 if a == bb else 2.0)
            for e in range(dim):
                Ta = b.D_col @ b.S if a == e else b.S
                Tb = b.D_col @ b.S if bb == e else b.S
                F = jnp.asarray(np.asarray(Ta * Tb), self.dtype)
                term = apply_1d(term, F.T, 1 + e,
                                precision=jax.lax.Precision.HIGHEST)
            diag_cells = term if diag_cells is None else diag_cells + term
        diag_cells = diag_cells.reshape(self.grid.n_cells, self.N)
        parts = [self._scatter_block(self._cells_of_block(diag_cells, bi), bi)
                 for bi in range(len(self.layout.node_shapes))]
        diag = self.layout.seam_sum(
            self.layout.pad_tail(jnp.concatenate(parts)))
        diag = jnp.where(self.interior, diag, 1.0)
        return 1.0 / diag


class BlockGeneralOzaki(_BlockBase):
    """dp general A·u on block-padded f64 vectors via Ozaki MXU limbs."""

    def __init__(self, grid: GeneralGrid, coef=None, coef_fn=None):
        super().__init__(grid, coef, coef_fn)
        self._fwd = OzakiMatmul(np.hstack([G.T for G in self.Gd]))
        self._bwd = [OzakiMatmul(G) for G in self.Gd]

    def _set_coef(self, coef):
        if isinstance(coef, tuple):
            self.C = coef
        else:
            shape = (self.grid.n_cells,) + (self.grid.n,) * self.grid.dim \
                + (coef.shape[-1],)
            c = np.asarray(coef, np.float64).reshape(shape)
            hi = c.astype(np.float32)
            self.C = (jnp.asarray(hi),
                      jnp.asarray((c - hi.astype(np.float64)
                                   ).astype(np.float32)))

    def _apply_block_pair(self, xh, xl, bi, Cp):
        dim, N = self.dim, self.N
        uh = self._gather_block(xh, bi)
        ul = self._gather_block(xl, bi)
        nc = uh.shape[0]
        gh, gl = self._fwd.apply(uh, ul)
        Chi, Clo = Cp
        Cb = (self._cells_of_block(Chi, bi).reshape(nc, N, -1),
              self._cells_of_block(Clo, bi).reshape(nc, N, -1))
        g = [(gh[:, b_ * N:(b_ + 1) * N], gl[:, b_ * N:(b_ + 1) * N])
             for b_ in range(dim)]
        # _quad_op indexes C[..., s] against g[b] elementwise: feed
        # [nc, N]-shaped planes with the [nc, N, 6] coefficient
        q = GeneralLaplaceDF64._quad_op(self, g, Cb)
        acc = None
        for d in range(dim):
            th, tl = self._bwd[d].apply(q[d][0], q[d][1])
            acc = (th, tl) if acc is None else df64_add(acc[0], acc[1],
                                                        th, tl)
        return acc

    def _scatter_block_pair(self, yh, yl, bi):
        cells = self.grid.block_cells[bi]
        shape = tuple(cells) + (self.n,) * self.dim
        wh = yh.reshape(shape).transpose(self._from_flat)
        wl = yl.reshape(shape).transpose(self._from_flat)
        oh, ol = scatter_cells_df64(wh, wl)
        return join_f64(oh, ol).reshape(-1)

    def apply_blocks_f64(self, x, Cp=None):
        Cp = self.C if Cp is None else Cp
        xh, xl = split_f64(x)
        parts = []
        for bi in range(len(self.layout.node_shapes)):
            yh, yl = self._apply_block_pair(xh, xl, bi, Cp)
            parts.append(self._scatter_block_pair(yh, yl, bi))
        return self.layout.seam_sum(
            self.layout.pad_tail(jnp.concatenate(parts)))

    def vmult(self, src, C=None):
        from .laplace_general_df64 import split_pair

        Cp = self.C if C is None else split_pair(C)
        xm = jnp.where(self.interior, src, 0.0)
        y = self.apply_blocks_f64(xm, Cp)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs, lhs, C=None):
        from .laplace_general_df64 import split_pair

        Cp = self.C if C is None else split_pair(C)
        xm = jnp.where(self.interior, lhs, 0.0)
        y = self.apply_blocks_f64(xm, Cp)
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    def inverse_diagonal(self, C=None):
        """df64-accurate diagonal on the bp layout (pure-double smoother
        preconditioner) — the GeneralLaplaceDF64.inverse_diagonal formula
        with block window scatters in place of the segment-sum."""
        from .df64 import SplitMatrix, apply_1d_df64
        from .laplace import sym_components
        from .laplace_general_df64 import split_pair

        Cp = self.C if C is None else split_pair(C)
        Chi, Clo = Cp
        b = self.grid.basis
        dim = self.dim
        dh = dl = None
        for s_, (a, bb) in enumerate(sym_components(dim)):
            f = 1.0 if a == bb else 2.0
            th, tl = Chi[..., s_] * f, Clo[..., s_] * f
            for e in range(dim):
                Ta = b.D_col @ b.S if a == e else b.S
                Tb = b.D_col @ b.S if bb == e else b.S
                th, tl = apply_1d_df64(
                    th, tl, SplitMatrix(np.asarray(Ta * Tb).T), 1 + e)
            if dh is None:
                dh, dl = th, tl
            else:
                dh, dl = df64_add(dh, dl, th, tl)
        dh = dh.reshape(self.grid.n_cells, self.N)
        dl = dl.reshape(self.grid.n_cells, self.N)
        parts = [self._scatter_block_pair(self._cells_of_block(dh, bi),
                                          self._cells_of_block(dl, bi), bi)
                 for bi in range(len(self.layout.node_shapes))]
        diag = self.layout.seam_sum(
            self.layout.pad_tail(jnp.concatenate(parts)))
        diag = jnp.where(self.interior, diag, 1.0)
        return 1.0 / diag

    # -------------------------------------------------- setup/analysis
    def _Skron(self):
        S = np.asarray(self.grid.basis.S, np.float64)
        M = np.array([[1.0]])
        for _ in range(self.dim):
            M = np.kron(M, S)
        return M

    def compute_rhs_pair(self, fv: np.ndarray, u_bc) -> jnp.ndarray:
        """b = M f - A u_bc on the bp layout; ``fv`` = f*JxW at quad
        points, host f64 [n_cells, nq^dim]."""
        if not hasattr(self, "_mass"):
            self._mass = OzakiMatmul(self._Skron())
        nc_all, N = self.grid.n_cells, self.N
        fv = np.asarray(fv, np.float64).reshape(nc_all, N)
        fh_np = fv.astype(np.float32)
        fh = jnp.asarray(fh_np)
        fl = jnp.asarray((fv - fh_np).astype(np.float32))
        xh, xl = split_f64(u_bc)
        parts = []
        for bi in range(len(self.layout.node_shapes)):
            mh, ml = self._mass.apply(self._cells_of_block(fh, bi),
                                      self._cells_of_block(fl, bi))
            ah, al = self._apply_block_pair(xh, xl, bi, self.C)
            yh, yl = df64_add(mh, ml, -ah, -al)
            parts.append(self._scatter_block_pair(yh, yl, bi))
        b = self.layout.seam_sum(
            self.layout.pad_tail(jnp.concatenate(parts)))
        return jnp.where(self.interior, b, 0.0)

    def l2_error(self, u, exact_quad, jxw32: Optional[jnp.ndarray] = None):
        """Volume-weighted L2 error vs exact quad values; u is bp f64."""
        if not hasattr(self, "_interp"):
            self._interp = OzakiMatmul(self._Skron().T)
        nc_all, N = self.grid.n_cells, self.N
        if jxw32 is None:
            if not hasattr(self, "_jxw32"):
                self._jxw32 = jnp.asarray(
                    self.grid.jxw.reshape(nc_all, N), jnp.float32)
            jxw32 = self._jxw32
        jxw32 = jxw32.reshape(nc_all, N)
        eq = exact_quad.reshape(nc_all, N)
        xh, xl = split_f64(u)
        err = jnp.float64(0.0)
        for bi in range(len(self.layout.node_shapes)):
            qh, ql = self._interp.apply(self._gather_block(xh, bi),
                                        self._gather_block(xl, bi))
            uq = join_f64(qh, ql)
            d = (uq - self._cells_of_block(eq, bi)).astype(jnp.float32)
            err = err + sum_f64(
                (d * d * self._cells_of_block(jxw32, bi)).reshape(-1))
        vol = sum_f64(jxw32.reshape(-1))
        return jnp.sqrt(err / vol)
