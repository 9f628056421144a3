"""DG level transfer and CG<->DG coupling.

* :class:`DGTransfer`: 2:1 prolongation/restriction between DG levels —
  each coarse cell maps to 2^dim children by per-axis embedding matrices;
  no dof sharing, so the transfer is a pure batched tensor contraction
  (the role of the unconstrained ``MGTransferMatrixFree`` in
  /root/reference/common/multigrid_solver_dg_plain.h:150-159).

* :class:`CGDGCoupling`: embeds a continuous FE_Q field into the DG space
  and restricts DG residuals onto the FE_Q space — the reference's
  ``prolongate_add_cg_to_dg`` (/root/reference/common/laplace_operator_dg.h:1863-1894)
  and the restrict half of ``vmult_with_merged_ops<action=1>``
  (laplace_operator_dg.h:1798-1819).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.brick import DofGrid
from .dg import DGGrid, DGLaplace
from .windows import gather_cells, scatter_cells
from .masks import bcast_and, interior_axes_jnp


def _apply_node(u, M, dim, d):
    axis = dim + d
    nd = u.ndim
    in_subs = list(range(nd))
    out_subs = list(range(nd))
    out_subs[axis] = nd
    return jnp.einsum(u, in_subs, M, [nd, axis], out_subs,
                      precision=jax.lax.Precision.HIGHEST)


class DGTransfer:
    def __init__(self, fine: DGGrid, coarse: DGGrid, dtype=jnp.float32):
        assert tuple(c * 2 for c in coarse.cells) == fine.cells
        self.fine, self.coarse = fine, coarse
        b = fine.basis
        self.E = [jnp.asarray(b.E0, dtype), jnp.asarray(b.E1, dtype)]
        self.dim = fine.dim
        self.n = fine.n

    def prolongate(self, u: jnp.ndarray) -> jnp.ndarray:
        dim, n = self.dim, self.n
        for d in range(dim):
            a0 = _apply_node(u, self.E[0], dim, d)
            a1 = _apply_node(u, self.E[1], dim, d)
            u = jnp.stack([a0, a1], axis=d + 1)
            u = u.reshape(
                u.shape[:d] + (u.shape[d] * 2,) + u.shape[d + 2 :]
            )
        return u

    def restrict(self, v: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        for d in range(dim):
            C2 = v.shape[d]
            v = v.reshape(v.shape[:d] + (C2 // 2, 2) + v.shape[d + 1 :])
            even = jnp.take(v, 0, axis=d + 1)
            odd = jnp.take(v, 1, axis=d + 1)
            v = _apply_node(even, self.E[0].T, dim, d) + _apply_node(
                odd, self.E[1].T, dim, d
            )
        return v


class CGDGCoupling:
    """Between an FE_Q node grid and a DG field on the same mesh level."""

    def __init__(self, cg_grid: DofGrid, dg_grid: DGGrid, dtype=jnp.float32):
        assert cg_grid.cells == dg_grid.cells
        assert cg_grid.degree == dg_grid.degree
        self.cg = cg_grid
        self.dg = dg_grid
        self.dim = cg_grid.dim
        self.n = cg_grid.degree + 1
        self.E = jnp.asarray(dg_grid.basis.nodal_from_gll, dtype)
        self._interior_axes = interior_axes_jnp(cg_grid)
        dim = self.dim
        self._to_block = tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
        self._from_block = tuple(np.argsort(self._to_block))

    @property
    def interior(self):
        return bcast_and(self._interior_axes)

    def cg_to_dg(self, u_cg: jnp.ndarray) -> jnp.ndarray:
        """Embed (read node values incl. boundary, as the reference's
        compressed read does) and change basis."""
        w = gather_cells(u_cg, self.n).transpose(self._to_block)
        for d in range(self.dim):
            w = _apply_node(w, self.E, self.dim, d)
        return w

    def dg_to_cg(self, r_dg: jnp.ndarray) -> jnp.ndarray:
        """Adjoint: transform to nodal coefficients and scatter-add into the
        node grid, zeroing Dirichlet rows (the CG hierarchy solves the
        constrained problem, multigrid_solver_dg.h:118-148)."""
        w = r_dg
        for d in range(self.dim):
            w = _apply_node(w, self.E.T, self.dim, d)
        y = scatter_cells(w.transpose(self._from_block), self.n)
        return jnp.where(self.interior, y, 0)
