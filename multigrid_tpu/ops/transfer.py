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
        # touch-count weights on the fine grid: fine nodes on interior
        # *coarse*-cell boundaries are produced by two coarse windows
        dim = fine.dim
        w = np.ones([1] * dim)
        for d in range(dim):
            ncc = coarse.cells[d]
            line = np.ones(ncc * 2 * p + 1)
            if ncc > 1:
                line[2 * p : -1 : 2 * p] = 0.5
            shape = [1] * dim
            shape[d] = line.size
            w = w * line.reshape(shape)
        self.weights = jnp.asarray(w, dtype)
        self.fine_interior = jnp.asarray(~fine.boundary_mask())
        self.coarse_interior = jnp.asarray(~coarse.boundary_mask())

    def prolongate(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        u = u_coarse
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0)
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
        w = gather_cells(u * self.weights, self.nf)
        for d in range(self.fine.dim):
            w = apply_1d(w, self.Pt, 2 * d + 1)
        uc = scatter_cells(w, self.n)
        if self.constrained:
            uc = jnp.where(self.coarse_interior, uc, 0)
        return uc
