"""Transformed Jacobi preconditioner for the SIP-DG operator.

TPU-native rebuild of ``JacobiTransformed``
(/root/reference/common/laplace_operator_dg.h:2028-2256):
``P^{-1} = T3 diag(d)^{-1} T3^T`` per cell, where T3 is the tensor product
of the 1-D SIP eigenbasis (generalized eigenvectors of the 1-D cell matrix
with both-end interior penalties w.r.t. the 1-D mass matrix,
laplace_operator_dg.h:180-246) and ``d`` is the exact operator diagonal in
that basis including the cell's own face contributions
(laplace_operator_dg.h:2098-2247).

The diagonal is extracted by the translation-invariance trick: on a uniform
affine mesh the self-coupling block A_cc depends only on the cell's
boundary-adjacency category (3 per axis), so a dense probe mesh of
min(cells,3)^dim cells yields every category block exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dg import DGGrid, DGLaplace


def _transformed_diagonals(op: DGLaplace, T3: np.ndarray):
    """Per-cell transformed diagonals d[ci][i] = t_i^T A_{ci,ci} t_i on the
    probe mesh, WITHOUT assembling any dense matrix: place eigenbasis
    vector t_i simultaneously in every cell of one checkerboard parity
    (face couplings only connect opposite parities, so each cell's response
    is its uncontaminated self-block), apply the operator once per basis
    vector, and read off the Rayleigh quotients.  2*n^dim operator applies
    total — scale-free in the number of probe cells."""
    grid = op.grid
    dim, n = grid.dim, grid.n
    Nc = n**dim
    cells = grid.cells
    d = np.zeros(cells + (Nc,))
    parity_of = {ci: sum(ci) % 2 for ci in np.ndindex(*cells)}
    for parity in (0, 1):
        sel = [ci for ci in np.ndindex(*cells) if parity_of[ci] == parity]
        if not sel:
            continue
        base = np.zeros((Nc,) + cells + (n,) * dim)
        for i in range(Nc):
            blk = T3[:, i].reshape((n,) * dim)
            for ci in sel:
                base[i][ci] = blk
        ys = np.asarray(
            jax.vmap(op.apply)(jnp.asarray(base, op.dtype)), np.float64
        )
        for i in range(Nc):
            for ci in sel:
                d[ci][..., i] = float(
                    np.sum(ys[i][ci] * T3[:, i].reshape((n,) * dim))
                )
    return d


class JacobiTransformed:
    def __init__(self, op: DGLaplace, dtype=None, general: bool | None = None):
        grid = op.grid
        dtype = dtype or op.dtype
        self.dtype = dtype
        dim, n = grid.dim, grid.n
        self.dim, self.n = dim, n
        b = grid.basis
        self.T = jnp.asarray(b.T, dtype)          # columns = eigenvectors
        self.Tt = jnp.asarray(b.T.T, dtype)

        Nc = n**dim
        T3 = np.array([[1.0]])
        for _ in range(dim):
            T3 = np.kron(T3, b.T)
        # the 3-category translation-invariance shortcut below is valid
        # ONLY for a uniform affine mesh with a cell-independent operator.
        # DGGrid is structurally uniform (one constant Jacobian,
        # dg.py:42); if the operator ever carries per-cell data (variable
        # coefficient, curved cells), it must declare
        # ``has_cell_data = True`` and we take the exact general path:
        # checkerboard Rayleigh probes on the REAL mesh (still only
        # 2 n^dim applies, cf. the reference's per-cell column assembly,
        # /root/reference/common/laplace_operator_dg.h:2098-2247).
        per_cell = bool(getattr(op, "has_cell_data", False))
        if general is None:
            general = per_cell
        if not general and per_cell:
            raise ValueError(
                "JacobiTransformed category shortcut requires a uniform "
                "cell-independent operator; pass general=True")
        if general:
            op64 = (op.astype(jnp.float64) if hasattr(op, "astype")
                    else op if op.dtype == jnp.float64
                    else type(op)(grid, jnp.float64))
            full = _transformed_diagonals(op64, T3).reshape(
                grid.cells + (n,) * dim)
        else:
            # probe mesh: same Jacobian, min(cells,3) cells per axis
            probe_cells = tuple(min(c, 3) for c in grid.cells)
            probe = DGGrid(cells=probe_cells, jacobian=grid.jacobian,
                           degree=grid.degree, kind=grid.kind)
            # per-category transformed diagonal via checkerboard probes
            d_cat = _transformed_diagonals(DGLaplace(probe, jnp.float64), T3)
            # map categories to the real mesh
            idx = []
            for d in range(dim):
                C, P = grid.cells[d], probe_cells[d]
                m = np.full(C, min(1, P - 1))
                m[0] = 0
                m[-1] = P - 1
                idx.append(m)
            full = d_cat[np.ix_(*idx)].reshape(grid.cells + (n,) * dim)
        self.inv_diag = jnp.asarray(1.0 / full, dtype)

    def _sweep(self, u, M):
        for d in range(self.dim):
            axis = self.dim + d
            nd = u.ndim
            in_subs = list(range(nd))
            out_subs = list(range(nd))
            out_subs[axis] = nd
            u = jnp.einsum(u, in_subs, M, [nd, axis], out_subs,
                           precision=jax.lax.Precision.HIGHEST)
        return u

    def vmult(self, u: jnp.ndarray) -> jnp.ndarray:
        """P^{-1} u = T3 diag^{-1} T3^T u
        (/root/reference/common/laplace_operator_dg.h:2084-2095)."""
        y = self._sweep(u, self.Tt)
        y = y * self.inv_diag
        return self._sweep(y, self.T)
