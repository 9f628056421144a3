"""Multigrid transfer on mapped multiblock meshes (general-geometry
counterpart of :mod:`multigrid_tpu.ops.transfer`, i.e. of deal.II
``MGTransferMatrixFree``): per-coarse-cell 2^dim-child embedding with
1/valence averaging weights on shared fine nodes."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.quadrature import lagrange_values
from ..mesh.mapped import GeneralGrid
from .df64 import SplitMatrix, apply_1d_df64, join_f64, split_f64
from .laplace import apply_1d


class GeneralTransfer:
    def __init__(self, fine: GeneralGrid, coarse: GeneralGrid,
                 dtype=jnp.float32, constrained: bool = True):
        assert fine.level == coarse.level + 1
        self.fine, self.coarse = fine, coarse
        self.constrained = constrained
        self.dim = fine.dim
        self.n = fine.n
        nodes = fine.basis.nodes
        self.E = [
            jnp.asarray(lagrange_values(nodes, nodes * 0.5), dtype),
            jnp.asarray(lagrange_values(nodes, 0.5 + nodes * 0.5), dtype),
        ]
        self.child_cells = coarse.child_cells()       # [Cc, 2^dim]
        self.fine_nodes = jnp.asarray(fine.cell_nodes)
        self.coarse_nodes = jnp.asarray(coarse.cell_nodes)
        counts = np.bincount(fine.cell_nodes.reshape(-1), minlength=fine.n_dofs)
        self.weights = jnp.asarray(1.0 / counts, dtype)
        self.fine_interior = jnp.asarray(~fine.boundary)
        self.coarse_interior = jnp.asarray(~coarse.boundary)
        # fine cell -> (coarse cell, child) inverse map for restriction
        self._children = [
            jnp.asarray(self.child_cells[:, s]) for s in range(2 ** self.dim)
        ]
        self._offsets = list(np.ndindex(*(2,) * self.dim))

    def _embed(self, wc, s_offsets):
        import jax

        w = wc
        for d, s in enumerate(s_offsets):
            # HIGHEST: default-precision f32 einsums quantize to bf16 on
            # the MXU (CLAUDE.md hardware finding; measured 1.4e-2 class
            # on the general sp operator 2026-08-20)
            w = apply_1d(w, self.E[s], 1 + d,
                         precision=jax.lax.Precision.HIGHEST)
        return w

    def prolongate(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        u = u_coarse
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0)
        wc = jnp.take(u, self.coarse_nodes, axis=0).reshape(
            (self.coarse.n_cells,) + (self.n,) * self.dim
        )
        out = jnp.zeros(self.fine.n_dofs, u.dtype)
        for s, offs in enumerate(self._offsets):
            wf = self._embed(wc, offs).reshape(self.coarse.n_cells, -1)
            idx = jnp.take(self.fine_nodes, self._children[s], axis=0).reshape(-1)
            out = out.at[idx].add(wf.reshape(-1), mode="drop")
        # contributions agree on shared nodes -> valence averaging is exact
        out = out * self.weights
        if self.constrained:
            out = jnp.where(self.fine_interior, out, 0)
        return out

    def restrict_solution(self, u_fine: jnp.ndarray) -> jnp.ndarray:
        """Pointwise FE restriction of a *solution* (not a residual): coarse
        node values = fine FE function evaluated at the coarse node points,
        the role of deal.II ``get_restriction_matrix`` in minimal_surface's
        level-coefficient setup (/root/reference/minimal_surface/program.cc:416-457)."""
        nodes = self.fine.basis.nodes
        n = self.n
        from ..core.quadrature import lagrange_values as _lv

        out = jnp.zeros(self.coarse.n_dofs, u_fine.dtype)
        wf_all = jnp.take(u_fine, self.fine_nodes, axis=0)
        counts = np.bincount(self.coarse.cell_nodes.reshape(-1),
                             minlength=self.coarse.n_dofs)
        for s, offs in enumerate(self._offsets):
            idx = jnp.take(self.fine_nodes, self._children[s], axis=0)
            wf = jnp.take(u_fine, idx.reshape(-1), axis=0).reshape(
                (self.coarse.n_cells,) + (n,) * self.dim
            )
            for d, so in enumerate(offs):
                inside = (nodes <= 0.5 + 1e-14) if so == 0 else (nodes > 0.5 + 1e-14)
                pts = 2.0 * nodes - so
                R = _lv(nodes, pts) * inside[:, None]
                wf = apply_1d(wf, jnp.asarray(R, u_fine.dtype), 1 + d)
            out = out.at[self.coarse.cell_nodes.reshape(-1)].add(wf.reshape(-1))
        return out / jnp.asarray(counts, u_fine.dtype)

    def restrict(self, u_fine: jnp.ndarray) -> jnp.ndarray:
        u = u_fine
        if self.constrained:
            u = jnp.where(self.fine_interior, u, 0)
        u = u * self.weights
        out = jnp.zeros(self.coarse.n_dofs, u.dtype)
        for s, offs in enumerate(self._offsets):
            idx = jnp.take(self.fine_nodes, self._children[s], axis=0)
            wf = jnp.take(u, idx.reshape(-1), axis=0).reshape(
                (self.coarse.n_cells,) + (self.n,) * self.dim
            )
            import jax

            for d, so in enumerate(offs):
                wf = apply_1d(wf, self.E[so].T, 1 + d,
                              precision=jax.lax.Precision.HIGHEST)
            out = out.at[self.coarse_nodes.reshape(-1)].add(wf.reshape(-1))
        if self.constrained:
            out = jnp.where(self.coarse_interior, out, 0)
        return out


class GeneralTransferDF64:
    """dp multigrid transfer in compensated f32 pairs (f64 in/out).

    The f64 ``GeneralTransfer`` runs its embedding sweeps in XLA's emulated
    f64 on TPU (~100x slower than f32, CLAUDE.md); FMG prolongates the dp
    solution once per level and the pure-double V-cycle transfers every
    defect in dp (/root/reference/common/multigrid_solver.h:861-943), so
    both ride this class on TPU.  Gathers/scatters of the (hi, lo)
    components are exact; the 1-D embeddings are
    :func:`multigrid_tpu.ops.df64.apply_1d_df64` sweeps (~2^-45 relative);
    joins to native f64 happen only at the additive scatters and the
    valence/weight multiplies (elementwise f64 is cheap on TPU — only
    contractions and reductions are not)."""

    def __init__(self, fine: GeneralGrid, coarse: GeneralGrid,
                 constrained: bool = True):
        assert fine.level == coarse.level + 1
        self.fine, self.coarse = fine, coarse
        self.constrained = constrained
        self.dim = fine.dim
        self.n = fine.n
        nodes = fine.basis.nodes
        E = [lagrange_values(nodes, nodes * 0.5),
             lagrange_values(nodes, 0.5 + nodes * 0.5)]
        self.E = [SplitMatrix(e) for e in E]
        self.Et = [SplitMatrix(e.T) for e in E]
        self.child_cells = coarse.child_cells()       # [Cc, 2^dim]
        self.fine_nodes = jnp.asarray(fine.cell_nodes)
        self.coarse_nodes = jnp.asarray(coarse.cell_nodes)
        counts = np.bincount(fine.cell_nodes.reshape(-1), minlength=fine.n_dofs)
        self.weights = jnp.asarray(1.0 / counts, jnp.float64)
        self.fine_interior = jnp.asarray(~fine.boundary)
        self.coarse_interior = jnp.asarray(~coarse.boundary)
        self._children = [
            jnp.asarray(self.child_cells[:, s]) for s in range(2 ** self.dim)
        ]
        self._offsets = list(np.ndindex(*(2,) * self.dim))

    def prolongate(self, u_coarse: jnp.ndarray) -> jnp.ndarray:
        u = u_coarse
        if self.constrained:
            u = jnp.where(self.coarse_interior, u, 0.0)
        uh, ul = split_f64(u)
        shape = (self.coarse.n_cells,) + (self.n,) * self.dim
        wch = jnp.take(uh, self.coarse_nodes, axis=0).reshape(shape)
        wcl = jnp.take(ul, self.coarse_nodes, axis=0).reshape(shape)
        out = jnp.zeros(self.fine.n_dofs, jnp.float64)
        for s, offs in enumerate(self._offsets):
            wh, wl = wch, wcl
            for d, so in enumerate(offs):
                wh, wl = apply_1d_df64(wh, wl, self.E[so], 1 + d)
            idx = jnp.take(self.fine_nodes, self._children[s], axis=0).reshape(-1)
            out = out.at[idx].add(join_f64(wh, wl).reshape(-1), mode="drop")
        out = out * self.weights
        if self.constrained:
            out = jnp.where(self.fine_interior, out, 0.0)
        return out

    def restrict(self, u_fine: jnp.ndarray) -> jnp.ndarray:
        u = u_fine
        if self.constrained:
            u = jnp.where(self.fine_interior, u, 0.0)
        uh, ul = split_f64(u * self.weights)
        out = jnp.zeros(self.coarse.n_dofs, jnp.float64)
        for s, offs in enumerate(self._offsets):
            idx = jnp.take(self.fine_nodes, self._children[s], axis=0).reshape(-1)
            shape = (self.coarse.n_cells,) + (self.n,) * self.dim
            wh = jnp.take(uh, idx, axis=0).reshape(shape)
            wl = jnp.take(ul, idx, axis=0).reshape(shape)
            for d, so in enumerate(offs):
                wh, wl = apply_1d_df64(wh, wl, self.Et[so], 1 + d)
            out = out.at[self.coarse_nodes.reshape(-1)].add(
                join_f64(wh, wl).reshape(-1))
        if self.constrained:
            out = jnp.where(self.coarse_interior, out, 0.0)
        return out

