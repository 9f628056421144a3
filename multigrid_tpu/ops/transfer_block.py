"""Multigrid transfers on the block-padded general-path layout.

Per block, the 2:1 level transfer is a per-axis BANDED matrix apply on
the block's node lattice (the brick ``OzakiMatmulTransfer`` pattern,
ops/transfer.py:434-449) — no index gather/scatter anywhere; cross-block
coupling reduces to the O(surface) seam sum of
:class:`multigrid_tpu.mesh.mapped.BlockLayout`.

Adjoint structure (the partition-of-unity argument): with expand/collapse
between true dofs and bp copies, prolongation is copy-wise block
interpolation (consistent in, consistent out up to axis-order rounding),
and its true-dof transpose is ``seam_sum(P_blockᵀ (weights ⊙ r))`` —
each true fine dof's contribution counted once, cross-block partial sums
accumulated on the coarse seams.  Matches the flat-path
``GeneralTransfer`` semantics (valence weights + scatter-add) without
the scatter.

Two precisions: f32 at ``Precision.HIGHEST`` for the V-cycle, Ozaki
bf16-limb pairs for dp (FMG solution prolongation, pure-double V-cycle)
with the banded exactness bound (nnz per column = 2p+1, not the lattice
width).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.mapped import GeneralGrid
from .df64 import join_f64, split_f64
from .laplace_general_mxu import OzakiMatmul


def banded_prolongation_1d(basis, ncc: int) -> np.ndarray:
    """[Nf, Nc] nodal 2:1 interpolation along one axis of a block with
    ``ncc`` coarse cells: per-cell two-child embedding ``basis.P`` with
    0.5 weights on interior duplicated fine rows (the
    ops/transfer.OzakiMatmulTransfer._banded_axis_matrix construction)."""
    p = basis.n - 1
    Xf, Xc = 2 * p * ncc + 1, p * ncc + 1
    S = np.zeros((Xf, Xc))
    for c in range(ncc):
        S[2 * p * c: 2 * p * c + 2 * p + 1,
          p * c: p * c + p + 1] += np.asarray(basis.P, np.float64)
    w = np.ones(Xf)
    if ncc > 1:
        w[2 * p: -1: 2 * p] = 0.5
    return w[:, None] * S


def _apply_axis(x, M, d, precision):
    """y[..., i_d, ...] = sum_j M[j, i_d] x[..., j, ...] via moveaxis +
    one matmul (M given as [in, out])."""
    xm = jnp.moveaxis(x, d, -1)
    lead = xm.shape[:-1]
    y = jnp.dot(xm.reshape(-1, M.shape[0]), M,
                preferred_element_type=x.dtype, precision=precision)
    return jnp.moveaxis(y.reshape(lead + (M.shape[1],)), -1, d)


class BlockTransfer:
    """f32 (V-cycle) transfer on bp vectors."""

    def __init__(self, fine: GeneralGrid, coarse: GeneralGrid,
                 dtype=jnp.float32, constrained: bool = True):
        assert fine.level == coarse.level + 1
        self.lf = fine.block_layout()
        self.lc = coarse.block_layout()
        self.constrained = constrained
        self.dtype = dtype
        self.n_blocks = len(self.lf.node_shapes)
        self.P = []      # per block, per axis [Nc, Nf] (input-major)
        for bi in range(self.n_blocks):
            axes = []
            for d in range(fine.dim):
                ncc = coarse.block_cells[bi][d]
                axes.append(jnp.asarray(
                    banded_prolongation_1d(fine.basis, ncc).T, dtype))
            self.P.append(axes)
        self.fine_interior = jnp.asarray(self.lf.interior)
        self.coarse_interior = jnp.asarray(self.lc.interior)
        self.fweights = jnp.asarray(self.lf.weights.astype(np.float32)
                                    if dtype == jnp.float32
                                    else self.lf.weights)

    def _per_block(self, x, layout_in, shapes_in, mats, transpose):
        parts = []
        o = 0
        for bi in range(self.n_blocks):
            shp = shapes_in[bi]
            nb = int(np.prod(shp))
            xb = x[o:o + nb].reshape(shp)
            o += nb
            for d, M in enumerate(mats[bi]):
                Md = M.T if transpose else M
                xb = _apply_axis(xb, Md, d, jax.lax.Precision.HIGHEST)
            parts.append(xb.reshape(-1))
        return jnp.concatenate(parts)

    def prolongate(self, uc):
        u = jnp.where(self.coarse_interior, uc, 0) if self.constrained else uc
        out = self.lf.pad_tail(self._per_block(
            u, self.lc, self.lc.node_shapes, self.P, transpose=False))
        if self.constrained:
            out = jnp.where(self.fine_interior, out, 0)
        return out

    def restrict(self, rf):
        r = jnp.where(self.fine_interior, rf, 0) if self.constrained else rf
        r = r * self.fweights.astype(r.dtype)
        out = self.lc.pad_tail(self._per_block(
            r, self.lf, self.lf.node_shapes, self.P, transpose=True))
        out = self.lc.seam_sum(out)
        if self.constrained:
            out = jnp.where(self.coarse_interior, out, 0)
        return out


class BlockTransferPair:
    """dp (f64 in/out) transfer on bp vectors via per-axis Ozaki banded
    matmuls — FMG solution prolongation and the pure-double V-cycle."""

    def __init__(self, fine: GeneralGrid, coarse: GeneralGrid,
                 constrained: bool = True):
        assert fine.level == coarse.level + 1
        self.lf = fine.block_layout()
        self.lc = coarse.block_layout()
        self.constrained = constrained
        self.n_blocks = len(self.lf.node_shapes)
        self.Pmm = []    # per block, per axis: (prolong [Nc,Nf], restrict)
        for bi in range(self.n_blocks):
            axes = []
            for d in range(fine.dim):
                ncc = coarse.block_cells[bi][d]
                B = banded_prolongation_1d(fine.basis, ncc)
                # true band counts: a fine node sees <= n coarse nodes
                # per adjoining cell (prolong), a coarse boundary node
                # sees both adjoining fine patches (restrict: up to
                # 2(2p+1)-1)
                nnz_p = int((B.T != 0).sum(axis=0).max())
                nnz_r = int((B != 0).sum(axis=0).max())
                axes.append((OzakiMatmul(B.T, nnz_per_col=nnz_p),
                             OzakiMatmul(B, nnz_per_col=nnz_r)))
            self.Pmm.append(axes)
        self.fine_interior = jnp.asarray(self.lf.interior)
        self.coarse_interior = jnp.asarray(self.lc.interior)
        self.fweights = jnp.asarray(self.lf.weights)

    def _apply_axis_pair(self, xh, xl, mm: OzakiMatmul, d):
        xh = jnp.moveaxis(xh, d, -1)
        xl = jnp.moveaxis(xl, d, -1)
        lead = xh.shape[:-1]
        yh, yl = mm.apply(xh.reshape(-1, mm.K), xl.reshape(-1, mm.K))
        yh = jnp.moveaxis(yh.reshape(lead + (mm.N,)), -1, d)
        yl = jnp.moveaxis(yl.reshape(lead + (mm.N,)), -1, d)
        return yh, yl

    def _per_block(self, x, shapes_in, restrict: bool):
        xh, xl = split_f64(x)
        parts = []
        o = 0
        for bi in range(self.n_blocks):
            shp = shapes_in[bi]
            nb = int(np.prod(shp))
            bh = xh[o:o + nb].reshape(shp)
            bl = xl[o:o + nb].reshape(shp)
            o += nb
            for d, (mp, mr) in enumerate(self.Pmm[bi]):
                bh, bl = self._apply_axis_pair(bh, bl, mr if restrict else mp,
                                               d)
            parts.append(join_f64(bh, bl).reshape(-1))
        return jnp.concatenate(parts)

    def prolongate(self, uc):
        u = jnp.where(self.coarse_interior, uc, 0.0) if self.constrained \
            else uc
        out = self.lf.pad_tail(
            self._per_block(u, self.lc.node_shapes, restrict=False))
        if self.constrained:
            out = jnp.where(self.fine_interior, out, 0.0)
        return out

    def restrict(self, rf):
        r = jnp.where(self.fine_interior, rf, 0.0) if self.constrained else rf
        r = r * self.fweights
        out = self.lc.pad_tail(
            self._per_block(r, self.lf.node_shapes, restrict=True))
        out = self.lc.seam_sum(out)
        if self.constrained:
            out = jnp.where(self.coarse_interior, out, 0.0)
        return out
