"""Mapped multiblock meshes: the general-geometry path.

TPU-native replacement for the reference's use of deal.II curved grids
(``GridGenerator::hyper_shell`` + ``SphericalManifold``,
/root/reference/poisson_shell/program.cc:426-431, and ``hyper_ball`` for
minimal_surface).  A domain is a union of logically-structured blocks, each
the image of [0,1]^dim under a smooth mapping; continuity across block
interfaces is established by coordinate-based node identification (which
also absorbs face-orientation bookkeeping that unstructured codes handle
explicitly).  Per-level data are flat numpy index tables built once at
setup — the role p4est + MappingQGeneric play for the reference.

Jacobians are evaluated by complex-step differentiation of the mapping
(machine-precision exact for analytic maps), falling back to central
differences.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from ..core.basis import make_basis


@dataclass
class Block:
    cells: tuple[int, ...]
    mapping: Callable[[np.ndarray], np.ndarray]  # [N, dim] in [0,1]^dim -> [N, dim]
    complex_step_ok: bool = True


@dataclass
class MappedMesh:
    blocks: list[Block]
    n_levels: int
    boundary_fn: Callable[[np.ndarray], np.ndarray]  # phys [N, dim] -> bool [N]

    @property
    def dim(self) -> int:
        return len(self.blocks[0].cells)

    @property
    def max_level(self) -> int:
        return self.n_levels - 1


def _map_jacobian(block: Block, params: np.ndarray) -> np.ndarray:
    """d(mapping)/d(param) at params [N, dim] -> [N, dim, dim] (row = phys)."""
    dim = params.shape[1]
    out = np.zeros(params.shape + (dim,))
    if block.complex_step_ok:
        h = 1e-30
        for d in range(dim):
            p = params.astype(complex)
            p[:, d] += 1j * h
            out[:, :, d] = np.imag(block.mapping(p)) / h
    else:
        h = 1e-6
        for d in range(dim):
            pp = params.copy()
            pm = params.copy()
            pp[:, d] += h
            pm[:, d] -= h
            out[:, :, d] = (block.mapping(pp) - block.mapping(pm)) / (2 * h)
    return out


class GeneralGrid:
    """One multigrid level of FE_Q(p) dofs on a mapped multiblock mesh."""

    def __init__(self, mesh: MappedMesh, level: int, degree: int):
        self.mesh = mesh
        self.level = level
        self.degree = degree
        self.dim = mesh.dim
        b = make_basis(degree)
        self.basis = b
        dim = self.dim
        n = degree + 1
        self.n = n

        all_coords = []
        cell_param = []   # per block: cell-local param coords of nodes
        block_cells = []
        offsets = [0]
        for blk in mesh.blocks:
            cells = tuple(c * (1 << level) for c in blk.cells)
            block_cells.append(cells)
            # unique param line per axis
            lines = []
            for d in range(dim):
                h = 1.0 / cells[d]
                pts = (np.arange(cells[d])[:, None] + b.nodes[None, :]) * h
                line = np.concatenate([pts[:, :-1].reshape(-1), pts[-1:, -1]])
                lines.append(line)
            grids = np.meshgrid(*lines, indexing="ij")
            params = np.stack([g.reshape(-1) for g in grids], axis=1)
            all_coords.append(blk.mapping(params))
            offsets.append(offsets[-1] + params.shape[0])
        coords = np.concatenate(all_coords, axis=0)

        # coordinate-based node identification across blocks (native hash
        # dedup from native/meshgen.cpp when available)
        from . import native

        scale = np.abs(coords).max() + 1.0
        n_unique, inverse = native.unique_nodes(coords, 1e-9 * scale)
        self.n_dofs = n_unique
        node_coords = np.zeros((self.n_dofs, dim))
        node_coords[inverse] = coords
        self.node_coords = node_coords
        self.boundary = mesh.boundary_fn(node_coords)

        # per-cell global node lists (lexicographic local numbering)
        cn = []
        self.block_cells = block_cells
        for bi, blk in enumerate(mesh.blocks):
            cells = block_cells[bi]
            idx = native.block_cell_nodes(cells, degree)
            cn.append(inverse[offsets[bi] + idx])
        self.cell_nodes = np.concatenate(cn, axis=0).astype(np.int32)
        self.n_cells = self.cell_nodes.shape[0]

        # quadrature geometry
        qs, js = [], []
        for bi, blk in enumerate(mesh.blocks):
            cells = block_cells[bi]
            qlines = []
            for d in range(dim):
                h = 1.0 / cells[d]
                qlines.append((np.arange(cells[d])[:, None] + b.quad_points[None, :]) * h)
            # param coords per cell per quad point: [C, nq^dim, dim]
            mg = np.meshgrid(*[np.arange(c) for c in cells], indexing="ij")
            cidx = np.stack([g.reshape(-1) for g in mg], axis=1)  # [C, dim]
            qmg = np.meshgrid(*[b.quad_points for _ in range(dim)], indexing="ij")
            qref = np.stack([g.reshape(-1) for g in qmg], axis=1)  # [nq^dim, dim]
            h = 1.0 / np.asarray(cells)
            params = (cidx[:, None, :] + qref[None, :, :]) * h[None, None, :]
            flat = params.reshape(-1, dim)
            qs.append(blk.mapping(flat).reshape(params.shape))
            jac = _map_jacobian(blk, flat) * h[None, :]  # chain rule cell->block
            js.append(jac.reshape(params.shape + (dim,)))
        self.quad_coords = np.concatenate(qs, axis=0)   # [C, nq^dim, dim]
        self.jacobians = np.concatenate(js, axis=0)     # [C, nq^dim, dim, dim]
        self.detJ = np.abs(np.linalg.det(self.jacobians))
        qw = b.quad_weights
        w = np.array([1.0])
        for _ in range(dim):
            w = np.kron(w, qw)
        self.jxw = self.detJ * w[None, :]               # [C, nq^dim]

        # fine-cell bookkeeping for transfers: per block, lexicographic
        self._block_offsets_cells = np.cumsum(
            [0] + [int(np.prod(c)) for c in block_cells]
        )

    def child_cells(self) -> np.ndarray:
        """For the next-finer level: fine cell ids per (coarse cell, child),
        children ordered lexicographically by per-axis offset."""
        dim = self.dim
        out = []
        for bi, cells in enumerate(self.block_cells):
            fine_cells = tuple(2 * c for c in cells)
            mg = np.meshgrid(*[np.arange(c) for c in cells], indexing="ij")
            cidx = np.stack([g.reshape(-1) for g in mg], axis=1)
            rows = []
            for s in np.ndindex(*(2,) * dim):
                fidx = 2 * cidx + np.asarray(s)[None, :]
                flat = np.ravel_multi_index(fidx.T, fine_cells)
                rows.append(flat)
            out.append(np.stack(rows, axis=1) + self._fine_offset(bi))
        return np.concatenate(out, axis=0)

    def _fine_offset(self, bi):
        off = 0
        for j in range(bi):
            off += int(np.prod([2 * c for c in self.block_cells[j]]))
        return off

    def merged_coefficient(self, coef_fn=None) -> np.ndarray:
        """Full per-quad-point symmetric tensor incl. JxW:
        ``c w detJ J^{-1} J^{-T}``
        (/root/reference/common/laplace_operator.h:388-429)."""
        dim = self.dim
        Jinv = np.linalg.inv(self.jacobians)
        G = np.einsum("cqab,cqdb->cqad", Jinv, Jinv)  # J^{-1} J^{-T}
        c = 1.0
        if coef_fn is not None:
            c = coef_fn([self.quad_coords[..., d] for d in range(dim)])
        C = G * (self.jxw * c)[..., None, None]
        from ..ops.laplace import sym_components

        comps = sym_components(dim)
        return np.stack([C[..., a, b] for (a, b) in comps], axis=-1)


def _window_np(x: np.ndarray, axis: int, window: int, stride: int) -> np.ndarray:
    n_cells = (x.shape[axis] - 1) // stride
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis] - 1)
    main = x[tuple(sl)]
    main = main.reshape(x.shape[:axis] + (n_cells, stride) + x.shape[axis + 1 :])
    sl[axis] = slice(1, x.shape[axis])
    last = x[tuple(sl)].reshape(x.shape[:axis] + (n_cells, stride) + x.shape[axis + 1 :])
    sel = [slice(None)] * main.ndim
    sel[axis + 1] = slice(stride - 1, stride)
    return np.concatenate([main, last[tuple(sel)]], axis=axis + 1)
