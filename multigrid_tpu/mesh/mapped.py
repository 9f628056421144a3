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
        # stacked-lattice bookkeeping for the block-padded vector layout
        # (ops/laplace_block): concat position -> global dof
        self._lat_inverse = inverse.astype(np.int32)
        self._lat_offsets = list(offsets)

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

    def block_layout(self, pad_multiple: Optional[int] = None) -> "BlockLayout":
        """Stacked per-block node-lattice ("block-padded") vector layout:
        the TPU-fast general-path format (see ops/laplace_block).  Nodes
        shared across block seams are stored once PER BLOCK (duplicated,
        like the windowed brick layout duplicates cell boundaries), so
        cell localization becomes reshape-based window ops per block and
        only an O(surface) duplicate-sum remains unstructured.

        ``pad_multiple`` (or a ``_bp_pad`` attribute set by the solver)
        rounds the vector length up so it shards evenly over a device
        mesh; instances are cached per pad value."""
        if pad_multiple is None:
            pad_multiple = getattr(self, "_bp_pad", 1)
        key = f"_block_layout_{pad_multiple}"
        if not hasattr(self, key):
            setattr(self, key, BlockLayout(self, pad_multiple))
        return getattr(self, key)

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


class BlockLayout:
    """Block-padded vector layout tables for one :class:`GeneralGrid` level.

    A block-padded ("bp") vector is the 1-D concatenation of the per-block
    node lattices (C-order [Z, Y, X] each); a global dof shared by k lattice
    positions appears k times.  A bp vector is CONSISTENT when all copies of
    a dof hold the same value; all solver-level vectors maintain this
    invariant (operators end with :meth:`seam-sum <dup tables>`; masks,
    axpys and pointwise ops preserve it).

    Tables (host numpy, built once):
      - ``inverse``      [M] int32: concat position -> global dof
      - ``offsets``      per-block start positions; ``node_shapes`` per-block
        lattice dims; ``cell_offsets`` per-block first-cell index into the
        grid's concatenated cell arrays
      - ``weights``      [M]: 1/multiplicity of the position's dof (dedup
        weights for inner products and restriction)
      - ``dup_src``      [D] int32 positions of all copies of shared dofs,
        grouped by dof; ``dup_seg`` [D] int32 sorted segment ids;
        ``n_seg`` segment count
      - ``interior``     [M] bool: ~Dirichlet
    """

    def __init__(self, grid: "GeneralGrid", pad_multiple: int = 1):
        """``pad_multiple``: round the bp length up to a multiple (zero
        tail, interior=False, weight 0) so vectors shard evenly over a
        device mesh (GeneralMultigridSolver block-mode distribution);
        1 = no padding (the single-chip default)."""
        self.grid = grid
        p = grid.degree
        inverse = grid._lat_inverse
        self.inverse = inverse
        self.M = int(inverse.size)
        self.M_pad = -(-self.M // pad_multiple) * pad_multiple
        self.offsets = [int(o) for o in grid._lat_offsets]
        self.node_shapes = [tuple(c * p + 1 for c in cells)
                            for cells in grid.block_cells]
        self.cell_offsets = np.cumsum(
            [0] + [int(np.prod(c)) for c in grid.block_cells]).tolist()
        mult = np.bincount(inverse, minlength=grid.n_dofs)
        pad = self.M_pad - self.M
        self.weights = np.concatenate([
            (1.0 / mult[inverse]).astype(np.float64), np.zeros(pad)])
        dup_pos = np.nonzero(mult[inverse] > 1)[0]
        g = inverse[dup_pos]
        order = np.argsort(g, kind="stable")
        self.dup_src = dup_pos[order].astype(np.int32)
        uniq, seg = np.unique(g[order], return_inverse=True)
        self.dup_seg = seg.astype(np.int32)
        self.n_seg = int(uniq.size)
        self.interior = np.concatenate([
            ~grid.boundary[inverse], np.zeros(pad, bool)])

    # device-side table views (built lazily, cached).  ensure_compile_time
    # _eval: a first touch from inside a jit trace must still produce a
    # real device array, not a leaked tracer-backed constant.
    def _dev(self, name):
        import jax
        import jax.numpy as jnp

        key = "_dev_" + name
        if not hasattr(self, key):
            with jax.ensure_compile_time_eval():
                setattr(self, key, jnp.asarray(getattr(self, name)))
        return getattr(self, key)

    def expand(self, u):
        """flat dof vector [n_dofs] -> bp vector [M_pad] (consistent)."""
        import jax.numpy as jnp

        x = jnp.take(u, self._dev("inverse"), axis=0)
        return self.pad_tail(x)

    def pad_tail(self, x):
        """append the shardability zero tail (no-op when M_pad == M)."""
        import jax.numpy as jnp

        if self.M_pad == self.M:
            return x
        return jnp.concatenate([x, jnp.zeros(self.M_pad - self.M, x.dtype)])

    def collapse(self, x):
        """consistent bp vector [M_pad] -> flat dof vector [n_dofs]."""
        import jax.numpy as jnp

        return jnp.zeros(self.grid.n_dofs, x.dtype).at[
            self._dev("inverse")].set(x[:self.M])

    def seam_sum(self, y):
        """Sum duplicate copies of every shared dof and write the sum back
        to each copy: the O(surface) continuity fix-up after per-block
        additive scatters."""
        import jax

        src = self._dev("dup_src")
        seg = self._dev("dup_seg")
        sums = jax.ops.segment_sum(y[src], seg, num_segments=self.n_seg,
                                   indices_are_sorted=True)
        return y.at[src].set(sums[seg])

    def blocks(self, x):
        """bp vector -> list of per-block node-grid views (reshape only)."""
        out = []
        for bi, shp in enumerate(self.node_shapes):
            o = self.offsets[bi]
            n = int(np.prod(shp))
            out.append(x[o:o + n].reshape(shp))
        return out

    def concat(self, blocks):
        import jax.numpy as jnp

        return jnp.concatenate([b.reshape(-1) for b in blocks])
