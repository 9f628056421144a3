"""Adaptive quadtree mesh with hanging-node constraints (2-D).

TPU-native replacement for the p4est + AffineConstraints + SolutionTransfer
machinery the reference's poisson_l uses
(/root/reference/poisson_l/program.cc:232-243, 504-543):

* a forest of active cells ``(level, ix, iy)`` on a square root lattice with
  a domain mask (the L-domain drops the first-quadrant root cell), 2:1
  balanced, with ``refine_and_coarsen_fixed_number`` execution;
* FE_Q(p) dofs identified by robust coordinate hashing; hanging nodes on
  2:1 faces are eliminated at setup: every cell-local node becomes a short
  (dof, weight) list, so the constrained operator C^T A_loc C is just
  weighted-gather -> batched cell matmul -> weighted scatter-add — no
  runtime constraint pass at all (the TPU analogue of
  vector_access_reduced.h's "constraints inside the index table" idea);
* nested-mesh interpolation between AMR cycles (deal.II SolutionTransfer +
  MGTransferGlobalCoarsening): each dof of the fine mesh is a point
  evaluation of the coarse mesh — one gather matrix per mesh pair.

Cells are axis-aligned squares: level l has size h = L0 / 2^l.  In 2-D the
element stiffness is scale-invariant, so ALL active cells — any level —
batch into a single dense-element matmul.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from ..core.basis import Basis1D, make_basis


@dataclass(frozen=True)
class Cell:
    level: int
    ix: int
    iy: int

    def children(self):
        x, y = 2 * self.ix, 2 * self.iy
        return [Cell(self.level + 1, x + dx, y + dy)
                for dy in (0, 1) for dx in (0, 1)]

    @property
    def parent(self):
        return Cell(self.level - 1, self.ix // 2, self.iy // 2)


class QuadForest:
    """Active-cell set over a ``root x root`` base lattice on
    ``[origin, origin+extent]^2`` with an optional root mask."""

    def __init__(self, root_cells: int = 2, origin: float = -1.0,
                 extent: float = 2.0, active=None,
                 root_mask=None):
        self.root_cells = root_cells
        self.origin = origin
        self.extent = extent
        if active is not None:
            self.active = set(active)
        else:
            self.active = set()
            for iy in range(root_cells):
                for ix in range(root_cells):
                    if root_mask is None or root_mask(ix, iy):
                        self.active.add(Cell(0, ix, iy))

    # ------------------------------------------------------------ geometry
    def h(self, level: int) -> float:
        return self.extent / (self.root_cells * (1 << level))

    def cell_corner(self, c: Cell):
        h = self.h(c.level)
        return (self.origin + c.ix * h, self.origin + c.iy * h)

    # ----------------------------------------------------------- structure
    def exists(self, c: Cell) -> bool:
        return c in self.active

    def _covered(self, c: Cell) -> bool:
        """True if c or an ancestor is active (c's region is resolved at a
        coarser-or-equal level)."""
        while c.level >= 0:
            if c in self.active:
                return True
            c = c.parent
        return False

    def neighbor(self, c: Cell, d: int, side: int):
        """Neighbor cell coordinates at the same level (may not be active)."""
        n = self.root_cells << c.level
        dx = (1 if side else -1) if d == 0 else 0
        dy = (1 if side else -1) if d == 1 else 0
        ix, iy = c.ix + dx, c.iy + dy
        if not (0 <= ix < n and 0 <= iy < n):
            return None
        return Cell(c.level, ix, iy)

    @property
    def ancestors(self):
        """Set of all strict ancestors of active cells (regions that are
        refined).  Forests are immutable after construction; cached."""
        anc = self.__dict__.get("_anc")
        if anc is None:
            anc = set()
            for a in self.active:
                q = a.parent
                while q.level >= 0 and q not in anc:
                    anc.add(q)
                    q = q.parent
            self.__dict__["_anc"] = anc
        return anc

    def find_active_neighbor(self, c: Cell, d: int, side: int):
        """Returns (kind, cell(s)): ('same', cell), ('coarse', ancestor),
        ('fine', [children on the shared face]) or ('boundary', None) —
        regions outside the (masked) domain read as boundary."""
        nb = self.neighbor(c, d, side)
        if nb is None:
            return ("boundary", None)
        if nb in self.active:
            return ("same", nb)
        # coarser?
        a = nb.parent
        while a.level >= 0:
            if a in self.active:
                return ("coarse", a)
            a = a.parent
        if nb not in self.ancestors:
            return ("boundary", None)   # void region (e.g. the L's quadrant)
        # finer: the two children of nb touching the shared face
        out = []
        face_side = 1 - side  # children's face facing back to c
        for k in nb.children():
            on_face = (k.ix % 2 == face_side) if d == 0 else (k.iy % 2 == face_side)
            if not on_face:
                continue
            if k not in self.active:
                # deeper than one level is excluded by 2:1 balance
                raise AssertionError("forest not 2:1 balanced")
            out.append(k)
        return ("fine", out)

    # ----------------------------------------------------------- refinement
    def balanced_copy(self) -> "QuadForest":
        """Enforce 2:1 face balance by refining offending coarse cells.

        Uses the ancestor set: ``q in anc`` iff an active cell lies STRICTLY
        below q, so "neighbor refined >= 2 levels deeper across this face"
        is: a shared-face child of the neighbor is itself in ``anc``.
        """
        active = set(self.active)
        while True:
            anc = set()
            for a in active:
                q = a.parent
                while q.level >= 0:
                    if q in anc:
                        break
                    anc.add(q)
                    q = q.parent
            to_refine = set()
            for c in active:
                n = self.root_cells << c.level
                for d in (0, 1):
                    for side in (0, 1):
                        dx = (1 if side else -1) if d == 0 else 0
                        dy = (1 if side else -1) if d == 1 else 0
                        ix, iy = c.ix + dx, c.iy + dy
                        if not (0 <= ix < n and 0 <= iy < n):
                            continue
                        nb = Cell(c.level, ix, iy)
                        if nb not in anc:
                            continue
                        face_side = 1 - side
                        for k in nb.children():
                            on_face = ((k.ix % 2 == face_side) if d == 0
                                       else (k.iy % 2 == face_side))
                            if on_face and k in anc:
                                to_refine.add(c)
            if not to_refine:
                break
            for c in to_refine:
                active.discard(c)
                active.update(c.children())
        return QuadForest(self.root_cells, self.origin, self.extent,
                          active=active)

    def refine(self, marks_refine, marks_coarsen=()) -> "QuadForest":
        """Execute refinement/coarsening marks; returns a balanced forest
        (deal.II refine_and_coarsen + execute, program.cc:533-540)."""
        marks_refine = set(marks_refine)
        marks_coarsen = set(marks_coarsen) - marks_refine
        active = set(self.active)
        for c in marks_refine:
            if c in active:
                active.discard(c)
                active.update(c.children())
        # coarsen only complete sibling groups, none refined this round
        by_parent = {}
        for c in marks_coarsen:
            if c in active and c.level > 0:
                by_parent.setdefault(c.parent, []).append(c)
        for parent, kids in by_parent.items():
            if len(kids) == 4:
                for k in kids:
                    active.discard(k)
                active.add(parent)
        f = QuadForest(self.root_cells, self.origin, self.extent, active=active)
        return f.balanced_copy()

    def uniform_refine(self) -> "QuadForest":
        return self.refine(list(self.active))

    def coarsen_global(self) -> "QuadForest":
        """One global h-coarsening step (deal.II MGTransferGlobalCoarsening
        ladder): every active cell is replaced by its parent, overlaps are
        resolved toward the finer cell, and the result is re-balanced.  The
        output mesh is nested in ``self``."""
        work = set()
        for c in self.active:
            work.add(c.parent if c.level > 0 else c)
        # candidates may overlap (an ancestor of a finer candidate); split
        # offending coarse candidates into children until the set is a
        # partition — splitting (not dropping) preserves coverage of the
        # sibling regions and stays nested in ``self``
        while True:
            anc = set()
            for c in work:
                q = c.parent
                while q.level >= 0 and q not in anc:
                    anc.add(q)
                    q = q.parent
            offending = [c for c in work if c in anc]
            if not offending:
                break
            for c in offending:
                work.discard(c)
                work.update(c.children())
        f = QuadForest(self.root_cells, self.origin, self.extent, active=work)
        return f.balanced_copy()

    @property
    def n_cells(self) -> int:
        return len(self.active)

    def sorted_cells(self):
        return sorted(self.active, key=lambda c: (c.level, c.iy, c.ix))


class AdaptiveGrid:
    """FE_Q(p) dof layout on a QuadForest: unique dofs, hanging constraints
    folded into per-cell (index, weight) gathers, Dirichlet mask."""

    def __init__(self, forest: QuadForest, degree: int, boundary_fn):
        self.forest = forest
        self.degree = degree
        self.basis: Basis1D = make_basis(degree)
        p = degree
        n = p + 1
        self.n = n
        cells = forest.sorted_cells()
        self.cells = cells
        self.cell_index = {c: i for i, c in enumerate(cells)}
        nodes1 = self.basis.nodes  # on [0,1]

        # ---- 1. all cell-local node coordinates, robust dedup
        C = len(cells)
        coords = np.empty((C, n, n, 2))
        for ci, c in enumerate(cells):
            h = forest.h(c.level)
            x0, y0 = forest.cell_corner(c)
            xs = x0 + h * nodes1
            ys = y0 + h * nodes1
            coords[ci, :, :, 0] = xs[None, :]
            coords[ci, :, :, 1] = ys[:, None]
        flat = coords.reshape(-1, 2)
        from . import native

        scale = np.abs(flat).max() + 1.0
        n_nodes, inverse = native.unique_nodes(flat, 1e-12 * scale)
        cell_nodes = inverse.reshape(C, n * n)   # local (iy, ix) lex order
        node_xy = np.zeros((n_nodes, 2))
        node_xy[inverse] = flat

        # ---- 2. hanging constraints: fine-face nodes on a coarser neighbor
        # constraint: node -> list[(master_node, weight)]
        constraints = {}
        for ci, c in enumerate(cells):
            loc = cell_nodes[ci].reshape(n, n)
            for d in (0, 1):
                for side in (0, 1):
                    kind, nb = forest.find_active_neighbor(c, d, side)
                    if kind != "coarse":
                        continue
                    nbi = self.cell_index[nb]
                    nb_loc = cell_nodes[nbi].reshape(n, n)
                    # fine face nodes (along the face) of c
                    if d == 0:
                        fine_ids = loc[:, -1 if side else 0]
                    else:
                        fine_ids = loc[-1 if side else 0, :]
                    # coarse face nodes of nb (facing back)
                    if d == 0:
                        coarse_ids = nb_loc[:, 0 if side else -1]
                    else:
                        coarse_ids = nb_loc[0 if side else -1, :]
                    # parametric positions of fine nodes on the coarse face
                    t = d ^ 1  # tangential axis
                    hf = forest.h(c.level)
                    hc = forest.h(nb.level)
                    x0f = forest.cell_corner(c)[t]
                    x0c = forest.cell_corner(nb)[t]
                    pos = (x0f + hf * nodes1 - x0c) / hc
                    W = self._lagrange_at(pos)   # [n fine nodes, n coarse]
                    for a in range(n):
                        fid = fine_ids[a]
                        if fid in constraints:
                            continue
                        if any(fid == m for m in coarse_ids):
                            continue  # coincides with a coarse node
                        constraints[fid] = [
                            (int(coarse_ids[m]), float(W[a, m]))
                            for m in range(n) if abs(W[a, m]) > 1e-14
                        ]
        # resolve chains (a master may itself be constrained)
        def resolve(nid, depth=0):
            if nid not in constraints or depth > 4:
                return [(nid, 1.0)]
            out = {}
            for m, w in constraints[nid]:
                for mm, ww in resolve(m, depth + 1):
                    out[mm] = out.get(mm, 0.0) + w * ww
            return list(out.items())

        resolved = {nid: resolve(nid) for nid in constraints}

        # ---- 3. renumber real dofs (unconstrained nodes)
        is_constrained = np.zeros(n_nodes, bool)
        for nid in resolved:
            is_constrained[nid] = True
        real_of_node = -np.ones(n_nodes, np.int64)
        real_ids = np.nonzero(~is_constrained)[0]
        real_of_node[real_ids] = np.arange(real_ids.size)
        self.n_dofs = int(real_ids.size)
        self.dof_xy = node_xy[real_ids]

        # ---- 4. per-cell weighted gather tables [C, N, K]
        per_node = []
        Kmax = 1
        for ci in range(C):
            row = []
            for nid in cell_nodes[ci]:
                if is_constrained[nid]:
                    lst = [(int(real_of_node[m]), w) for m, w in resolved[nid]]
                else:
                    lst = [(int(real_of_node[nid]), 1.0)]
                Kmax = max(Kmax, len(lst))
                row.append(lst)
            per_node.append(row)
        N = n * n
        self.K = Kmax
        self.gidx = np.zeros((C, N, Kmax), np.int32)
        self.gw = np.zeros((C, N, Kmax))
        for ci in range(C):
            for i in range(N):
                for k, (m, w) in enumerate(per_node[ci][i]):
                    self.gidx[ci, i, k] = m
                    self.gw[ci, i, k] = w

        # ---- 5. Dirichlet mask on real dofs
        self.boundary = np.asarray(boundary_fn(self.dof_xy), bool)
        self.n_cells = C
        self.cell_levels = np.array([c.level for c in cells])
        self.cell_h = np.array([forest.h(c.level) for c in cells])
        self.n_constraints = int(is_constrained.sum())

    def _lagrange_at(self, pts):
        """1-D Lagrange basis (grid nodes) evaluated at ``pts``."""
        nodes = self.basis.nodes
        n = nodes.size
        out = np.ones((len(pts), n))
        for j in range(n):
            for m in range(n):
                if m != j:
                    out[:, j] *= (pts - nodes[m]) / (nodes[j] - nodes[m])
        return out

    # -------------------------------------------------- nested-mesh gather
    def point_eval_table(self, coarse: "AdaptiveGrid"):
        """Gather table (idx [nd, K2], w) evaluating the coarse-mesh FE
        function at every real dof position of THIS grid (SolutionTransfer /
        global-coarsening prolongation; meshes must be nested)."""
        n = self.n
        nodes1 = self.basis.nodes
        f = coarse.forest
        idx_rows, w_rows = [], []
        K2 = 0
        for xy in self.dof_xy:
            c = self._locate(f, xy)
            ci = coarse.cell_index[c]
            h = f.h(c.level)
            x0, y0 = f.cell_corner(c)
            px = (xy[0] - x0) / h
            py = (xy[1] - y0) / h
            wx = coarse._lagrange_at(np.array([px]))[0]
            wy = coarse._lagrange_at(np.array([py]))[0]
            entries = {}
            gi = coarse.gidx[ci].reshape(n, n, coarse.K)
            gw = coarse.gw[ci].reshape(n, n, coarse.K)
            for a in range(n):
                if abs(wy[a]) < 1e-14:
                    continue
                for b in range(n):
                    if abs(wx[b]) < 1e-14:
                        continue
                    for k in range(coarse.K):
                        w = wy[a] * wx[b] * gw[a, b, k]
                        if abs(w) < 1e-14:
                            continue
                        m = int(gi[a, b, k])
                        entries[m] = entries.get(m, 0.0) + w
            items = list(entries.items())
            K2 = max(K2, len(items))
            idx_rows.append([m for m, _ in items])
            w_rows.append([w for _, w in items])
        nd = len(idx_rows)
        idx = np.zeros((nd, K2), np.int32)
        w = np.zeros((nd, K2))
        for r in range(nd):
            for k, (m, ww) in enumerate(zip(idx_rows[r], w_rows[r])):
                idx[r, k] = m
                w[r, k] = ww
        return idx, w

    @staticmethod
    def _locate(forest: QuadForest, xy):
        """Active cell containing the point (ties resolved toward lower
        index; points are dof coordinates of a NESTED finer mesh)."""
        eps = 1e-12 * (abs(forest.extent) + 1)
        for lvl in range(0, 40):
            h = forest.h(lvl)
            nmax = forest.root_cells << lvl
            ix = min(int((xy[0] - forest.origin + eps) / h), nmax - 1)
            iy = min(int((xy[1] - forest.origin + eps) / h), nmax - 1)
            # nudge off cell boundaries: try the containing candidates
            for jx in (ix, ix - 1):
                for jy in (iy, iy - 1):
                    if jx < 0 or jy < 0:
                        continue
                    c = Cell(lvl, jx, jy)
                    if c in forest.active:
                        x0, y0 = forest.cell_corner(c)
                        if (x0 - eps <= xy[0] <= x0 + h + eps
                                and y0 - eps <= xy[1] <= y0 + h + eps):
                            return c
        raise KeyError(f"point {xy} not in forest")
