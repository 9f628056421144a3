"""Laplace operator on adaptively refined (hanging-node) meshes, 2-D/3-D.

The TPU shape of deal.II's "constraints folded into the access" idea
(/root/reference/common/vector_access_reduced.h:176-179 reads constrained
dofs as zero; here they are read as their INTERPOLATION): every cell-local
node is a short (dof, weight) list, so the constrained operator
``C^T A_loc C`` (cf. poisson_l's AffineConstraints use,
/root/reference/poisson_l/program.cc:232-243) is

    weighted gather  ->  ONE batched dense-element matmul  ->  weighted
    scatter-add,

with no per-constraint control flow.  Cells of ALL refinement levels share
one reference [N, N] stiffness and batch together on the MXU; the physical
element matrix is ``h^(dim-2) * K_ref`` (scale-free in 2-D, a per-cell
scalar in 3-D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quadrature import lagrange_values
from ..mesh.adaptive import AdaptiveGrid


class AdaptiveLaplace:
    def __init__(self, grid: AdaptiveGrid, dtype=jnp.float32):
        self.grid = grid
        self.dtype = dtype
        b = grid.basis
        n = grid.n
        dim = grid.dim
        self.n = n
        self.dim = dim
        N = n ** dim
        self.N = N
        # local flat order kron(A_{dim-1}, ..., A_0) (slowest local axis =
        # highest coordinate); reference-cell stiffness, scale factor
        # h^(dim-2) applied per cell
        K = np.zeros((N, N))
        for d in range(dim):
            mat = np.array([[1.0]])
            for e in range(dim - 1, -1, -1):
                mat = np.kron(mat, b.L if e == d else b.M)
            K += mat
        self.Kref = K
        self.Kmat = jnp.asarray(K.T, dtype)     # y = u_loc @ K^T (K symmetric)
        self.S = jnp.asarray(b.S, dtype)
        self.D = jnp.asarray(b.D, dtype)
        self.gidx = jnp.asarray(grid.gidx)
        self.gw = jnp.asarray(grid.gw, dtype)
        self.interior = jnp.asarray(~grid.boundary)
        self.cell_h = jnp.asarray(grid.cell_h, dtype)
        # h^(dim-2): the stiffness scale of a cube cell
        self.cell_scale = jnp.asarray(grid.cell_h ** (dim - 2), dtype)
        wnd = np.array([1.0])
        for _ in range(dim):
            wnd = np.kron(wnd, b.quad_weights)
        self.wnd = jnp.asarray(wnd, dtype)      # [N] tensor quad weights

        # exact diagonal of C^T A_loc C, assembled host-side at setup
        # (chunked over cells to bound the [chunk, N, N] temporaries)
        diag = np.zeros(grid.n_dofs)
        gi, gwt = grid.gidx, grid.gw
        scale = grid.cell_h ** (dim - 2)
        C = grid.n_cells
        chunk = max(1, 2_000_000 // (N * N))
        for c0 in range(0, C, chunk):
            c1 = min(C, c0 + chunk)
            gi_c, gw_c = gi[c0:c1], gwt[c0:c1]
            sc = scale[c0:c1, None]
            for k in range(grid.K):
                for k2 in range(grid.K):
                    same = gi_c[:, :, None, k] == gi_c[:, None, :, k2]
                    contrib = (gw_c[:, :, None, k] * gw_c[:, None, :, k2]
                               * K[None, :, :]) * same
                    np.add.at(diag, gi_c[:, :, k],
                              contrib.sum(axis=2) * sc)
        diag[grid.boundary] = 1.0
        self.inv_diag_arr = jnp.asarray(1.0 / diag, dtype)

    # ------------------------------------------------------ gather/scatter
    def gather(self, u: jnp.ndarray) -> jnp.ndarray:
        """[n_dofs] -> [C, N] cell-local values through the constraints."""
        vals = u[self.gidx]                      # [C, N, K]
        return jnp.sum(vals * self.gw, axis=-1)

    def scatter(self, y: jnp.ndarray) -> jnp.ndarray:
        """Adjoint of gather: weighted add into real dofs."""
        out = jnp.zeros(self.grid.n_dofs, y.dtype)
        return out.at[self.gidx].add(y[:, :, None] * self.gw)

    # --------------------------------------------------------------- vmult
    def apply_cells(self, u: jnp.ndarray) -> jnp.ndarray:
        w = self.gather(u)
        y = jnp.dot(w, self.Kmat, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=w.dtype)
        return self.scatter(y * self.cell_scale[:, None])

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        xm = jnp.where(self.interior, src, 0)
        y = self.apply_cells(xm)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs, lhs):
        xm = jnp.where(self.interior, lhs, 0)
        y = self.apply_cells(xm)
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    def inverse_diagonal(self) -> jnp.ndarray:
        return self.inv_diag_arr

    # ------------------------------------------------------------ rhs / L2
    def quad_points(self) -> np.ndarray:
        """Physical quadrature coordinates, [C, N, dim] (host)."""
        g = self.grid
        qp = g.basis.quad_points
        dim = self.dim
        n = self.n
        C = g.n_cells
        corners = np.array([g.forest.cell_corner(c) for c in g.cells])
        out = np.empty((C, self.N, dim))
        for d in range(dim):
            shape = [1] * dim
            shape[dim - 1 - d] = n
            local = np.broadcast_to(qp.reshape(shape), (n,) * dim).reshape(-1)
            out[:, :, d] = corners[:, None, d] + g.cell_h[:, None] * local[None, :]
        return out

    def _sweep(self, w, mats):
        """Apply 1-D matrix mats[d] to local axis of coordinate d for all d
        (w: [C, n, ..., n] with slowest local axis = coordinate dim-1)."""
        dim = self.dim
        for d in range(dim):
            axis = 1 + (dim - 1 - d)
            nd = w.ndim
            subs_in = list(range(nd))
            subs_out = list(subs_in)
            subs_out[axis] = nd
            w = jnp.einsum(w, subs_in, mats[d], [nd, axis], subs_out)
        return w

    def _to_quad(self, w):
        """[C, N] nodal -> values at the tensor quad grid [C, n, ..., n]."""
        w = w.reshape((-1,) + (self.n,) * self.dim)
        return self._sweep(w, [self.S] * self.dim)

    def _from_quad_t(self, w):
        w = self._sweep(w, [self.S.T] * self.dim)
        return w.reshape(-1, self.N)

    def jxw(self):
        """[C, N] quadrature weight times cell volume scale."""
        return self.wnd[None, :] * (self.cell_h[:, None] ** self.dim)

    def compute_rhs(self, f_quad: jnp.ndarray, u_bc: jnp.ndarray) -> jnp.ndarray:
        """b = M f - A u_bc, zero on Dirichlet rows.  ``f_quad``: [C, N]
        values at quad points; ``u_bc``: real-dof vector with boundary
        values."""
        fv = self._from_quad_t(
            (f_quad.astype(self.dtype) * self.jxw())
            .reshape((-1,) + (self.n,) * self.dim))
        w = self.gather(u_bc.astype(self.dtype))
        au = jnp.dot(w, self.Kmat, precision=jax.lax.Precision.HIGHEST)
        au = au * self.cell_scale[:, None]
        b = self.scatter(fv - au)
        return jnp.where(self.interior, b, 0)

    def l2_error(self, u: jnp.ndarray, exact_quad: jnp.ndarray) -> float:
        uq = self._to_quad(self.gather(u)).reshape(-1, self.N)
        jxw = self.jxw()
        err = jnp.sum((uq - exact_quad) ** 2 * jxw)
        vol = jnp.sum(jnp.broadcast_to(jxw, uq.shape))
        return jnp.sqrt(err / vol)

    def gradients_quad(self, u: jnp.ndarray):
        """Physical gradients at the quad grid, dim arrays [C, n, ..., n]."""
        w = self.gather(u).reshape((-1,) + (self.n,) * self.dim)
        out = []
        h = self.cell_h.reshape((-1,) + (1,) * self.dim)
        for d in range(self.dim):
            mats = [self.D if e == d else self.S for e in range(self.dim)]
            out.append(self._sweep(w, mats) / h)
        return out

    def h1_seminorm_error(self, u, grad_exact_quad):
        g = self.gradients_quad(u)
        jxw = self.jxw().reshape((-1,) + (self.n,) * self.dim)
        err = 0.0
        for d in range(self.dim):
            err = err + jnp.sum((g[d] - grad_exact_quad[d]) ** 2 * jxw)
        return jnp.sqrt(err)


class KellyEstimator:
    """Face-jump indicator eta_K^2 = sum_{F in dK} h_F/24 int_F [du/dn]^2
    over the forest, including 2:1 coarse|fine faces (the role of
    KellyErrorEstimator at /root/reference/poisson_l/program.cc:527-533).
    Works in 2-D (line faces) and 3-D (square faces; coarse faces split
    into 4 child quadrants)."""

    def __init__(self, op: AdaptiveLaplace):
        self.op = op
        g = op.grid
        b = g.basis
        dim = op.dim
        self.dim = dim
        qp = b.quad_points
        self.f0 = jnp.asarray(lagrange_values(qp, np.array([0.0]))[0], op.dtype)
        self.f1 = jnp.asarray(lagrange_values(qp, np.array([1.0]))[0], op.dtype)
        # interpolation of a coarse-face trace (quad-point basis) to the
        # quad points of child half s along one tangential axis
        self.H = [jnp.asarray(lagrange_values(qp, (s + qp) / 2.0), op.dtype)
                  for s in (0, 1)]
        wq = b.quad_weights
        wf = np.array([1.0])
        for _ in range(dim - 1):
            wf = np.kron(wf, wq)
        self.wf = jnp.asarray(wf, op.dtype)     # face quad weights [n^(dim-1)]

        # face lists (host, setup-only).  Same-level faces from the lower
        # side; coarse|fine pairs from the fine side with the fine cell's
        # quadrant index per tangential axis (high coord first, matching
        # the local trace layout).
        same, cf = [], []
        for ci, c in enumerate(g.cells):
            for d in range(dim):
                tang = [e for e in range(dim - 1, -1, -1) if e != d]
                kind, nb = g.forest.find_active_neighbor(c, d, 1)
                if kind == "same":
                    same.append((ci, g.cell_index[nb], d))
                for side in (0, 1):
                    k2, nb2 = g.forest.find_active_neighbor(c, d, side)
                    if k2 == "coarse":
                        halves = [c.coords[e] % 2 for e in tang]
                        cf.append((ci, g.cell_index[nb2], d, side, *halves))
        self.same = np.asarray(same, np.int32).reshape(-1, 3)
        self.cf = np.asarray(cf, np.int32).reshape(-1, 3 + dim)

    def _trace(self, a, d, side):
        """Trace of [C, n, ..., n] on the face with normal d, returning
        [C, n^(dim-1)] with tangential axes in local (slow-to-fast) order."""
        f = self.f1 if side else self.f0
        axis = 1 + (self.dim - 1 - d)
        nd = a.ndim
        subs_in = list(range(nd))
        subs_out = [s for s in subs_in if s != axis]
        t = jnp.einsum(a, subs_in, f, [axis], subs_out)
        return t.reshape(t.shape[0], -1)

    def __call__(self, u) -> np.ndarray:
        op = self.op
        g = op.grid
        n = op.n
        dim = self.dim
        gq = op.gradients_quad(u)
        eta2 = np.zeros(g.n_cells)
        h_cell = np.asarray(g.cell_h)
        # face measure = h^(dim-1); deal.II's weight h_F/24 multiplies it
        fpow = dim - 1

        for d in range(dim):
            tr1 = self._trace(gq[d], d, 1)
            tr0 = self._trace(gq[d], d, 0)
            if self.same.size:
                m = self.same[self.same[:, 2] == d]
                if m.size:
                    jmp = tr1[m[:, 0]] - tr0[m[:, 1]]
                    h = h_cell[m[:, 0]]
                    integ = np.asarray(jnp.sum(jmp**2 * self.wf, axis=1)
                                       ) * h**fpow
                    contrib = h / 24.0 * integ
                    np.add.at(eta2, m[:, 0], contrib)
                    np.add.at(eta2, m[:, 1], contrib)
            if self.cf.size:
                m = self.cf[self.cf[:, 2] == d]
                if not m.size:
                    continue
                # group by (side, halves): each combination has one
                # interpolation operator from the coarse face
                import itertools

                for s_fine in (0, 1):
                    for halves in itertools.product((0, 1), repeat=dim - 1):
                        sel = m[:, 3] == s_fine
                        for a_i, hv in enumerate(halves):
                            sel &= m[:, 4 + a_i] == hv
                        mm = m[sel]
                        if not mm.size:
                            continue
                        fine_tr = (tr1 if s_fine else tr0)[mm[:, 0]]
                        coarse_tr = (tr0 if s_fine else tr1)[mm[:, 1]]
                        # interpolate the coarse trace to the fine quads:
                        # tangential axes slow-to-fast, one H per axis
                        ct = coarse_tr.reshape((-1,) + (n,) * (dim - 1))
                        for a_i, hv in enumerate(halves):
                            axis = 1 + a_i
                            nd_ = ct.ndim
                            subs_in = list(range(nd_))
                            subs_out = list(subs_in)
                            subs_out[axis] = nd_
                            ct = jnp.einsum(ct, subs_in, self.H[hv],
                                            [nd_, axis], subs_out)
                        coarse_at_fine = ct.reshape(ct.shape[0], -1)
                        jmp = fine_tr - coarse_at_fine
                        h = h_cell[mm[:, 0]]
                        integ = np.asarray(jnp.sum(jmp**2 * self.wf, axis=1)
                                           ) * h**fpow
                        contrib = h / 24.0 * integ
                        np.add.at(eta2, mm[:, 0], contrib)
                        np.add.at(eta2, mm[:, 1], contrib)
        return eta2
