"""Laplace operator on adaptively refined (hanging-node) 2-D meshes.

The TPU shape of deal.II's "constraints folded into the access" idea
(/root/reference/common/vector_access_reduced.h:176-179 reads constrained
dofs as zero; here they are read as their INTERPOLATION): every cell-local
node is a short (dof, weight) list, so the constrained operator
``C^T A_loc C`` (cf. poisson_l's AffineConstraints use,
/root/reference/poisson_l/program.cc:232-243) is

    weighted gather  ->  ONE batched dense-element matmul  ->  weighted
    scatter-add,

with no per-constraint control flow.  In 2-D the element stiffness is
scale-free, so cells of ALL refinement levels share the same [N, N] matrix
and batch together on the MXU.
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
        self.n = n
        N = n * n
        self.N = N
        # local index (iy, ix) -> iy*n + ix; stiffness on any square cell
        K = np.kron(b.L, b.M) + np.kron(b.M, b.L)
        self.Kmat = jnp.asarray(K.T, dtype)     # y = u_loc @ K^T (K symmetric)
        self.S = jnp.asarray(b.S, dtype)
        self.D = jnp.asarray(b.D, dtype)
        self.gidx = jnp.asarray(grid.gidx)
        self.gw = jnp.asarray(grid.gw, dtype)
        self.interior = jnp.asarray(~grid.boundary)
        self.cell_h = jnp.asarray(grid.cell_h, dtype)
        w2 = np.outer(b.quad_weights, b.quad_weights).reshape(-1)
        self.w2d = jnp.asarray(w2, dtype)

        # exact diagonal of C^T A_loc C, assembled host-side at setup
        diag = np.zeros(grid.n_dofs)
        Kd = K
        C, Ncells = grid.n_cells, N
        gi, gwt = grid.gidx, grid.gw
        for k in range(grid.K):
            for k2 in range(grid.K):
                # pairs (i,k),(j,k2) landing on the same dof
                same = gi[:, :, None, k] == gi[:, None, :, k2]
                contrib = (gwt[:, :, None, k] * gwt[:, None, :, k2]
                           * Kd[None, :, :]) * same
                np.add.at(diag, gi[:, :, k],
                          contrib.sum(axis=2))
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
        return self.scatter(y)

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
        """Physical quadrature coordinates, [C, N, 2] (host)."""
        g = self.grid
        qp = g.basis.quad_points
        C = g.n_cells
        out = np.empty((C, self.n, self.n, 2))
        for ci, c in enumerate(g.cells):
            h = g.forest.h(c.level)
            x0, y0 = g.forest.cell_corner(c)
            out[ci, :, :, 0] = (x0 + h * qp)[None, :]
            out[ci, :, :, 1] = (y0 + h * qp)[:, None]
        return out.reshape(C, self.N, 2)

    def _to_quad(self, w):
        """[C, N] nodal -> values at quad grid [C, n, n]."""
        w = w.reshape(-1, self.n, self.n)
        w = jnp.einsum("cab,qb->caq", w, self.S)
        return jnp.einsum("caq,pa->cpq", w, self.S)

    def _from_quad_t(self, w):
        w = jnp.einsum("cpq,pa->caq", w, self.S)
        w = jnp.einsum("caq,qb->cab", w, self.S)
        return w.reshape(-1, self.N)

    def compute_rhs(self, f_quad: jnp.ndarray, u_bc: jnp.ndarray) -> jnp.ndarray:
        """b = M f - A u_bc, zero on Dirichlet rows.  ``f_quad``: [C, N]
        values at quad points; ``u_bc``: real-dof vector with boundary
        values."""
        jxw = self.w2d * (self.cell_h[:, None] ** 2)
        fv = self._from_quad_t((f_quad.astype(self.dtype) * jxw)
                               .reshape(-1, self.n, self.n))
        w = self.gather(u_bc.astype(self.dtype))
        au = jnp.dot(w, self.Kmat, precision=jax.lax.Precision.HIGHEST)
        b = self.scatter(fv - au)
        return jnp.where(self.interior, b, 0)

    def l2_error(self, u: jnp.ndarray, exact_quad: jnp.ndarray) -> float:
        uq = self._to_quad(self.gather(u)).reshape(-1, self.N)
        jxw = self.w2d * (self.cell_h[:, None] ** 2)
        err = jnp.sum((uq - exact_quad) ** 2 * jxw)
        vol = jnp.sum(jnp.broadcast_to(jxw, uq.shape))
        return jnp.sqrt(err / vol)

    def gradients_quad(self, u: jnp.ndarray):
        """Physical gradients at the quad grid, ([C,n,n], [C,n,n])."""
        w = self.gather(u).reshape(-1, self.n, self.n)
        vq = jnp.einsum("cab,qb->caq", w, self.S)
        vq = jnp.einsum("caq,pa->cpq", vq, self.S)   # values [C, qy, qx]
        wx = jnp.einsum("cab,qb->caq", w, self.D)
        gx = jnp.einsum("caq,pa->cpq", wx, self.S)
        wy = jnp.einsum("cab,qb->caq", w, self.S)
        gy = jnp.einsum("caq,pa->cpq", wy, self.D)
        h = self.cell_h[:, None, None]
        return gx / h, gy / h

    def h1_seminorm_error(self, u, grad_exact_quad):
        gx, gy = self.gradients_quad(u)
        jxw = (self.w2d.reshape(1, self.n, self.n)
               * (self.cell_h[:, None, None] ** 2))
        ex, ey = grad_exact_quad
        err = jnp.sum((gx - ex) ** 2 * jxw) + jnp.sum((gy - ey) ** 2 * jxw)
        return jnp.sqrt(err)


class KellyEstimator:
    """Face-jump indicator eta_K^2 = sum_{F in dK} h_F/24 int_F [du/dn]^2
    over the forest, including 2:1 coarse|fine faces (the role of
    KellyErrorEstimator at /root/reference/poisson_l/program.cc:527-533)."""

    def __init__(self, op: AdaptiveLaplace):
        self.op = op
        g = op.grid
        b = g.basis
        n = g.n
        qp = b.quad_points
        self.f0 = jnp.asarray(lagrange_values(qp, np.array([0.0]))[0], op.dtype)
        self.f1 = jnp.asarray(lagrange_values(qp, np.array([1.0]))[0], op.dtype)
        # interpolation of a coarse-face trace (quad-point basis) to the
        # quad points of child half s: positions (s + qp) / 2
        self.H = [jnp.asarray(lagrange_values(qp, (s + qp) / 2.0), op.dtype)
                  for s in (0, 1)]
        self.wq = jnp.asarray(b.quad_weights, op.dtype)

        # face lists (host, setup-only)
        same, cf = [], []
        for ci, c in enumerate(g.cells):
            for d in (0, 1):
                kind, nb = g.forest.find_active_neighbor(c, d, 1)
                if kind == "same":
                    same.append((ci, g.cell_index[nb], d))
                # coarse|fine faces are collected from the FINE side only
                kind0, nb0 = g.forest.find_active_neighbor(c, d, 0)
                if kind0 == "coarse":
                    half = (c.iy if d == 0 else c.ix) % 2
                    cf.append((ci, g.cell_index[nb0], d, 0, half))
                if kind == "coarse":
                    half = (c.iy if d == 0 else c.ix) % 2
                    cf.append((ci, g.cell_index[nb], d, 1, half))
        self.same = np.asarray(same, np.int32).reshape(-1, 3)
        self.cf = np.asarray(cf, np.int32).reshape(-1, 5)

    def __call__(self, u) -> np.ndarray:
        op = self.op
        g = op.grid
        n = op.n
        gx, gy = op.gradients_quad(u)
        gq = [gx, gy]
        eta2 = np.zeros(g.n_cells)
        h_cell = np.asarray(g.cell_h)

        def trace(a, d, side):
            f = self.f1 if side else self.f0
            # d = face normal axis: 0 -> contract x (last), 1 -> contract y
            return jnp.einsum("cpq,q->cp", a, f) if d == 0 else \
                   jnp.einsum("cpq,p->cq", a, f)

        for d in (0, 1):
            tr1 = trace(gq[d], d, 1)
            tr0 = trace(gq[d], d, 0)
            if self.same.size:
                m = self.same[self.same[:, 2] == d]
                if m.size:
                    jmp = tr1[m[:, 0]] - tr0[m[:, 1]]
                    h = h_cell[m[:, 0]]
                    integ = np.asarray(jnp.sum(jmp**2 * self.wq, axis=1)) * h
                    contrib = h / 24.0 * integ
                    np.add.at(eta2, m[:, 0], contrib)
                    np.add.at(eta2, m[:, 1], contrib)
            if self.cf.size:
                m = self.cf[self.cf[:, 2] == d]
                for s_fine in (0, 1):
                    for half in (0, 1):
                        mm = m[(m[:, 3] == s_fine) & (m[:, 4] == half)]
                        if not mm.size:
                            continue
                        fine_tr = (tr1 if s_fine else tr0)[mm[:, 0]]
                        coarse_tr = (tr0 if s_fine else tr1)[mm[:, 1]]
                        coarse_at_fine = jnp.einsum(
                            "cq,pq->cp", coarse_tr, self.H[half]
                        )
                        jmp = fine_tr - coarse_at_fine
                        h = h_cell[mm[:, 0]]
                        integ = np.asarray(jnp.sum(jmp**2 * self.wq, axis=1)) * h
                        contrib = h / 24.0 * integ
                        np.add.at(eta2, mm[:, 0], contrib)
                        np.add.at(eta2, mm[:, 1], contrib)
        return eta2
