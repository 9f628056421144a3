"""Face-based SIP-DG Laplace operator: the independent verification oracle.

Mirror of the reference's ``MFReference::LaplaceOperatorFaceBased``
(/root/reference/common/laplace_operator_dg_face.h:19-166): a textbook
SIP-DG evaluation with a SEPARATE cell term and a loop over faces, each
interior face visited ONCE with contributions scattered to both adjacent
cells.  Structurally independent from the fused cell-centric operator
(ops/dg.py, which visits every face twice from the owning cell's
perspective), so sign, penalty, trace and lift errors cannot cancel the
same way in both — exactly the role the reference assigns it
(/root/reference/matvec_dg/program.cc:206-207: ``output -= reference;
print linfty``).

The implementation works at benchmark scale: it is matrix-free (batched
einsums over the block layout ``[C..., n...]``), unlike the dense-assembly
oracle in tests/dense_oracle.py which caps out at a few thousand dofs.

Bilinear form per interior face F with fixed normal n = +e_d of the minus
(left) cell:

    sigma [u][v] - {n.grad u}[v] - [u]{n.grad v},   [u] = u- - u+

Dirichlet boundary faces use the mirror convention ``u+ = -u-``,
``n.grad u+ = n.grad u-`` (laplace_operator_dg.h:1469-1485), penalty
``sigma = (p+1)^2 |n_unit J^{-1}|`` with penalty_factor 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dg_basis import GAUSS
from .dg import DGGrid


class DGLaplaceFaceBased:
    """SIP-DG A.u with a cell term plus a once-per-face loop."""

    def __init__(self, grid: DGGrid, dtype=jnp.float32):
        self.grid = grid
        self.dtype = dtype
        b = grid.basis
        dim = grid.dim
        n = grid.n
        self.dim, self.n = dim, n
        self.S = jnp.asarray(b.S, dtype)
        self.St = jnp.asarray(b.S.T, dtype)
        self.D = jnp.asarray(b.D_col, dtype)
        self.Dt = jnp.asarray(b.D_col.T, dtype)
        self.f = [jnp.asarray(b.f0, dtype), jnp.asarray(b.f1, dtype)]
        self.is_collocation = grid.kind == GAUSS

        J = grid.J
        Jinv = np.linalg.inv(J)
        detJ = float(abs(np.linalg.det(J)))
        G = Jinv @ Jinv.T
        self.Gsym = [[float(detJ * G[a, c]) for c in range(dim)] for a in range(dim)]
        self.facegeo = []
        for d in range(dim):
            r = Jinv.T[:, d]
            rn = np.linalg.norm(r)
            n_unit = r / rn
            self.facegeo.append(
                dict(
                    jxw=float(detJ * rn),
                    gvec=[float(v) for v in G[d] / rn],
                    sigma=float(n**2 * np.linalg.norm(n_unit @ Jinv)),
                )
            )
        qw = b.quad_weights
        w3 = np.ones((1,) * dim)
        for d in range(dim):
            s = [1] * dim
            s[d] = n
            w3 = w3 * qw.reshape(s)
        self.w3d = jnp.asarray(w3, dtype)
        self.wperp = []
        for d in range(dim):
            wp = np.ones((1,) * (dim - 1))
            k = 0
            for e in range(dim):
                if e == d:
                    continue
                s = [1] * (dim - 1)
                s[k] = n
                wp = wp * qw.reshape(s)
                k += 1
            self.wperp.append(jnp.asarray(wp, dtype))

    # ---------------------------------------------------------- 1-D helpers
    def _apply(self, u, M, d):
        axis = self.dim + d
        nd = u.ndim
        in_subs = list(range(nd))
        out_subs = list(range(nd))
        out_subs[axis] = nd
        return jnp.einsum(u, in_subs, M, [nd, axis], out_subs,
                          precision=jax.lax.Precision.HIGHEST)

    def _sweep(self, u, M):
        for d in range(self.dim):
            u = self._apply(u, M, d)
        return u

    def _trace(self, a, d, side):
        axis = self.dim + d
        nd = a.ndim
        in_subs = list(range(nd))
        out_subs = [i for i in range(nd) if i != axis]
        return jnp.einsum(a, in_subs, self.f[side], [axis], out_subs,
                          precision=jax.lax.Precision.HIGHEST)

    def _lift(self, t, d, side):
        axis = self.dim + d
        vec = self.f[side].reshape(
            (1,) * axis + (self.n,) + (1,) * (self.dim - 1 - d)
        )
        return jnp.expand_dims(t, axis) * vec

    # ---------------------------------------------------------------- vmult
    def vmult(self, u: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        v = u if self.is_collocation else self._sweep(u, self.S)
        g = [self._apply(v, self.D, e) for e in range(dim)]

        # --- cell term (laplace_operator_dg_face.h:35-45)
        acc = []
        for e in range(dim):
            t = None
            for f_ in range(dim):
                term = self.Gsym[e][f_] * g[f_]
                t = term if t is None else t + term
            acc.append(t * self.w3d)
        vacc = jnp.zeros_like(v)

        # --- face loop: each of the Cd+1 faces along every direction once
        for d in range(dim):
            fg = self.facegeo[d]
            # minus side = high-face trace of cell i, plus side = low-face
            # trace of cell i+1; fixed normal +e_d
            t_lo = self._trace(v, d, 0)     # per-cell low-face value
            t_hi = self._trace(v, d, 1)     # per-cell high-face value
            gn_lo = None
            gn_hi = None
            for e in range(dim):
                te_lo = fg["gvec"][e] * self._trace(g[e], d, 0)
                te_hi = fg["gvec"][e] * self._trace(g[e], d, 1)
                gn_lo = te_lo if gn_lo is None else gn_lo + te_lo
                gn_hi = te_hi if gn_hi is None else gn_hi + te_hi

            # pad with Dirichlet mirror ghosts so all Cd+1 faces are uniform:
            # minus side of face k comes from cell k-1, plus side from cell k
            first = jax.lax.slice_in_dim(t_lo, 0, 1, axis=d)
            last = jax.lax.slice_in_dim(t_hi, t_hi.shape[d] - 1, t_hi.shape[d], axis=d)
            um = jnp.concatenate([-first, t_hi], axis=d)       # [Cd+1 faces]
            up = jnp.concatenate([t_lo, -last], axis=d)
            gfirst = jax.lax.slice_in_dim(gn_lo, 0, 1, axis=d)
            glast = jax.lax.slice_in_dim(gn_hi, gn_hi.shape[d] - 1, gn_hi.shape[d], axis=d)
            gm = jnp.concatenate([gfirst, gn_hi], axis=d)      # mirror keeps n.grad
            gp = jnp.concatenate([gn_lo, glast], axis=d)

            jump = um - up
            wf = fg["jxw"] * self.wperp[d]
            flux_val = (fg["sigma"] * jump - 0.5 * (gm + gp)) * wf
            flux_grad = (-0.5 * jump) * wf

            # scatter once per face to both neighbors: the minus cell tests
            # with +[v] at its high face, the plus cell with -[v] at its low
            # face; the {n.grad v} term adds flux_grad * gvec to both sides'
            # gradient accumulators.
            C = self.grid.cells[d]
            to_minus = jax.lax.slice_in_dim(flux_val, 1, C + 1, axis=d)
            to_plus = jax.lax.slice_in_dim(flux_val, 0, C, axis=d)
            vacc = vacc + self._lift(to_minus, d, 1) - self._lift(to_plus, d, 0)
            gm_cells = jax.lax.slice_in_dim(flux_grad, 1, C + 1, axis=d)
            gp_cells = jax.lax.slice_in_dim(flux_grad, 0, C, axis=d)
            for e in range(dim):
                acc[e] = acc[e] + self._lift(gm_cells * fg["gvec"][e], d, 1)
                acc[e] = acc[e] + self._lift(gp_cells * fg["gvec"][e], d, 0)

        y = vacc
        for e in range(dim):
            y = y + self._apply(acc[e], self.Dt, e)
        return y if self.is_collocation else self._sweep(y, self.St)
