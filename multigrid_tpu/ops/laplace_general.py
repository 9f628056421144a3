"""Matrix-free FE_Q Laplace operator on mapped multiblock meshes.

The general-geometry counterpart of :mod:`multigrid_tpu.ops.laplace`
(reference general path: /root/reference/common/laplace_operator.h:493-522):
per-quad-point symmetric merged coefficients, index-table gather and
segment-sum scatter instead of structured window reshapes.  Used by
poisson_shell (curved shell, 1e6-varying coefficient) and minimal_surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.mapped import GeneralGrid
from .laplace import apply_1d, sym_components, sym_index


class GeneralLaplace:
    def __init__(self, grid: GeneralGrid, dtype=jnp.float32,
                 coef: Optional[np.ndarray] = None, coef_fn=None):
        self.grid = grid
        self.dtype = dtype
        b = grid.basis
        self.n = b.n
        self.dim = grid.dim
        self.S = jnp.asarray(b.S, dtype)
        self.St = jnp.asarray(b.S.T, dtype)
        self.D = jnp.asarray(b.D_col, dtype)
        self.Dt = jnp.asarray(b.D_col.T, dtype)
        if coef is None:
            coef = grid.merged_coefficient(coef_fn)
        shape = (grid.n_cells,) + (self.n,) * self.dim + (coef.shape[-1],)
        self.C = jnp.asarray(coef.reshape(shape), dtype)
        self.jxw = jnp.asarray(
            grid.jxw.reshape((grid.n_cells,) + (self.n,) * self.dim), dtype
        )
        self.cell_nodes = jnp.asarray(grid.cell_nodes)
        self.interior = jnp.asarray(~grid.boundary)
        self.n_dofs = grid.n_dofs

    # ------------------------------------------------------------- helpers
    def gather(self, u: jnp.ndarray) -> jnp.ndarray:
        w = jnp.take(u, self.cell_nodes, axis=0)
        return w.reshape((self.grid.n_cells,) + (self.n,) * self.dim)

    def scatter_add(self, y: jnp.ndarray) -> jnp.ndarray:
        flat = y.reshape(-1)
        return jnp.zeros(self.n_dofs, self.dtype).at[self.cell_nodes.reshape(-1)].add(flat)

    def _eval_grads(self, w):
        uq = w
        for d in range(self.dim):
            uq = apply_1d(uq, self.S, 1 + d)
        return [apply_1d(uq, self.D, 1 + d) for d in range(self.dim)]

    def _integrate_grads(self, gq):
        acc = apply_1d(gq[0], self.Dt, 1)
        for d in range(1, self.dim):
            acc = acc + apply_1d(gq[d], self.Dt, 1 + d)
        for d in range(self.dim):
            acc = apply_1d(acc, self.St, 1 + d)
        return acc

    def _quad_op(self, g, C=None):
        # ``C`` may override the stored coefficient so jitted solves can take
        # it as a pytree argument (one compile across Newton iterations,
        # cf. /root/reference/minimal_surface/program.cc:458-489)
        C = self.C if C is None else C
        dim = self.dim
        out = []
        for a in range(dim):
            t = None
            for b_ in range(dim):
                term = C[..., sym_index(dim, a, b_)] * g[b_]
                t = term if t is None else t + term
            out.append(t)
        return out

    def apply_cells(self, u: jnp.ndarray, C=None) -> jnp.ndarray:
        g = self._eval_grads(self.gather(u))
        return self.scatter_add(self._integrate_grads(self._quad_op(g, C)))

    # --------------------------------------------------------------- vmult
    def vmult(self, src: jnp.ndarray, C=None) -> jnp.ndarray:
        xm = jnp.where(self.interior, src, 0)
        y = self.apply_cells(xm, C)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs: jnp.ndarray, lhs: jnp.ndarray, C=None) -> jnp.ndarray:
        xm = jnp.where(self.interior, lhs, 0)
        y = self.apply_cells(xm, C)
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    # ----------------------------------------------------------------- rhs
    def compute_rhs(self, f_quad: jnp.ndarray, u_bc: jnp.ndarray) -> jnp.ndarray:
        """b = M f - A u_bc, zero at Dirichlet rows
        (/root/reference/common/laplace_operator.h:804-845)."""
        fv = f_quad.astype(self.dtype) * self.jxw
        for d in range(self.dim):
            fv = apply_1d(fv, self.St, 1 + d)
        g = self._eval_grads(self.gather(u_bc))
        y = fv - self._integrate_grads(self._quad_op(g))
        b = self.scatter_add(y)
        return jnp.where(self.interior, b, 0)

    # ------------------------------------------------------------ diagonal
    def inverse_diagonal(self, C=None) -> jnp.ndarray:
        C = self.C if C is None else C
        b = self.grid.basis
        dim = self.dim
        comps = sym_components(dim)
        diag = None
        for s, (a, bb) in enumerate(comps):
            term = C[..., s] * (1.0 if a == bb else 2.0)
            for e in range(dim):
                Ta = b.D_col @ b.S if a == e else b.S
                Tb = b.D_col @ b.S if bb == e else b.S
                F = jnp.asarray(Ta * Tb, self.dtype)
                # HIGHEST: f32 einsums at default precision quantize to
                # bf16 on the MXU — a 0.4%-perturbed smoother diagonal
                term = apply_1d(term, F.T, 1 + e,
                                precision=jax.lax.Precision.HIGHEST)
            diag = term if diag is None else diag + term
        diag = self.scatter_add(diag)
        diag = jnp.where(self.interior, diag, 1.0)
        return 1.0 / diag

    # ------------------------------------------------------------ analysis
    def interpolate_to_quad(self, u: jnp.ndarray) -> jnp.ndarray:
        uq = self.gather(u)
        for d in range(self.dim):
            uq = apply_1d(uq, self.S, 1 + d)
        return uq

    def l2_error(self, u: jnp.ndarray, exact_quad: jnp.ndarray) -> jnp.ndarray:
        uq = self.interpolate_to_quad(u)
        err = jnp.sum((uq - exact_quad) ** 2 * self.jxw)
        vol = jnp.sum(self.jxw)
        return jnp.sqrt(err / vol)
