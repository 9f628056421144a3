"""Curved-geometry SIP-DG Laplace operator (general per-point geometry).

The reference's DG operators are Cartesian/affine only (its curved-geometry
runs use the continuous-FE path, /root/reference/poisson_shell/program.cc);
this module extends the fused cell-centric SIP-DG operator (ops/dg.py) to a
smoothly mapped structured block — the DG sibling of the CG-FEM general
path (ops/laplace_general.py + mesh/mapped.py):

* volume term with a per-quad-point merged tensor ``c w detJ J^{-1} J^{-T}``
  (the role of /root/reference/common/laplace_operator.h:388-429, here for
  the DG form);
* face terms with per-face-point geometry: surface measure
  ``detJ |J^{-T} e_d|``, conormal vector ``(J^{-1} J^{-T} e_d)/|J^{-T} e_d|``
  and penalty ``sigma = (p+1)^2 |n_unit J^{-1}|`` — the per-point analogue
  of the both-side Jacobian penalty in the reference's face-based operator
  (/root/reference/common/laplace_operator_dg_face.h:106-109).  The mapping
  is smooth, so the two cells adjacent to a face see the SAME face-point
  geometry (evaluated once per face, shared by both sides — interior
  consistency is exact, not averaged).

Geometry is evaluated at setup in fp64 numpy by complex-step
differentiation of the mapping (mesh/mapped._map_jacobian).  An optional
smooth coefficient c(x) is folded into the volume tensor and the face
tables at their own quadrature points (more accurate than the
trace-interpolated averages of ops/dg.DGLaplaceVarCoeff).

Dirichlet boundary keeps the mirror convention ``u+ = -u-``,
``n.grad u+ = n.grad u-`` (laplace_operator_dg.h:1469-1485) with weak
(Nitsche) data support in :meth:`DGLaplaceCurved.compute_rhs`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..core.dg_basis import GAUSS, make_dg_basis
from ..mesh.mapped import Block, _map_jacobian
from .dg import DGLaplace


def _kron_weights(qw: np.ndarray, k: int) -> np.ndarray:
    w = np.array([1.0])
    for _ in range(k):
        w = np.kron(w, qw)
    return w


class DGCurvedGrid:
    """One level of a DG discretization on a smoothly mapped structured block.

    ``mapping``: [N, dim] block coords in [0,1]^dim -> [N, dim] physical.
    ``coeff_fn``: optional smooth c(x) called on a list of per-dim physical
    coordinate arrays (same convention as the CG general path).
    """

    def __init__(self, cells, mapping: Callable, degree: int,
                 kind: str = GAUSS, coeff_fn: Optional[Callable] = None,
                 complex_step_ok: bool = True):
        self.cells = tuple(int(c) for c in cells)
        self.mapping = mapping
        self.degree = degree
        self.kind = kind
        self.coeff_fn = coeff_fn
        self.complex_step_ok = complex_step_ok
        dim = len(self.cells)
        self.dim = dim
        b = make_dg_basis(degree, kind)
        self.basis = b
        n = degree + 1
        self.n = n
        qp = b.quad_points
        h = 1.0 / np.asarray(self.cells, np.float64)
        blk = Block(cells=self.cells, mapping=mapping,
                    complex_step_ok=complex_step_ok)

        def geom_at(flat):
            """phys coords, cell Jacobians (chain rule block->cell), detJ,
            J^{-1} and G = J^{-1} J^{-T} at flat [N, dim] block params."""
            X = np.asarray(mapping(flat), np.float64)
            J = _map_jacobian(blk, flat) * h[None, :]
            detJ = np.abs(np.linalg.det(J))
            Jinv = np.linalg.inv(J)
            G = np.einsum("nab,ncb->nac", Jinv, Jinv)
            return X, detJ, Jinv, G

        # ------------------------------------------------------ volume geometry
        vshape = self.cells + (n,) * dim
        Ps = []
        for e in range(dim):
            line = (np.arange(self.cells[e])[:, None] + qp[None, :]) * h[e]
            shp = [1] * (2 * dim)
            shp[e] = self.cells[e]
            shp[dim + e] = n
            Ps.append(np.broadcast_to(line.reshape(shp), vshape))
        flat = np.stack([P.reshape(-1) for P in Ps], axis=1)
        X, detJ, _, G = geom_at(flat)
        self.quad_phys = [X[:, d].reshape(vshape) for d in range(dim)]
        w3 = _kron_weights(b.quad_weights, dim)          # flat [n^dim] pattern
        w3_full = np.tile(w3, int(np.prod(self.cells))).reshape(vshape)
        self.jxw_vol = detJ.reshape(vshape) * w3_full    # pure measure
        c = 1.0
        if coeff_fn is not None:
            c = np.asarray(coeff_fn(self.quad_phys), np.float64)
        cw = self.jxw_vol * c
        # symmetric merged tensor: build the upper triangle once and alias
        # the mirror entries (same array object -> one device constant)
        self.Gw = [[None] * dim for _ in range(dim)]
        for a in range(dim):
            for e in range(a, dim):
                arr = cw * G[:, a, e].reshape(vshape)
                self.Gw[a][e] = arr
                self.Gw[e][a] = arr

        # -------------------------------------------------------- face geometry
        # face arrays: cell axis d extended to C_d+1 (face planes), node axes
        # = perp directions in increasing order — matches the concat layout of
        # the once-per-face loop / the trace arrays of the fused loop.
        self.face_jxw = []      # surface measure incl. perp quad weights
        self.face_sigma = []    # penalty (coefficient folded in)
        self.face_gvec = []     # conormal [e] arrays (coefficient folded in)
        self.face_phys = []     # physical face-point coords [e]
        for d in range(dim):
            others = [e for e in range(dim) if e != d]
            fcells = list(self.cells)
            fcells[d] += 1
            fshape = tuple(fcells) + (n,) * (dim - 1)
            Ps = []
            for e in range(dim):
                shp = [1] * (2 * dim - 1)
                if e == d:
                    line = np.arange(self.cells[d] + 1) * h[d]
                    shp[d] = self.cells[d] + 1
                else:
                    line = (np.arange(self.cells[e])[:, None]
                            + qp[None, :]) * h[e]
                    shp[e] = self.cells[e]
                    shp[dim + others.index(e)] = n
                Ps.append(np.broadcast_to(line.reshape(shp), fshape))
            flat = np.stack([P.reshape(-1) for P in Ps], axis=1)
            Xf, detJf, Jinvf, Gf = geom_at(flat)
            r = Jinvf[:, d, :]                       # J^{-T} e_d per point
            rn = np.linalg.norm(r, axis=1)
            n_unit = r / rn[:, None]
            gvec = Gf[:, d, :] / rn[:, None]         # conormal: gvec.grad_ref
            sigma = n * n * np.linalg.norm(
                np.einsum("na,nab->nb", n_unit, Jinvf), axis=1)
            cf = 1.0
            phys = [Xf[:, e].reshape(fshape) for e in range(dim)]
            if coeff_fn is not None:
                cf = np.asarray(coeff_fn(phys), np.float64).reshape(-1)
            wperp = _kron_weights(b.quad_weights, dim - 1)
            wperp_full = np.tile(
                wperp, int(np.prod(fcells))).reshape(fshape)
            self.face_jxw.append(
                (detJf * rn).reshape(fshape) * wperp_full)
            self.face_sigma.append((sigma * cf).reshape(fshape))
            self.face_gvec.append(
                [(gvec[:, e] * cf).reshape(fshape) for e in range(dim)])
            self.face_phys.append(phys)

    @property
    def n_dofs(self) -> int:
        return int(np.prod(self.cells)) * self.n**self.dim

    @property
    def shape(self) -> tuple[int, ...]:
        return self.cells + (self.n,) * self.dim

    def coarse(self) -> "DGCurvedGrid":
        assert all(c % 2 == 0 for c in self.cells)
        return DGCurvedGrid(tuple(c // 2 for c in self.cells), self.mapping,
                            self.degree, self.kind, self.coeff_fn,
                            self.complex_step_ok)

    def boundary_quad_coords(self, d: int, side: int):
        """Physical coordinates of the boundary face (d, side) quad points,
        as a list of per-dim arrays of face-trace shape [C..., perp] with
        cell axis d reduced to extent 1 (broadcastable against a layer
        mask) — for evaluating weak Dirichlet data."""
        k = 0 if side == 0 else self.cells[d]
        out = []
        for e in range(self.dim):
            a = self.face_phys[d][e]
            out.append(np.take(a, [k], axis=d))
        return out


class DGLaplaceCurved(DGLaplace):
    """SIP-DG A·u with fused cell+face evaluation, per-point geometry.

    Same block layout, trace/lift machinery and mirror convention as the
    affine fused operator; every scalar geometry constant becomes a
    per-quad-point array.  ``has_cell_data`` routes JacobiTransformed to
    its exact per-cell Rayleigh-probe path (ops/dg_precond.py)."""

    has_cell_data = True

    def __init__(self, grid: DGCurvedGrid, dtype=jnp.float32):
        self.grid = grid
        self.dtype = dtype
        b = grid.basis
        dim, n = grid.dim, grid.n
        self.dim, self.n = dim, n
        self.S = jnp.asarray(b.S, dtype)
        self.St = jnp.asarray(b.S.T, dtype)
        self.Si = jnp.asarray(b.S_inv, dtype)
        self.D = jnp.asarray(b.D_col, dtype)
        self.Dt = jnp.asarray(b.D_col.T, dtype)
        self.f = [jnp.asarray(b.f0, dtype), jnp.asarray(b.f1, dtype)]
        self.is_collocation = grid.kind == GAUSS

        self.Gw = [[None] * dim for _ in range(dim)]
        for a in range(dim):
            for e in range(a, dim):
                arr = jnp.asarray(grid.Gw[a][e], dtype)
                self.Gw[a][e] = arr
                self.Gw[e][a] = arr
        self.jxw_vol = jnp.asarray(grid.jxw_vol, dtype)
        # per (direction, cell-side) slices of the face tables: cell k's
        # face on side s is face plane k+s
        self._wf, self._sig, self._gv = [], [], []
        for d in range(dim):
            C = grid.cells[d]
            wf_d, sig_d, gv_d = [], [], []
            for s in (0, 1):
                take = lambda a: jnp.asarray(
                    np.take(a, np.arange(s, C + s), axis=d), dtype)
                wf_d.append(take(grid.face_jxw[d]))
                sig_d.append(take(grid.face_sigma[d]))
                gv_d.append([take(grid.face_gvec[d][e]) for e in range(dim)])
            self._wf.append(wf_d)
            self._sig.append(sig_d)
            self._gv.append(gv_d)

    def astype(self, dtype) -> "DGLaplaceCurved":
        return DGLaplaceCurved(self.grid, dtype) if dtype != self.dtype else self

    # --------------------------------------------------------------- vmult
    def apply(self, u: jnp.ndarray, ext=None) -> jnp.ndarray:
        dim = self.dim
        assert not ext, "distributed halos not wired for curved DG"
        v = u if self.is_collocation else self._sweep(u, self.S)
        g = [self._apply(v, self.D, d) for d in range(dim)]

        # volume term: per-point merged tensor (w detJ c folded in)
        acc = []
        for e in range(dim):
            t = None
            for f_ in range(dim):
                term = self.Gw[e][f_] * g[f_]
                t = term if t is None else t + term
            acc.append(t)
        vacc = jnp.zeros_like(v)

        for d in range(dim):
            tr_u = [self._trace(v, d, s) for s in (0, 1)]
            # conormal-projected gradient trace per side, each side
            # contracted with ITS OWN face-point geometry; the two cells
            # adjacent to a face share that face's geometry, so the
            # neighbor shift of the projected trace stays consistent
            gn_own = []
            for so in (0, 1):
                t = None
                for e in range(dim):
                    term = self._gv[d][so][e] * self._trace(g[e], d, so)
                    t = term if t is None else t + term
                gn_own.append(t)
            for s in (0, 1):
                sign = 1.0 if s == 1 else -1.0
                gv = self._gv[d][s]
                u_m = tr_u[s]
                gn_m = sign * gn_own[s]
                u_p = self._neighbor(tr_u[1 - s], u_m, d, s)
                gn_p = sign * self._neighbor_grad(
                    gn_own[1 - s], sign * gn_m, d, s)
                jump = u_m - u_p
                t_val = self._sig[d][s] * jump - 0.5 * (gn_m + gn_p)
                t_gr = -0.5 * jump
                wf = self._wf[d][s]
                vacc = vacc + self._lift(t_val * wf, d, s)
                for e in range(dim):
                    acc[e] = acc[e] + self._lift(
                        t_gr * wf * (sign * gv[e]), d, s)

        y = vacc
        for e in range(dim):
            y = y + self._apply(acc[e], self.Dt, e)
        return y if self.is_collocation else self._sweep(y, self.St)

    # ----------------------------------------------------------------- rhs
    def compute_rhs(self, f_quad: jnp.ndarray, g_bc=None) -> jnp.ndarray:
        """b = (f, phi) plus weak Dirichlet data with per-point geometry;
        ``g_bc``: dict (d, side) -> boundary values at the face quad points
        (trace shape, broadcastable; see grid.boundary_quad_coords)."""
        b = f_quad.astype(self.dtype) * self.jxw_vol
        acc = [jnp.zeros(self.grid.shape, self.dtype)
               for _ in range(self.dim)]
        vacc = b
        if g_bc is not None:
            for (d, s), gval in g_bc.items():
                sign = 1.0 if s == 1 else -1.0
                lay = np.zeros(self.grid.cells[d])
                lay[-1 if s == 1 else 0] = 1.0
                mask_shape = [1] * (self.dim * 2 - 1)
                mask_shape[d] = self.grid.cells[d]
                mask = jnp.asarray(lay.reshape(mask_shape), self.dtype)
                gm = jnp.asarray(gval, self.dtype) * mask
                t_val = 2.0 * self._sig[d][s] * gm
                t_gr = -gm
                wf = self._wf[d][s]
                vacc = vacc + self._lift(t_val * wf, d, s)
                for e in range(self.dim):
                    acc[e] = acc[e] + self._lift(
                        t_gr * wf * (sign * self._gv[d][s][e]), d, s)
        y = vacc
        for e in range(self.dim):
            y = y + self._apply(acc[e], self.Dt, e)
        return y if self.is_collocation else self._sweep(y, self.St)

    # ------------------------------------------------------------ analysis
    def l2_error(self, u: jnp.ndarray, exact_quad: jnp.ndarray) -> jnp.ndarray:
        uq = self.to_quad_values(u)
        err = jnp.sum((uq - exact_quad) ** 2 * self.jxw_vol)
        vol = jnp.sum(self.jxw_vol)
        return jnp.sqrt(err / vol)
