"""fp64-accurate SIP-DG operator via the Ozaki bf16-MXU scheme.

The round-1 dp DG path ran compensated df64 sweeps on the VPU (31 MDoF/s).
On a uniform affine grid the fused SIP operator is a translation-invariant
cell stencil

    y_c = A_loc u_c + sum_{faces (d,s)} B_{d,s} u_{neighbor(d,s)}

with the SAME [N, N] matrices for every cell, and each face coupling
B_{d,s} of rank <= 2 n^{dim-1} (value + normal-derivative traces).  All
matrices are PROBED numerically from the verified f64 fused operator
(ops/dg.py) on a tiny grid — no sign/penalty re-derivation — and the face
couplings are SVD-factorized into trace extraction V^T and lift U.  The
runtime is then three Ozaki bf16-limb matmuls (ops/ozaki.py):

    matmul1: u -> [A_loc u | traces V^T u]      (width N + 6 * r)
    shift:   traces move one cell across each face (zero at boundary)
    matmul2: incoming traces @ U_all -> y  (+= )
    boundary: thin per-face layer matmuls add the mirror corrections

which replaces the reference's hand-fused dp cell loop
(/root/reference/common/laplace_operator_dg.h:963-1861) with MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .df64 import df64_add, join_f64, split_f64
from .dg import DGGrid, DGLaplace
from .ozaki import OzakiMatmul


def _probe_stencil(grid: DGGrid):
    """Probe (A_loc, B[d][s], C_bdry[d][s]) from the f64 fused operator on
    a small grid with the same cell Jacobian."""
    dim = grid.dim
    n = grid.n
    N = n**dim
    cells = (3,) * dim
    pgrid = DGGrid(cells=cells, jacobian=grid.jacobian, degree=grid.degree,
                   kind=grid.kind)
    op = DGLaplace(pgrid, jnp.float64)

    center = (1,) * dim

    def cell_block(y, cell):
        idx = tuple(cell) + (slice(None),) * dim
        return np.asarray(y[idx]).reshape(N)

    def probes_at(cell):
        """[N, N] matrix column i = operator response at ``read`` cells."""
        base = np.zeros((N,) + cells + (n,) * dim)
        for i in range(N):
            loc = np.zeros(N)
            loc[i] = 1.0
            base[i][tuple(cell)] = loc.reshape((n,) * dim)
        ys = jax.vmap(op.apply)(jnp.asarray(base))
        return ys

    ys_center = probes_at(center)
    A_loc = np.stack([cell_block(ys_center[i], center) for i in range(N)])
    A_loc = A_loc.T  # [out, in] -> columns are responses; we store [j,i]

    B = [[None, None] for _ in range(dim)]
    for d in range(dim):
        for s in (0, 1):
            # y_c receives from neighbor at c + offset; probing with source
            # at center, the receiving cell is center - offset
            read = list(center)
            read[d] -= 1 if s == 1 else -1
            M = np.stack([cell_block(ys_center[i], read) for i in range(N)])
            B[d][s] = M.T  # y_read = B u_center

    C = [[None, None] for _ in range(dim)]
    for d in range(dim):
        for s in (0, 1):
            cell = list(center)
            cell[d] = 0 if s == 0 else cells[d] - 1
            ys = probes_at(cell)
            M = np.stack([cell_block(ys[i], cell) for i in range(N)]).T
            C[d][s] = M - A_loc
    return A_loc, B, C


class DGLaplaceOzaki:
    """dp SIP-DG A.u with fp64-level accuracy from bf16 MXU matmuls."""

    def __init__(self, grid: DGGrid, svd_tol: float = 1e-13):
        self.grid = grid
        self.dim = grid.dim
        self.n = grid.n
        self.N = self.n**self.dim
        A_loc, B, C = _probe_stencil(grid)

        # SVD-factor each face coupling: B = (U S) V^T, traces t = u @ V
        self.Vs, Us, self.ranks = [], [], []
        for d in range(self.dim):
            for s in (0, 1):
                U, S, Vt = np.linalg.svd(B[d][s])
                r = int((S > svd_tol * S[0]).sum())
                self.ranks.append(r)
                self.Vs.append(Vt[:r].T)            # [N, r]
                Us.append(U[:, :r] * S[:r])         # [N, r]
        # matmul1: [N] -> [N + sum r]: columns = A_loc^T | V blocks
        M1 = np.concatenate([A_loc.T] + self.Vs, axis=1)
        self.mm1 = OzakiMatmul(M1)
        # matmul2 per direction (both faces, [2r] -> [N]): one matrix per
        # axis keeps the limb contraction inside the exact-f32 window
        # (6 * 2r ~ 600 terms; a single all-face matmul would overflow it)
        self.mm2 = []
        for d in range(self.dim):
            M2 = np.concatenate(
                [Us[2 * d].T, Us[2 * d + 1].T], axis=0)  # [2r, N]
            self.mm2.append(OzakiMatmul(M2))
        self.bdry = [[OzakiMatmul(C[d][s].T) for s in (0, 1)]
                     for d in range(self.dim)]
        self.offsets = np.cumsum([0] + self.ranks)

    # ------------------------------------------------------------- helpers
    def _shift_in(self, t_pair, d, s):
        """Incoming trace for face (d, s): the neighbor's trace shifted one
        cell toward us; zero outside the domain (boundary corrections are
        separate)."""
        th, tl = t_pair

        def shift(a):
            if s == 1:  # neighbor at +e_d: take from c+1
                inner = jax.lax.slice_in_dim(a, 1, a.shape[d], axis=d)
                pad = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=d))
                return jnp.concatenate([inner, pad], axis=d)
            inner = jax.lax.slice_in_dim(a, 0, a.shape[d] - 1, axis=d)
            pad = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=d))
            return jnp.concatenate([pad, inner], axis=d)

        return shift(th), shift(tl)

    def _apply_pair(self, xh, xl):
        dim, N = self.dim, self.N
        cells = self.grid.cells
        xh = xh.reshape(cells + (N,))
        xl = xl.reshape(cells + (N,))
        out_h, out_l = self.mm1(xh, xl)
        yh, yl = out_h[..., :N], out_l[..., :N]

        # gather incoming traces and lift, one matmul per direction
        k = 0
        for d in range(dim):
            inc_h, inc_l = [], []
            for s in (0, 1):
                lo = N + self.offsets[k]
                hi = N + self.offsets[k + 1]
                t = (out_h[..., lo:hi], out_l[..., lo:hi])
                sh, sl = self._shift_in(t, d, s)
                inc_h.append(sh)
                inc_l.append(sl)
                k += 1
            add_h, add_l = self.mm2[d](jnp.concatenate(inc_h, axis=-1),
                                       jnp.concatenate(inc_l, axis=-1))
            yh, yl = df64_add(yh, yl, add_h, add_l)

        # boundary mirror corrections on the outermost cell layers only
        for d in range(dim):
            for s in (0, 1):
                idx = 0 if s == 0 else cells[d] - 1
                sel = (slice(None),) * d + (slice(idx, idx + 1),)
                lh = jax.lax.slice_in_dim(xh, idx, idx + 1, axis=d)
                ll = jax.lax.slice_in_dim(xl, idx, idx + 1, axis=d)
                ch, cl = self.bdry[d][s](lh, ll)
                nh, nl = df64_add(yh[sel], yl[sel], ch, cl)
                yh = yh.at[sel].set(nh)
                yl = yl.at[sel].set(nl)
        return yh.reshape(cells + (self.n,) * dim), yl.reshape(
            cells + (self.n,) * dim)

    # --------------------------------------------------------------- vmult
    def vmult(self, u: jnp.ndarray) -> jnp.ndarray:
        xh, xl = split_f64(u)
        yh, yl = self._apply_pair(xh, xl)
        return join_f64(yh, yl)

    apply = vmult

    def vmult_residual(self, rhs: jnp.ndarray, lhs: jnp.ndarray) -> jnp.ndarray:
        return rhs - self.vmult(lhs)
