"""Globally-separable (Kronecker) Laplace apply: banded 1-D sweeps.

For a tensor-product brick mesh with a separable (per-axis-constant) merged
coefficient, the assembled operator factorizes EXACTLY:

    A = sum_d c_d * G_{L,d} (x) prod_{e != d} G_{M,e}

where ``G_M[e]``/``G_L[e]`` are the ASSEMBLED global 1-D mass/stiffness
matrices along axis ``e`` (the sum over the 3-D cell grid distributes over
the Kronecker product because cells form a full product set).  Each global
1-D matrix is banded with half-bandwidth p, so one 1-D apply is ``2p+1``
shifted elementwise multiply-adds — no cell localization, no gather or
scatter, no transposes.  A full 3-D matvec is seven fused sweeps:

    v1 = Mx u ; v2 = Lx u          (one read of u, two outputs)
    w1 = My v1 ; w2 = Ly v1 ; w3 = My v2
    y  = Lz w1 + Mz (w2 + w3)

This replaces BOTH hot operator paths of the cell-based design
(ops/laplace_dense.DenseLaplaceF32Chunked / DenseLaplaceOzakiChunked) for
the structured-cube family: the cell-based paths spend >80% of their time
on window/scatter/limb glue (measured 135M-dof attribution), while the
banded sweeps are pure VPU elementwise work at full lane occupancy.  The
CUDA/MPI reference cannot use this structure (its matrix-free framework is
cell-local by design, /root/reference/common/laplace_operator.h:380-557);
exploiting global separability is a TPU-first redesign, not a port.

dp precision runs on df64 (f32-pair) arithmetic with bitmask Dekker
products (safe against XLA FMA/contraction rewrites, see ops/df64.py):
~2^-45 relative operator accuracy, the same class as the validated df64
cell path (ops/laplace_df64).  Pair-in/pair-out ``vmult_pair`` avoids the
f64<->pair boundary (f64 emulation costs ~27 ms/matvec at 135M dofs);
``vmult`` wraps it for the f64 interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.brick import DofGrid
from .df64 import join_f64, split_f64, two_sum
from .laplace import Coef, DiagCoef, make_diag_coef
from .masks import bcast_and, interior_axes_jnp


def assembled_1d(grid: DofGrid, axis: int) -> tuple[np.ndarray, np.ndarray]:
    """Global assembled 1-D (mass, stiffness) matrices along ``axis``
    (reference-element matrices tiled over the axis' cells with shared-node
    overlap; fp64, exact for the (p+1)-point Gauss rule)."""
    b = grid.basis
    p = grid.degree
    nc = grid.cells[axis]
    n = nc * p + 1
    M = np.zeros((n, n))
    L = np.zeros((n, n))
    for c in range(nc):
        s = slice(c * p, c * p + p + 1)
        M[s, s] += b.M
        L[s, s] += b.L
    return M, L


def _diagonals(G: np.ndarray, p: int) -> list[np.ndarray]:
    """Banded matrix -> aligned diagonal arrays D[d][i] = G[i, i+d-p] with
    zeros outside the band/matrix, for d-p in [-p, p]."""
    n = G.shape[0]
    out = []
    for d in range(-p, p + 1):
        D = np.zeros(n)
        i0, i1 = max(0, -d), min(n, n - d)
        D[i0:i1] = G[np.arange(i0, i1), np.arange(i0, i1) + d]
        out.append(D)
    return out


def _shift(u: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Zero-filled shift: out[..., i, ...] = u[..., i+d, ...]."""
    if d == 0:
        return u
    n = u.shape[axis]
    pad = [(0, 0)] * u.ndim
    if d > 0:
        sl = [slice(None)] * u.ndim
        sl[axis] = slice(d, n)
        pad[axis] = (0, d)
    else:
        sl = [slice(None)] * u.ndim
        sl[axis] = slice(0, n + d)
        pad[axis] = (-d, 0)
    return jnp.pad(u[tuple(sl)], pad)


def _bshape(D: np.ndarray, axis: int, ndim: int) -> tuple[int, ...]:
    s = [1] * ndim
    s[axis] = D.shape[0]
    return tuple(s)


_MASK = np.uint32(0xFFFFF000)


def _mask_split(a):
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(ai & _MASK, jnp.float32)
    return hi, a - hi


class KronLaplaceF32:
    """sp A·u via banded 1-D sweeps (smoother-path operator)."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None):
        self.grid = grid
        self.dim = grid.dim
        self.p = grid.degree
        coef = coef if coef is not None else make_diag_coef(grid)
        assert isinstance(coef, DiagCoef), "Kron path needs a separable coef"
        self.coef = coef
        # c_d folded into the stiffness diagonals per axis
        self._dM = []
        self._dL = []
        for a in range(self.dim):
            M, L = assembled_1d(grid, a)
            self._dM.append([jnp.asarray(D.astype(np.float32))
                             for D in _diagonals(M, self.p)])
            self._dL.append([jnp.asarray((coef.values[a] * D).astype(np.float32))
                             for D in _diagonals(L, self.p)])
        self._interior_axes = interior_axes_jnp(grid)

    @property
    def interior(self):
        return bcast_and(self._interior_axes)

    def _apply_1d(self, u, diags, axis):
        ndim = u.ndim
        acc = None
        for k, D in enumerate(diags):
            d = k - self.p
            t = D.reshape(_bshape(D, axis, ndim)) * _shift(u, d, axis)
            acc = t if acc is None else acc + t
        return acc

    def apply_cells(self, u: jnp.ndarray) -> jnp.ndarray:
        """Unmasked A·u on the node grid (no boundary handling)."""
        dim = self.dim
        # x sweep
        v1 = self._apply_1d(u, self._dM[dim - 1], dim - 1)
        v2 = self._apply_1d(u, self._dL[dim - 1], dim - 1)
        if dim == 2:
            return (self._apply_1d(v1, self._dL[0], 0)
                    + self._apply_1d(v2, self._dM[0], 0))
        # y sweep
        w1 = self._apply_1d(v1, self._dM[1], 1)
        w2 = self._apply_1d(v1, self._dL[1], 1)
        w3 = self._apply_1d(v2, self._dM[1], 1)
        # z sweep
        return (self._apply_1d(w1, self._dL[0], 0)
                + self._apply_1d(w2 + w3, self._dM[0], 0))

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        xm = jnp.where(self.interior, src, 0).astype(jnp.float32)
        y = self.apply_cells(xm)
        return jnp.where(self.interior, y, src.astype(jnp.float32))

    def vmult_residual(self, rhs, lhs):
        xm = jnp.where(self.interior, lhs, 0).astype(jnp.float32)
        y = self.apply_cells(xm)
        y = jnp.where(self.interior, y, 0)
        return jnp.where(self.interior, rhs - y, rhs - lhs)


class KronLaplaceDf64:
    """dp A·u via banded 1-D sweeps in compensated f32-pair arithmetic.

    Constants are host-split (value pair + 12-bit mantissa-mask halves of
    the hi part); the field operand is mask-split once per sweep, so each
    of the 2p+1 terms is an exact Dekker product plus a compensated
    accumulation — all elementwise VPU work at full lane width.
    """

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None):
        self.grid = grid
        self.dim = grid.dim
        self.p = grid.degree
        coef = coef if coef is not None else make_diag_coef(grid)
        assert isinstance(coef, DiagCoef), "Kron path needs a separable coef"
        self.coef = coef
        self._dM = []
        self._dL = []
        for a in range(self.dim):
            M, L = assembled_1d(grid, a)
            self._dM.append([self._split_const(D) for D in _diagonals(M, self.p)])
            self._dL.append([self._split_const(coef.values[a] * D)
                             for D in _diagonals(L, self.p)])
        self._interior_axes = interior_axes_jnp(grid)

    @staticmethod
    def _split_const(D: np.ndarray):
        """f64 diagonal -> (hi, lo, hi_masked_hi, hi_masked_lo) f32 arrays."""
        hi = D.astype(np.float32)
        lo = (D - hi.astype(np.float64)).astype(np.float32)
        bits = hi.view(np.uint32) & 0xFFFFF000
        hhi = bits.view(np.float32)
        return (jnp.asarray(hi), jnp.asarray(lo),
                jnp.asarray(hhi), jnp.asarray(hi - hhi))

    @property
    def interior(self):
        return bcast_and(self._interior_axes)

    def _apply_1d_pair(self, uh, ul, diags, axis):
        """Compensated banded 1-D apply of a split-constant diagonal set."""
        ndim = uh.ndim
        # one mask split of the field per sweep, shared by all terms
        uhh, uhl = _mask_split(uh)
        sh = sl = None
        for k, (bh, bl, bhh, bhl) in enumerate(diags):
            d = k - self.p
            shp = _bshape(bh, axis, ndim)
            ah = _shift(uh, d, axis)
            ahh = _shift(uhh, d, axis)
            ahl = _shift(uhl, d, axis)
            al = _shift(ul, d, axis)
            bhv = bh.reshape(shp)
            # exact product ah*bh = p + e (12-bit mask halves, FMA-immune)
            pr = ah * bhv
            e = ((ahh * bhh.reshape(shp) - pr)
                 + ahh * bhl.reshape(shp) + ahl * bhh.reshape(shp)
                 + ahl * bhl.reshape(shp))
            e = e + (ah * bl.reshape(shp) + al * bhv)
            if sh is None:
                sh, sl = pr, e
            else:
                s, e2 = two_sum(sh, pr)
                sh = s
                sl = sl + (e2 + e)
            del ah, ahh, ahl, al
        # renormalize once per sweep
        s, e = two_sum(sh, sl)
        return s, e

    def apply_pair(self, uh, ul):
        dim = self.dim
        a = dim - 1
        v1 = self._apply_1d_pair(uh, ul, self._dM[a], a)
        v2 = self._apply_1d_pair(uh, ul, self._dL[a], a)
        if dim == 2:
            t1 = self._apply_1d_pair(*v1, self._dL[0], 0)
            t2 = self._apply_1d_pair(*v2, self._dM[0], 0)
        else:
            w1 = self._apply_1d_pair(*v1, self._dM[1], 1)
            w2 = self._apply_1d_pair(*v1, self._dL[1], 1)
            w3 = self._apply_1d_pair(*v2, self._dM[1], 1)
            w2h, w2l = two_sum(w2[0], w3[0])
            w23 = (w2h, w2l + (w2[1] + w3[1]))
            t1 = self._apply_1d_pair(*w1, self._dL[0], 0)
            t2 = self._apply_1d_pair(*w23, self._dM[0], 0)
        s, e = two_sum(t1[0], t2[0])
        return s, e + (t1[1] + t2[1])

    # ------------------------------------------------------- pair interface
    def vmult_pair(self, xh, xl):
        """Pair-native dp matvec: (hi, lo) in, (hi, lo) out; boundary rows
        pass through unchanged."""
        interior = self.interior
        mh = jnp.where(interior, xh, 0)
        ml = jnp.where(interior, xl, 0)
        yh, yl = self.apply_pair(mh, ml)
        return (jnp.where(interior, yh, xh), jnp.where(interior, yl, xl))

    def vmult_residual_pair(self, rh, rl, xh, xl):
        interior = self.interior
        mh = jnp.where(interior, xh, 0)
        ml = jnp.where(interior, xl, 0)
        yh, yl = self.apply_pair(mh, ml)
        # r - y  (compensated)
        s, e = two_sum(rh, -yh)
        dh, dl = s, e + (rl - yl)
        bh, bl = two_sum(rh, -xh)
        bl = bl + (rl - xl)
        return (jnp.where(interior, dh, bh), jnp.where(interior, dl, bl))

    # -------------------------------------------------------- f64 interface
    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        xm = jnp.where(self.interior, src, 0)
        xh, xl = split_f64(xm)
        yh, yl = self.apply_pair(xh, xl)
        return jnp.where(self.interior, join_f64(yh, yl), src)

    def vmult_residual(self, rhs, lhs):
        xm = jnp.where(self.interior, lhs, 0)
        xh, xl = split_f64(xm)
        yh, yl = self.apply_pair(xh, xl)
        return jnp.where(self.interior, rhs - join_f64(yh, yl), rhs - lhs)
