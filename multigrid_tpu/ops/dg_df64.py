"""Double-float (f32-pair) SIP-DG operator for the dp outer iteration.

Mirrors :class:`multigrid_tpu.ops.dg.DGLaplace` (the fused cell+face
pipeline) with every contraction, trace, lift and flux update in
compensated float32-pair arithmetic — the DG counterpart of
ops/laplace_df64 (XLA's f64 emulation runs the fused DG apply at
~8 MDoF/s on TPU).  Interface is f64 in / f64 out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .df64 import SplitMatrix, apply_1d_df64, df64_add, join_f64, split_f64
from .dg import DGGrid, DGLaplace
from .laplace_df64 import SplitConst, df64_mul_const


def _const(x) -> SplitConst:
    return SplitConst(np.asarray(x, np.float64))


class DGLaplaceDF64:
    def __init__(self, grid: DGGrid, interpret_unused: bool = False):
        self.grid = grid
        ref = DGLaplace(grid, jnp.float64)   # reuse geometry setup
        self.dim, self.n = ref.dim, ref.n
        b = grid.basis
        self.S = SplitMatrix(b.S)
        self.St = SplitMatrix(b.S.T)
        self.D = SplitMatrix(b.D_col)
        self.Dt = SplitMatrix(b.D_col.T)
        # face vectors as 1-row matrices for the compensated contraction
        self.fmat = [SplitMatrix(b.f0[None, :]), SplitMatrix(b.f1[None, :])]
        self.fvec = [np.asarray(b.f0), np.asarray(b.f1)]
        self.is_collocation = ref.is_collocation
        self.Gsym = ref.Gsym
        self.face = ref.face
        qw = b.quad_weights
        dim, n = self.dim, self.n
        w3 = np.ones((1,) * dim)
        for d in range(dim):
            s = [1] * dim
            s[d] = n
            w3 = w3 * qw.reshape(s)
        self._w3_np = w3
        wperp = []
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
            wperp.append(wp)
        self._wperp_np = wperp
        # pre-split constants: volume coefficients Gsym[e][f]*w3, face
        # weights sigma*jxw*wperp etc.
        self.cw_vol = [
            [_const(self.Gsym[a][bb] * w3) for bb in range(dim)]
            for a in range(dim)
        ]
        self.c_sig = [_const(self.face[d]["sigma"] * self.face[d]["jxw"] * wperp[d])
                      for d in range(dim)]
        self.c_wf = [_const(self.face[d]["jxw"] * wperp[d]) for d in range(dim)]
        self.c_gvec = [
            [_const(self.face[d]["gvec"][e] * self.face[d]["jxw"] * wperp[d])
             for e in range(dim)]
            for d in range(dim)
        ]

    # ------------------------------------------------------------- helpers
    def _apply(self, h, l, M: SplitMatrix, d):
        return apply_1d_df64(h, l, M, self.dim + d)

    def _sweep(self, h, l, M):
        for d in range(self.dim):
            h, l = self._apply(h, l, M, d)
        return h, l

    def _trace(self, h, l, d, side):
        th, tl = self._apply(h, l, self.fmat[side], d)
        axis = self.dim + d
        return jnp.squeeze(th, axis), jnp.squeeze(tl, axis)

    def _lift(self, th, tl, d, side):
        axis = self.dim + d
        vec = self.fvec[side].reshape(
            (1,) * axis + (self.n,) + (1,) * (self.dim - 1 - d)
        )
        c = _const(np.broadcast_to(vec, vec.shape))
        return df64_mul_const(jnp.expand_dims(th, axis), jnp.expand_dims(tl, axis), c)

    @staticmethod
    def _shift(pair, own, d, side, mirror_sign):
        """Neighbor shift with Dirichlet mirror at domain boundaries."""
        th, tl = pair
        oh, ol = own

        def edge(a):
            if side == 1:
                return jax.lax.slice_in_dim(a, a.shape[d] - 1, a.shape[d], axis=d)
            return jax.lax.slice_in_dim(a, 0, 1, axis=d)

        eh, el = mirror_sign * edge(oh), mirror_sign * edge(ol)
        if side == 1:
            ih = jax.lax.slice_in_dim(th, 1, th.shape[d], axis=d)
            il = jax.lax.slice_in_dim(tl, 1, tl.shape[d], axis=d)
            return (jnp.concatenate([ih, eh], axis=d),
                    jnp.concatenate([il, el], axis=d))
        ih = jax.lax.slice_in_dim(th, 0, th.shape[d] - 1, axis=d)
        il = jax.lax.slice_in_dim(tl, 0, tl.shape[d] - 1, axis=d)
        return (jnp.concatenate([eh, ih], axis=d),
                jnp.concatenate([el, il], axis=d))

    # --------------------------------------------------------------- apply
    def apply(self, u64: jnp.ndarray) -> jnp.ndarray:
        dim = self.dim
        uh, ul = split_f64(u64)
        if self.is_collocation:
            vh, vl = uh, ul
        else:
            vh, vl = self._sweep(uh, ul, self.S)
        g = [self._apply(vh, vl, self.D, d) for d in range(dim)]

        # volume term (coefficient incl. quadrature weights)
        acc = []
        for a in range(dim):
            th = tl = None
            for bb in range(dim):
                ph, pl_ = df64_mul_const(g[bb][0], g[bb][1], self.cw_vol[a][bb])
                if th is None:
                    th, tl = ph, pl_
                else:
                    th, tl = df64_add(th, tl, ph, pl_)
            acc.append((th, tl))
        vacc = (jnp.zeros_like(vh), jnp.zeros_like(vl))

        for d in range(dim):
            fd = self.face[d]
            tr_u = [self._trace(vh, vl, d, s) for s in (0, 1)]
            tr_gn = []
            for s in (0, 1):
                th = tl = None
                for e in range(dim):
                    gh, gl = self._trace(g[e][0], g[e][1], d, s)
                    c = _const(np.float64(fd["gvec"][e]))
                    ph, pl_ = df64_mul_const(gh, gl, c)
                    if th is None:
                        th, tl = ph, pl_
                    else:
                        th, tl = df64_add(th, tl, ph, pl_)
                tr_gn.append((th, tl))
            for s in (0, 1):
                sign = 1.0 if s == 1 else -1.0
                u_m = tr_u[s]
                gn_m = tr_gn[s]
                u_p = self._shift(tr_u[1 - s], u_m, d, s, -1.0)
                gn_p = self._shift(tr_gn[1 - s], gn_m, d, s, 1.0)
                # jump = u_m - u_p ; gsum = sign*(gn_m + gn_p)
                jh, jl = df64_add(u_m[0], u_m[1], -u_p[0], -u_p[1])
                gsh, gsl = df64_add(gn_m[0], gn_m[1], gn_p[0], gn_p[1])
                # value lift: (sigma*jxw*wperp)*jump - 0.5*sign*(jxw*wperp)*gsum
                t1h, t1l = df64_mul_const(jh, jl, self.c_sig[d])
                t2h, t2l = df64_mul_const(gsh, gsl, self.c_wf[d])
                vth, vtl = df64_add(t1h, t1l, -0.5 * sign * t2h, -0.5 * sign * t2l)
                lh, ll = self._lift(vth, vtl, d, s)
                vacc = df64_add(vacc[0], vacc[1], lh, ll)
                # gradient lift: -0.5*jump * sign*gvec[e]*jxw*wperp
                for e in range(dim):
                    gth, gtl = df64_mul_const(jh, jl, self.c_gvec[d][e])
                    gth, gtl = -0.5 * sign * gth, -0.5 * sign * gtl
                    lh, ll = self._lift(gth, gtl, d, s)
                    acc[e] = df64_add(acc[e][0], acc[e][1], lh, ll)

        yh, yl = vacc
        for e in range(dim):
            th, tl = self._apply(acc[e][0], acc[e][1], self.Dt, e)
            yh, yl = df64_add(yh, yl, th, tl)
        if not self.is_collocation:
            yh, yl = self._sweep(yh, yl, self.St)
        return join_f64(yh, yl)

    def vmult(self, u64: jnp.ndarray) -> jnp.ndarray:
        return self.apply(u64)

    def vmult_residual(self, rhs: jnp.ndarray, lhs: jnp.ndarray) -> jnp.ndarray:
        return rhs - self.apply(lhs)
