"""Pallas-fused dp matvec (Ozaki limb scheme) for the structured FE_Q
Laplace operator at p = 4, dim = 3.

The XLA-level pipeline (ops/laplace_dense.DenseLaplaceOzaki) is HBM-glue
bound (~20% HBM efficiency measured): window gathers, 6-D transposes, limb
packing and the compensated scatter each materialize full-size
intermediates.  Here the glue runs in VMEM per z-cell slab.

Mosaic constraint that shapes the design: reshapes/transposes must not
split or merge the lane (minor-most) dimension, so the x-direction window/
scatter stays in XLA (single cheap passes) and the kernels keep ``cx`` in
lanes:

  XLA pre:      split f64 -> f32 pair; x-window to [Z, Y, n(lx), cx]
  front kernel: DMA z-slab -> y-window -> [N, cy, cx] rows -> per-cell
                power-of-2 scale -> 7-bit limbs -> packed [6N, cy, cx] bf16
  XLA matmul:   dot_general(Kbig^T, packed) — exact bf16 MXU products with
                exact f32 accumulation, all scale groups at once
  back kernel:  grid (zi, m): compensated per-scale recombination into a
                VMEM accumulator; final m unscatters y -> slab pair
                [n(lz), n(lx), Y, cx]
  XLA post:     x-scatter (lane merge), z-overlap compensated add, join to
                f64, Dirichlet mask
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh.brick import DofGrid
from .df64 import df64_add, join_f64, split_f64, two_sum
from .laplace import DiagCoef
from .laplace_dense import _LIMB_BITS, _MAX_M, _N_LIMBS, _split_limbs_f64, element_matrix
from .masks import bcast_and, interior_axes_jnp

# index-map literals must be 32-bit: under jax_enable_x64 Python ints trace
# as i64 and Mosaic rejects the lowered index function (measured)
_I0 = np.int32(0)


def _limb_split_block(rh, rl, n_limbs):
    limbs = []
    for k in range(n_limbs):
        scale = np.float32(2.0 ** (_LIMB_BITS * (k + 1)))
        inv = np.float32(2.0 ** (-_LIMB_BITS * (k + 1)))
        chopped = jnp.round(rh * scale) * inv
        rh = rh - chopped
        rh, rl = two_sum(rh, rl)
        limbs.append((chopped * np.float32(2.0 ** (_LIMB_BITS * k))).astype(jnp.bfloat16))
    return limbs


class PallasOzakiLaplace:
    """dp A·u with Pallas-fused glue; p=4 3-D structured bricks."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None,
                 interpret: bool = False):
        assert grid.dim == 3 and grid.degree == 4
        self.grid = grid
        self.p, self.n, self.N = 4, 5, 125
        self.cz, self.cy, self.cx = grid.cells
        self.Z, self.Y, self.X = grid.shape
        self.interpret = interpret
        K = element_matrix(grid, coef)
        sigma_K, limbs = _split_limbs_f64(K.T, _N_LIMBS)
        self.sigma_K = sigma_K
        N = self.N
        Kbig = np.zeros((_N_LIMBS * N, (_MAX_M + 1) * N), np.float32)
        for l in range(_N_LIMBS):
            for m in range(_MAX_M + 1):
                k = m - l
                if 0 <= k < _N_LIMBS:
                    Kbig[l * N : (l + 1) * N, m * N : (m + 1) * N] = limbs[k]
        self.KbigT = jnp.asarray(Kbig.T, jnp.bfloat16)   # [6N_out, 6N_in]
        self._interior_axes = interior_axes_jnp(grid)

    @property
    def interior(self):
        return bcast_and(self._interior_axes)

    # ------------------------------------------------------ XLA pre/post
    def _xwindow(self, a):
        """[Z, Y, X] -> [Z, Y, n(lx), cx] (lane-splitting done in XLA)."""
        Z, Y, X = a.shape
        cx, p, n = self.cx, self.p, self.n
        m = a[..., : X - 1].reshape(Z, Y, cx, p)
        t = a[..., 1:].reshape(Z, Y, cx, p)[..., p - 1 : p]
        w = jnp.concatenate([m, t], axis=3)            # [Z, Y, cx, n]
        return w.transpose(0, 1, 3, 2)                 # [Z, Y, n, cx]

    def _xscatter_pair(self, wh, wl):
        """[..., n(lx), Y, cx] pair -> [..., Y, X] pair (lane merge in XLA)."""
        p, cx, X = self.p, self.cx, self.X
        lead = wh.shape[:-3]
        Y = wh.shape[-2]

        def parts(w):
            w = jnp.moveaxis(w, -3, -1)                # [..., Y, cx, n]
            main = w[..., :p].reshape(lead + (Y, cx * p))
            tail = jnp.concatenate(
                [jnp.zeros(lead + (Y, cx, p - 1), w.dtype), w[..., p:]], axis=-1
            ).reshape(lead + (Y, cx * p))
            pad = [(0, 0)] * (len(lead) + 1)
            return (
                jnp.pad(main, pad + [(0, 1)]),
                jnp.pad(tail, pad + [(1, 0)]),
            )

        mh, th = parts(wh)
        ml, tl = parts(wl)
        return df64_add(mh, ml, th, tl)

    # ------------------------------------------------------------ front
    def _front_kernel(self, xh_hbm, xl_hbm, packed_ref, sigma_ref, sh, sl, sem):
        zi = pl.program_id(0)
        p, n, N = self.p, self.n, self.N
        Y, cy, cx = self.Y, self.cy, self.cx
        cp = pltpu.make_async_copy(xh_hbm.at[pl.ds(zi * p, n)], sh, sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(xl_hbm.at[pl.ds(zi * p, n)], sl, sem)
        cp.start()
        cp.wait()

        def rows(s):
            # s: [n(lz), Y, n(lx), cx] -> [N, cy, cx]
            m = s[:, : Y - 1].reshape(n, cy, p, n, cx)
            t = s[:, 1:].reshape(n, cy, p, n, cx)[:, :, p - 1 : p]
            w = jnp.concatenate([m, t], axis=2)        # [lz, cy, ly, lx, cx]
            w = w.transpose(0, 2, 3, 1, 4)             # [lz, ly, lx, cy, cx]
            return w.reshape(N, cy, cx)

        uh = rows(sh[...])
        ul = rows(sl[...])
        s_ = jnp.max(jnp.abs(uh), axis=0, keepdims=True)
        from .pallas_windowed_sp import pow2_sigma

        sigma, _ = pow2_sigma(s_)                      # exact (CLAUDE.md exp2 note)   # [1, cy, cx]
        rh = uh / sigma
        rl = ul / sigma
        limbs = _limb_split_block(rh, rl, _N_LIMBS)
        packed_ref[0] = jnp.concatenate(limbs, axis=0)
        sigma_ref[0] = sigma[0]

    def front(self, xwh, xwl):
        cz, cy, cx = self.cz, self.cy, self.cx
        out_shapes = (
            jax.ShapeDtypeStruct((cz, _N_LIMBS * self.N, cy, cx), jnp.bfloat16),
            jax.ShapeDtypeStruct((cz, cy, cx), jnp.float32),
        )
        return pl.pallas_call(
            self._front_kernel,
            grid=(cz,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, _N_LIMBS * self.N, cy, cx),
                             lambda zi: (zi, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy, cx), lambda zi: (zi, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((self.n, self.Y, self.n, cx), jnp.float32),
                pltpu.VMEM((self.n, self.Y, self.n, cx), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=self.interpret,
        )(xwh, xwl)

    # ------------------------------------------------------------- back
    def _back_kernel(self, Y_ref, sigma_ref, outh_ref, outl_ref, acch, accl):
        m = pl.program_id(1)
        p, n, N = self.p, self.n, self.N
        cy, cx, Y = self.cy, self.cx, self.Y

        delta = self.sigma_K * 2.0 ** (-_LIMB_BITS * m.astype(jnp.float32))
        term = Y_ref[0] * delta.astype(jnp.float32) * sigma_ref[0][None]

        @pl.when(m == 0)
        def _():
            acch[...] = term
            accl[...] = jnp.zeros_like(term)

        @pl.when(m > 0)
        def _():
            nh, nl = df64_add(acch[...], accl[...], term, jnp.zeros_like(term))
            acch[...] = nh
            accl[...] = nl

        @pl.when(m == _MAX_M)
        def _():
            def unscatter(a):
                w = a.reshape(n, n, n, cy, cx)         # [lz, ly, lx, cy, cx]
                w = w.transpose(0, 2, 3, 1, 4)         # [lz, lx, cy, ly, cx]
                main = w[:, :, :, :p].reshape(n, n, cy * p, cx)
                tail = jnp.concatenate(
                    [jnp.zeros((n, n, cy, p - 1, cx), a.dtype), w[:, :, :, p:]],
                    axis=3,
                ).reshape(n, n, cy * p, cx)
                return (
                    jnp.pad(main, ((0, 0), (0, 0), (0, 1), (0, 0))),
                    jnp.pad(tail, ((0, 0), (0, 0), (1, 0), (0, 0))),
                )

            mh, th = unscatter(acch[...])
            ml, tl = unscatter(accl[...])
            yh, yl = df64_add(mh, ml, th, tl)          # [lz, lx, Y, cx]
            outh_ref[0] = yh
            outl_ref[0] = yl

    def back(self, Ymat, sigma):
        cz, cy, cx = self.cz, self.cy, self.cx
        n = self.n
        out_shapes = (
            jax.ShapeDtypeStruct((cz, n, n, self.Y, cx), jnp.float32),
            jax.ShapeDtypeStruct((cz, n, n, self.Y, cx), jnp.float32),
        )
        return pl.pallas_call(
            self._back_kernel,
            grid=(cz, _MAX_M + 1),
            in_specs=[
                pl.BlockSpec((1, self.N, cy, cx),
                             lambda zi, m: (zi, m, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cy, cx), lambda zi, m: (zi, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, n, n, self.Y, cx),
                             lambda zi, m: (zi, _I0, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, n, self.Y, cx),
                             lambda zi, m: (zi, _I0, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((self.N, cy, cx), jnp.float32),
                pltpu.VMEM((self.N, cy, cx), jnp.float32),
            ],
            interpret=self.interpret,
        )(Ymat, sigma)

    # -------------------------------------------------------------- apply
    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        p, n, N = self.p, self.n, self.N
        xm = jnp.where(self.interior, src, 0)
        xh, xl = split_f64(xm)
        xwh = self._xwindow(xh)
        xwl = self._xwindow(xl)
        packed, sigma = self.front(xwh, xwl)
        # matmul per layer: [6N_out, 6N_in] x [cz, 6N_in, cy, cx]
        Ymat = jax.lax.dot_general(
            self.KbigT, packed.reshape(self.cz, _N_LIMBS * N, -1),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [6N_out, cz, cy*cx]
        Ymat = Ymat.transpose(1, 0, 2).reshape(
            self.cz, (_MAX_M + 1) * N, self.cy, self.cx
        )
        sh, sl_ = self.back(Ymat, sigma)
        # x-scatter (lane merge) in XLA: [cz, lz, lx, Y, cx] -> [cz, lz, Y, X]
        yh, yl = self._xscatter_pair(
            sh.transpose(0, 1, 2, 3, 4), sl_
        )
        # z-overlap compensated add
        mh = yh[:, :p].reshape(self.cz * p, self.Y, self.X)
        ml_ = yl[:, :p].reshape(self.cz * p, self.Y, self.X)
        th = jnp.concatenate(
            [jnp.zeros((self.cz, p - 1, self.Y, self.X), jnp.float32),
             yh[:, p:]], axis=1).reshape(self.cz * p, self.Y, self.X)
        tl = jnp.concatenate(
            [jnp.zeros((self.cz, p - 1, self.Y, self.X), jnp.float32),
             yl[:, p:]], axis=1).reshape(self.cz * p, self.Y, self.X)
        pad_t = ((0, 1), (0, 0), (0, 0))
        pad_h = ((1, 0), (0, 0), (0, 0))
        zh, zl = df64_add(
            jnp.pad(mh, pad_t), jnp.pad(ml_, pad_t),
            jnp.pad(th, pad_h), jnp.pad(tl, pad_h),
        )
        y = join_f64(zh, zl)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs, lhs):
        y = self.vmult(jnp.where(self.interior, lhs, 0))
        y = jnp.where(self.interior, y, 0)
        return jnp.where(self.interior, rhs - y, rhs - lhs)
