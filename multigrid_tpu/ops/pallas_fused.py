"""Fully-fused Pallas dp matvec (Ozaki limb scheme) for FE_Q(4) 3-D bricks.

One Mosaic kernel per (z-slab, y-chunk) grid step performs what the XLA
Ozaki path (ops/laplace_dense.DenseLaplaceOzakiChunked) spreads over ~10
HBM-materialized passes (window gathers, 6-D transposes, limb packing,
group matmuls, compensated scatter):

    DMA slab -> y/z window -> per-cell power-of-2 scale -> 7-bit limb
    split -> 7 triangular bf16 group matmuls on the MXU (exact f32
    accumulation) -> compensated (df64) recombination -> compensated
    y-scatter accumulated into a REVISITED output window.

Only the x-direction window/scatter (lane-dimension splits/merges, which
Mosaic restricts) and the z-overlap fold stay in XLA — three cheap
bandwidth passes.  HBM traffic per matvec drops from ~45 GB to ~13 GB.

Counterpart of the reference's hand-fused hot loop
(/root/reference/common/matrix_vector_kernel.h:30-216 and the fused DG
kernel laplace_operator_dg.h:1110-1861) — re-derived for the MXU: the
whole 125x125 element operator is a batched matmul, limbs make the bf16
products exact (2*7-bit mantissas) and the f32 accumulation of up to
(m+1)*125 < 2^10 terms stays exact (see ops/laplace_dense.py).

Constraints: degree 4, dim 3, cx % 128 == 0 (lane tiling), cy divisible
by the y-chunk.  Callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh.brick import DofGrid
from .df64 import df64_add, join_f64, split_f64, two_sum
from .laplace import DiagCoef
from .laplace_dense import (_LIMB_BITS, _MAX_M, _N_LIMBS, _split_limbs_f64,
                            element_matrix)
from .masks import bcast_and, interior_axes_jnp

# index-map literals must be 32-bit under jax_enable_x64 (i64 breaks Mosaic)
_I0 = np.int32(0)


class PallasFusedOzaki:
    """dp A·u in one fused kernel + 2 XLA glue passes; p=4 3-D bricks."""

    # hardware-bisection stages: 'dma' (window only), 'limb' (+ limb
    # split), 'matmul' (+ group matmuls), 'full' (everything)
    _stage = "full"

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None,
                 cy_chunk: int = 32, interpret: bool = False):
        assert grid.dim == 3 and grid.degree == 4
        self.grid = grid
        self.p, self.n, self.N = 4, 5, 125
        self.cz, self.cy, self.cx = grid.cells
        self.Z, self.Y, self.X = grid.shape
        self.interpret = interpret
        if not interpret:
            assert self.cx % 128 == 0, "lane tiling needs cx % 128 == 0"
        self.cy_b = min(cy_chunk, self.cy)
        while self.cy % self.cy_b:
            self.cy_b -= 1
        self.nyc = self.cy // self.cy_b
        K = element_matrix(grid, coef)
        sigma_K, limbs = _split_limbs_f64(K.T, _N_LIMBS)
        self.sigma_K = float(sigma_K)
        N = self.N
        # triangular group stack: group m rows [off[m], off[m]+(m+1)N) hold
        # vstack(limbs[m-l] for l in 0..m); the group matmul contracts the
        # input-limb PREFIX against it (28 N x N blocks total vs 49 for the
        # padded square scheme — see ops/laplace_dense.py)
        self.off = [0]
        blocks = []
        for m in range(_MAX_M + 1):
            blocks.append(np.vstack([limbs[m - l] for l in range(m + 1)]))
            self.off.append(self.off[-1] + (m + 1) * N)
        self.Kstack = jnp.asarray(np.vstack(blocks), jnp.bfloat16)
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
        """[cz, Y, n(lz), n(lx), cx] pair -> [cz, n(lz), Y, X] pair."""
        p, cx, X = self.p, self.cx, self.X
        n = self.n

        def parts(w):
            w = w.transpose(0, 2, 1, 4, 3)             # [cz, lz, Y, cx, lx]
            lead = w.shape[:-2]                        # (cz, lz, Y)
            main = w[..., :p].reshape(lead + (cx * p,))
            tail = jnp.concatenate(
                [jnp.zeros(lead + (cx, p - 1), w.dtype), w[..., p:]], axis=-1
            ).reshape(lead + (cx * p,))
            pad = [(0, 0)] * len(lead)
            return (jnp.pad(main, pad + [(0, 1)]),
                    jnp.pad(tail, pad + [(1, 0)]))

        mh, th = parts(wh)
        ml, tl = parts(wl)
        return df64_add(mh, ml, th, tl)

    def _zy_window(self, a):
        """[Z, Y, n(lx), cx] -> [cz, nyc, n(lz), R, n(lx), cx] blocked slabs.

        Pre-windows z and y in XLA so the kernel's inputs are
        NON-OVERLAPPING blocks that Mosaic pipelines automatically
        (a manual in-kernel DMA with a 2-D-sliced source faults at runtime
        on v5e, measured) — duplication cost is one z-plane per slab
        (25%) and one y-row per chunk (<1%)."""
        Z, Y = self.Z, self.Y
        n, p = self.n, self.p
        cz, cy_b, nyc = self.cz, self.cy_b, self.nyc
        R = cy_b * p + 1
        m = a[: Z - 1].reshape(cz, p, Y, n, self.cx)
        t = a[1:].reshape(cz, p, Y, n, self.cx)[:, p - 1 : p]
        w = jnp.concatenate([m, t], axis=1)        # [cz, n(lz), Y, lx, cx]
        m = w[:, :, : Y - 1].reshape(cz, n, nyc, cy_b * p, n, self.cx)
        t = w[:, :, 1:].reshape(cz, n, nyc, cy_b * p, n, self.cx)[
            :, :, :, cy_b * p - 1 : cy_b * p]
        w = jnp.concatenate([m, t], axis=3)        # [cz, lz, nyc, R, lx, cx]
        return w.transpose(0, 2, 1, 3, 4, 5)       # [cz, nyc, lz, R, lx, cx]

    # ------------------------------------------------------------- kernel
    def _kernel(self, xh_ref, xl_ref, kst_ref, outh_ref, outl_ref):
        yj = pl.program_id(1)
        p, n, N = self.p, self.n, self.N
        cy_b, cx = self.cy_b, self.cx
        R = cy_b * p + 1
        F = cy_b * cx
        rows0 = yj * (cy_b * p)
        sh = xh_ref[0, 0]
        sl = xl_ref[0, 0]

        def rows(s):
            # s: [n(lz), R, n(lx), cx] -> [N, F] cell-dof rows
            m_ = s[:, : R - 1].reshape(n, cy_b, p, n, cx)
            t_ = s[:, 1:].reshape(n, cy_b, p, n, cx)[:, :, p - 1 : p]
            w = jnp.concatenate([m_, t_], axis=2)      # [lz, cy_b, ly, lx, cx]
            w = w.transpose(0, 2, 3, 1, 4)             # [lz, ly, lx, cy_b, cx]
            return w.reshape(N, F)

        uh = rows(sh)
        ul = rows(sl)

        def _debug_write(a_flat):
            """Write a [N, F] f32 block into the output rows (bisection)."""
            @pl.when(yj == 0)
            def _():
                outh_ref[...] = jnp.zeros_like(outh_ref)
                outl_ref[...] = jnp.zeros_like(outl_ref)
            v = a_flat.reshape(n, n, n, cy_b, cx)
            w = v.transpose(3, 1, 0, 2, 4)[:, :p].reshape(cy_b * p, n, n, cx)
            outh_ref[0, pl.ds(rows0, cy_b * p)] = w
            outl_ref[0, pl.ds(rows0, cy_b * p)] = w

        if self._stage == "dma":
            _debug_write(uh)
            return
        s_ = jnp.max(jnp.abs(uh), axis=0, keepdims=True)
        from .pallas_windowed_sp import pow2_sigma

        sigma, _ = pow2_sigma(s_)                      # exact (CLAUDE.md exp2 note)   # [1, F]
        rh = uh / sigma
        rl = ul / sigma
        limbs = []
        for k in range(_N_LIMBS):
            scale = np.float32(2.0 ** (_LIMB_BITS * (k + 1)))
            inv = np.float32(2.0 ** (-_LIMB_BITS * (k + 1)))
            chopped = jnp.round(rh * scale) * inv
            rh = rh - chopped                          # exact (aligned grids)
            rh, rl = two_sum(rh, rl)
            limbs.append(
                (chopped * np.float32(2.0 ** (_LIMB_BITS * k))
                 ).astype(jnp.bfloat16))
        big = jnp.concatenate(limbs, axis=0)           # [7N, F] bf16
        if self._stage == "limb":
            _debug_write(big[:N].astype(jnp.float32))
            return

        acc_h = acc_l = None
        for m in range(_MAX_M + 1):
            Km = kst_ref[self.off[m] : self.off[m + 1], :]   # [(m+1)N, N]
            Ym = jax.lax.dot_general(
                Km, big[: (m + 1) * N],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [N, F] exact f32
            delta = np.float32(self.sigma_K * 2.0 ** (-_LIMB_BITS * m))
            term = Ym * delta * sigma
            if acc_h is None:
                acc_h, acc_l = term, jnp.zeros_like(term)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, term,
                                        jnp.zeros_like(term))
        if self._stage == "matmul":
            _debug_write(acc_h)
            return

        # y-unscatter to [R, lz, lx, cx] with compensated main/tail merge
        def unscat(a):
            w = a.reshape(n, n, n, cy_b, cx)           # [lz, ly, lx, cy_b, cx]
            w = w.transpose(3, 1, 0, 2, 4)             # [cy_b, ly, lz, lx, cx]
            main = w[:, :p].reshape(cy_b * p, n, n, cx)
            tail = jnp.concatenate(
                [jnp.zeros((cy_b, p - 1, n, n, cx), a.dtype), w[:, p:]],
                axis=1).reshape(cy_b * p, n, n, cx)
            pads = ((0, 1), (0, 0), (0, 0), (0, 0))
            padt = ((1, 0), (0, 0), (0, 0), (0, 0))
            return jnp.pad(main, pads), jnp.pad(tail, padt)

        mh, th = unscat(acc_h)
        ml, tl = unscat(acc_l)
        yh, yl = df64_add(mh, ml, th, tl)              # [R, lz, lx, cx]

        @pl.when(yj == 0)
        def _():
            outh_ref[...] = jnp.zeros_like(outh_ref)
            outl_ref[...] = jnp.zeros_like(outl_ref)

        cur_h = outh_ref[0, pl.ds(rows0, R)]
        cur_l = outl_ref[0, pl.ds(rows0, R)]
        nh, nl = df64_add(cur_h, cur_l, yh, yl)
        outh_ref[0, pl.ds(rows0, R)] = nh
        outl_ref[0, pl.ds(rows0, R)] = nl

    def _fused(self, xwh, xwl):
        n, cx = self.n, self.cx
        cz, Y = self.cz, self.Y
        out_shapes = (
            jax.ShapeDtypeStruct((cz, Y, n, n, cx), jnp.float32),
            jax.ShapeDtypeStruct((cz, Y, n, n, cx), jnp.float32),
        )
        R = self.cy_b * self.p + 1
        flops = 2 * sum((m + 1) for m in range(_MAX_M + 1)) * self.N**2 \
            * self.cy * self.cx * cz
        zwh = self._zy_window(xwh)
        zwl = self._zy_window(xwl)
        in_spec = pl.BlockSpec(
            (1, 1, n, R, n, cx),
            lambda zi, yj: (zi, yj, _I0, _I0, _I0, _I0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            self._kernel,
            grid=(cz, self.nyc),
            in_specs=[
                in_spec,
                in_spec,
                pl.BlockSpec((self.off[-1], self.N),
                             lambda zi, yj: (_I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, Y, n, n, cx),
                             lambda zi, yj: (zi, _I0, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Y, n, n, cx),
                             lambda zi, yj: (zi, _I0, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xwh.size * 8 + cz * Y * n * n * cx * 8,
                transcendentals=xwh.size // 4,
            ),
            # kernel-body temporaries (limb stack, group products, df64
            # accumulators) need ~45MB scoped VMEM; the default 16MB cap is
            # far below the v5e's 128MB
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
        )(zwh, zwl, self.Kstack)

    # -------------------------------------------------------------- apply
    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        p = self.p
        xm = jnp.where(self.interior, src, 0)
        xh, xl = split_f64(xm)
        sh_, sl_ = self._fused(self._xwindow(xh), self._xwindow(xl))
        yh, yl = self._xscatter_pair(sh_, sl_)         # [cz, lz, Y, X]
        # z-overlap compensated fold
        cz, Y, X = self.cz, self.Y, self.X
        mh = yh[:, :p].reshape(cz * p, Y, X)
        ml_ = yl[:, :p].reshape(cz * p, Y, X)
        th = jnp.concatenate(
            [jnp.zeros((cz, p - 1, Y, X), jnp.float32), yh[:, p:]],
            axis=1).reshape(cz * p, Y, X)
        tl = jnp.concatenate(
            [jnp.zeros((cz, p - 1, Y, X), jnp.float32), yl[:, p:]],
            axis=1).reshape(cz * p, Y, X)
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
