"""Windowed-pair fused dp matvec: the speed-of-light Ozaki path.

The dp vector format for this operator is the X-WINDOWED f32 PAIR
``[Z, 2, Yp, G]`` where component 0/1 are the df64 (hi, lo) planes,
``Yp = ceil(Y/8)*8`` (sublane-aligned for sliced DMA) and ``G = (p+1)*cx``
lanes hold the j-major x-window ``w[..., j*cx + i] = u[..., p*i + j]``
(shared cell-boundary nodes stored twice; the j=p block duplicates the
j=0 block shifted by one cell).  This representation removes BOTH
measured glue walls of the f64 node-grid interface at 135M dofs:
f64<->pair conversion (~27 ms/matvec of XLA:TPU fp64 emulation) and the
lane-dimension window/scatter relayout (~38+50 ms in XLA, because
cross-lane shifted access materializes padded copies).

One Mosaic kernel per (z-slab, y-chunk) grid step performs:

    slab DMA (1-D leading-dim slice — the only sliced-DMA form that does
    not fault on v5e) -> lane-split 640->(5,128) -> y/z window ->
    per-cell power-of-2 scale -> 7-bit limb split -> triangular bf16
    group matmuls (exact f32 accumulation, 28 N x N blocks) ->
    compensated df64 recombination -> compensated y-unscatter with a
    sequential-carry fold of chunk-boundary rows -> in-kernel x-window
    re-emission (lane rolls) -> one clean [lz, rows, G] block store.

In-VMEM relayouts measured ~1 ms total at 513^3 (vs ~90 ms for the same
relayouts through XLA/HBM).  Only the z-overlap fold and the boundary
mask remain in XLA (~3 GB of clean-tiled traffic).

Counterpart of the reference's hand-fused dp kernel
(/root/reference/common/matrix_vector_kernel.h:30-216); the windowed
persistent vector format replaces deal.II's ghosted-vector + gather
tables (vector_access_reduced.h) with a layout the TPU lane model wants.
Accuracy class: identical to ops/laplace_dense.DenseLaplaceOzaki (same
limb scheme; bit-exact in interpret mode).
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
from .laplace_dense import (_LIMB_BITS, _MAX_M, _N_LIMBS, _split_limbs_f64,
                            element_matrix)
from .masks import bcast_and, interior_axes_jnp
from .pallas_windowed_sp import pow2_sigma

_I0 = np.int32(0)


class PallasWindowedOzaki:
    """dp A·u on windowed f32-pair vectors; p=4 3-D structured bricks."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None,
                 cy_chunk: int = 32, interpret: bool = False,
                 pad_to: int | None = None):
        assert grid.dim == 3 and grid.degree == 4
        self.grid = grid
        self.p, self.n, self.N = 4, 5, 125
        self.cz, self.cy, self.cx = grid.cells
        self.Z, self.Y, self.X = grid.shape
        self.Yp = -(-self.Y // 8) * 8
        # zero-padded window geometry for grids whose cx is not a multiple
        # of the native 128 lane tile (see PallasWindowedSP.__init__ —
        # same scheme, same invariants)
        if pad_to is not None:
            assert pad_to >= self.cx
            self.cxp = pad_to
        elif interpret:
            self.cxp = self.cx
        else:
            self.cxp = -(-self.cx // 128) * 128
        self.Xp = self.p * self.cxp + 1
        self.G = self.n * self.cxp
        self.interpret = interpret
        self.cy_b = min(cy_chunk, self.cy)
        while self.cy % self.cy_b:
            self.cy_b -= 1
        self.nyc = self.cy // self.cy_b
        K = element_matrix(grid, coef)
        sigma_K, limbs = _split_limbs_f64(K.T, _N_LIMBS)
        self.sigma_K = float(sigma_K)
        N = self.N
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

    # -------------------------------------------------- layout conversions
    @property
    def xmap(self):
        """Shared node<->x-window lane relayout (the single owner of the
        lane map; MXU permutation matmuls on hardware, reshapes in
        interpret — ops/pallas_windowed_sp.XWindowMap)."""
        if getattr(self, "_xmap", None) is None:
            from .pallas_windowed_sp import XWindowMap

            self._xmap = XWindowMap(self.p, self.cxp, self.Xp, self.G)
        return self._xmap

    def _pad_x(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.Xp - self.X)]
        return jnp.pad(x, pad) if self.Xp != self.X else x

    def to_windowed(self, x: jnp.ndarray) -> jnp.ndarray:
        """f64 node grid [Z, Y, X] -> windowed pair [Z, 2, Yp, G]
        (boundary values preserved; solver-boundary use)."""
        Y, Yp = self.Y, self.Yp
        xh, xl = split_f64(self._pad_x(x))
        xm = self.xmap

        def win(a):
            return jnp.pad(xm.win(a, self.interpret),
                           ((0, 0), (0, Yp - Y), (0, 0)))

        return jnp.stack([win(xh), win(xl)], axis=1)

    def from_windowed(self, w: jnp.ndarray) -> jnp.ndarray:
        """Windowed pair [Z, 2, Yp, G] -> f64 node grid [Z, Y, X].

        NOT a delegation to :meth:`from_windowed_pair`: the single fused
        slice ``w[:, 0, :Y]`` is load-bearing on hardware.  Splitting it
        into ``w[:, 0]`` + ``[:, :Y]`` (92233ee) changed XLA's fusion
        choices around the adjacent Mosaic custom call and ZEROED the
        kernel result of the fused node-entry vmult at most non-flagship
        shapes (dpwin_gate18 vs dpwin_gate3; ladder17 analyze/CG rows) —
        the same miscompile class as RESULTS_R3 finding 5.  Bisect:
        docs/tpu_r3/mid33_*.log + E0-E2 worktree gates 2026-08-20."""
        Y = self.Y
        xm = self.xmap
        return join_f64(xm.unwin(w[:, 0, :Y], self.interpret),
                        xm.unwin(w[:, 1, :Y], self.interpret))[..., : self.X]

    def from_windowed_pair(self, wh: jnp.ndarray,
                           wl: jnp.ndarray) -> jnp.ndarray:
        """(hi, lo) windowed planes [Z, Yp, G] -> f64 node grid."""
        Y = self.Y
        xm = self.xmap
        return join_f64(xm.unwin(wh[:, :Y], self.interpret),
                        xm.unwin(wl[:, :Y], self.interpret))[..., : self.X]

    def dup_weights(self) -> jnp.ndarray:
        """[G] weights for inner products on windowed vectors: j=p slots are
        duplicates of j=0 shifted (weight 0) except the global last node
        (pad slots are identically zero in every dotted vector)."""
        w = np.ones(self.G, np.float32)
        w[self.p * self.cxp :] = 0.0
        w[self.p * self.cxp + self.cxp - 1] = 1.0
        return jnp.asarray(w)

    # -------------------------------------------------------------- kernel
    def _matvec_planes(self, x_hbm, kst_ref, slab, carry_h, carry_l,
                       zcarry_h, zcarry_l, sem):
        """Shared matvec pipeline: DMA -> window -> 7-limb matmuls ->
        compensated unscatter/carries/masks; returns the block's finished
        output pair planes ([p, RW, G] hi, [p, RW, G] lo) with all
        sequential carries resolved (cf. PallasWindowedSP._matvec_planes —
        epilogue variants share this body so a divergence cannot introduce
        a hardware-only bug)."""
        zi = pl.program_id(0)
        yj = pl.program_id(1)
        p, n, N = self.p, self.n, self.N
        cy_b, cx, G = self.cy_b, self.cxp, self.G
        R = cy_b * p + 1
        F = cy_b * cx

        @pl.when(yj == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi * p, n)], slab, sem)
            cp.start()
            cp.wait()

        rows0 = yj * cy_b * p
        sh = slab[:, 0, pl.ds(rows0, R)]               # [n, R, G]
        sl = slab[:, 1, pl.ds(rows0, R)]

        def rows(s):
            s4 = s.reshape(n, R, n, cx)                # lane split
            m_ = s4[:, : R - 1].reshape(n, cy_b, p, n, cx)
            t_ = s4[:, 1:].reshape(n, cy_b, p, n, cx)[:, :, p - 1 : p]
            w = jnp.concatenate([m_, t_], axis=2)      # [lz, cy_b, ly, lx, cx]
            w = w.transpose(0, 2, 3, 1, 4)             # [lz, ly, lx, cy_b, cx]
            return w.reshape(N, F)

        uh = rows(sh)
        ul = rows(sl)
        # power-of-2 scale via exponent-bit extraction: f32 exp2 is
        # INEXACT on integer arguments (exp2(21.0) = 2^21+1 on XLA:CPU,
        # 34 bad points on TPU — CLAUDE.md exp2 note; the inverse is the
        # exact exponent negation 0x7F000000 - bits)
        s_ = jnp.max(jnp.abs(uh), axis=0, keepdims=True)
        sigma, inv_sigma = pow2_sigma(s_)              # [1, F]
        rh = uh * inv_sigma
        rl = ul * inv_sigma
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

        acc_h = acc_l = None
        for m in range(_MAX_M + 1):
            Km = kst_ref[self.off[m] : self.off[m + 1], :]
            Ym = jax.lax.dot_general(
                Km, big[: (m + 1) * N],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [N, F] exact f32
            delta = np.float32(self.sigma_K * 2.0 ** (-_LIMB_BITS * m))
            term = Ym * (delta * sigma)                # fold per column
            if acc_h is None:
                acc_h, acc_l = term, jnp.zeros_like(term)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, term,
                                        jnp.zeros_like(term))

        # y-unscatter with chunk-boundary carry: rows [cy_b*p, lz, lx, cx]
        def y_parts(a):
            w = a.reshape(n, n, n, cy_b, cx)           # [lz, ly, lx, cy_b, cx]
            w = w.transpose(3, 1, 0, 2, 4)             # [cy_b, ly, lz, lx, cx]
            main = w[:, :p].reshape(cy_b * p, n, n, cx)
            tail = w[:, p]                             # [cy_b, lz, lx, cx]
            # tail of cell k adds at row (k+1)*p: shift by one cell
            tsh = jnp.concatenate(
                [jnp.zeros((1, n, n, cx), a.dtype), tail[: cy_b - 1]], axis=0)
            tpad = jnp.concatenate(
                [tsh[:, None], jnp.zeros((cy_b, p - 1, n, n, cx), a.dtype)],
                axis=1).reshape(cy_b * p, n, n, cx)
            return main, tpad, tail[cy_b - 1]

        mh, th, tl_h = y_parts(acc_h)
        ml, tl, tl_l = y_parts(acc_l)
        yh, yl = df64_add(mh, ml, th, tl)              # [rows, lz, lx, cx]

        # fold the incoming carry (previous chunk's boundary row) into row 0;
        # the grid iterates yj innermost/sequentially, so the carry scratch
        # holds the previous chunk's boundary row of the SAME slab.  At
        # yj == 0 the scratch is stale (previous slab) -> select 0.
        cin_h = jnp.where(yj > 0, carry_h[...], 0.0)   # [n, n, cx]
        cin_l = jnp.where(yj > 0, carry_l[...], 0.0)
        r0h, r0l = df64_add(yh[0], yl[0], cin_h, cin_l)
        yh = jnp.concatenate([r0h[None], yh[1:]], axis=0)   # .at[0].set emits
        yl = jnp.concatenate([r0l[None], yl[1:]], axis=0)   # scatter: no TC

        carry_h[...] = tl_h
        carry_l[...] = tl_l

        # x-window re-emission: w[j*cx+i] = y[p*i+j]; shared nodes (j=0)
        # combine two cells' partials -> compensated add.  All concat inputs
        # must share sublane offset 0 (Mosaic rejects offset mismatch on
        # non-concat dims), so the j-blocks come from ONE contiguous
        # sublane->lane reshape and the j=0 combine is a zero-padded add.
        _one = np.int32(1)                             # i64 shifts break Mosaic
        _cxm1 = np.int32(cx - 1)
        RW = cy_b * p
        mh_, ml_ = (a[:, :, :p].reshape(RW, n, p * cx) for a in (yh, yl))
        tail_h = pltpu.roll(yh[:, :, p], _one, 2)      # cell i-1 tail -> cell i
        tail_l = pltpu.roll(yl[:, :, p], _one, 2)
        zpad = jnp.zeros((RW, n, (p - 1) * cx), jnp.float32)
        wh_, wl_ = df64_add(mh_, ml_,
                            jnp.concatenate([tail_h, zpad], axis=-1),
                            jnp.concatenate([tail_l, zpad], axis=-1))
        wph = pltpu.roll(wh_[:, :, :cx], _cxm1, 2)     # i+1 duplicate block
        wpl = pltpu.roll(wl_[:, :, :cx], _cxm1, 2)
        wh = jnp.concatenate([wh_, wph], axis=-1).transpose(1, 0, 2)
        wl = jnp.concatenate([wl_, wpl], axis=-1).transpose(1, 0, 2)
        # [lz, RW, G]

        # ---- in-kernel z-overlap fold (replaces an XLA pass chain whose
        # temps cost ~4 GB at 513^3): slab zi's plane lz == p is plane
        # lz == 0 of slab zi+1.  zi iterates OUTERMOST and sequentially, so
        # a [cy*p, G] scratch row-range per y-chunk carries the boundary
        # plane to the next slab.  Boundary masks fold in here too: the
        # carried-out global top plane (z = Z-1) is simply never emitted,
        # plane z = 0 is zeroed via the zi == 0 carry select, and the
        # global y = 0 row / windowed x slots are masked arithmetically.
        rows0 = yj * RW
        cin_zh = jnp.where(zi > 0, zcarry_h[pl.ds(rows0, RW), :], 0.0)
        cin_zl = jnp.where(zi > 0, zcarry_l[pl.ds(rows0, RW), :], 0.0)
        zcarry_h[pl.ds(rows0, RW), :] = wh[p]
        zcarry_l[pl.ds(rows0, RW), :] = wl[p]
        p0h, p0l = df64_add(wh[0], wl[0], cin_zh, cin_zl)
        # mask: global z = 0 plane (whole first emitted plane of slab 0),
        # global y = 0 row (row 0 of chunk 0 in EVERY slab), windowed x
        # boundary slots
        _f0, _f1 = np.float32(0.0), np.float32(1.0)   # bare 0.0/1.0 would
        #                           trace as f64 under x64 -> 64-bit vectors
        #                           crash Mosaic's layout inference
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (RW, G), 0)
        ymask = jnp.where((yj == 0) & (row_ids == 0), _f0, _f1)
        zmask0 = jnp.where(zi == 0, _f0, _f1)
        # x boundary slots are lanes 0 (j=0,i=0 -> x=0) and G-1 (j=p,
        # i=cx-1 -> x=X-1); built from iota (array constants can't be
        # captured by a pallas kernel)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (RW, G), 1)
        # node-id arithmetic mask (see pallas_windowed_sp._matvec_planes):
        # zeroes x boundaries + every pad slot; == lane 0 | G-1 when
        # cxp == cx
        node = p * (lane_ids % np.int32(cx)) + lane_ids // np.int32(cx)
        xm = jnp.where((node == 0) | (node >= np.int32(self.X - 1)),
                       _f0, _f1)
        p0h = p0h * (zmask0 * ymask * xm)
        p0l = p0l * (zmask0 * ymask * xm)
        bh = jnp.concatenate([p0h[None], wh[1:p] * (ymask * xm)[None]], axis=0)
        bl = jnp.concatenate([p0l[None], wl[1:p] * (ymask * xm)[None]], axis=0)
        return bh, bl                                  # [p, RW, G] each

    def _kernel(self, x_hbm, kst_ref, out_ref, slab, carry_h, carry_l,
                zcarry_h, zcarry_l, sem):
        bh, bl = self._matvec_planes(x_hbm, kst_ref, slab, carry_h, carry_l,
                                     zcarry_h, zcarry_l, sem)
        out_ref[0, :, 0, 0] = bh                       # [p, RW, G]
        out_ref[0, :, 1, 0] = bl

    def _fused(self, xw):
        n, G, cy_b = self.n, self.G, self.cy_b
        p = self.p
        cz, nyc = self.cz, self.nyc
        rows = cy_b * p
        out_shape = jax.ShapeDtypeStruct((cz, p, 2, nyc, rows, G), jnp.float32)
        flops = 2 * sum((m + 1) for m in range(_MAX_M + 1)) * self.N**2 \
            * self.cy * self.cx * cz
        return pl.pallas_call(
            self._kernel,
            grid=(cz, nyc),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((self.off[-1], self.N),
                             lambda zi, yj: (_I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, p, 2, 1, rows, G),
                lambda zi, yj: (zi, _I0, _I0, yj, _I0, _I0),
                memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((n, 2, self.Yp, G), jnp.float32),
                pltpu.VMEM((n, n, self.cxp), jnp.float32),
                pltpu.VMEM((n, n, self.cxp), jnp.float32),
                pltpu.VMEM((self.cy * p, G), jnp.float32),
                pltpu.VMEM((self.cy * p, G), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xw.size * 4 + cz * p * 2 * nyc * rows * G * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(xw, self.Kstack)

    # ---------------------------------------------------------- pair apply
    def vmult_windowed(self, xw: jnp.ndarray) -> jnp.ndarray:
        """Windowed pair in/out; ASSUMES boundary-zero input (the dp solve
        invariant) and returns a boundary-zero result.  The z-overlap fold
        and boundary masks live in the kernel; the XLA tail is one reshape
        (layout-preserving) plus one zero-pad for the top z plane and the
        sublane-alignment y rows."""
        p, G = self.p, self.G
        cz, Y, Yp = self.cz, self.Y, self.Yp
        # barriers pin the kernel operand/result as standalone values: when
        # XLA fuses the layout conversions into the same program as the
        # custom call, its layout/fusion choices around the call miscompile
        # (measured: fused vmult wrong at (16,16,128), staged correct,
        # deterministic; kernel itself bit-exact vs the XLA fold)
        xw = jax.lax.optimization_barrier(xw)
        o = self._fused(xw)                            # [cz, p, 2, nyc, r, G]
        o = jax.lax.optimization_barrier(o)
        o = o.reshape(cz * p, 2, Y - 1, G)
        return jnp.pad(o, ((0, 1), (0, 0), (0, Yp - Y + 1), (0, 0)))

    # ----------------------------------------------------- f64 convenience
    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """f64 node-grid interface (conversion included; solver hot paths
        should use vmult_windowed on persistent windowed pairs)."""
        xm = jnp.where(self.interior, src, 0)
        yw = self.vmult_windowed(self.to_windowed(xm))
        y = self.from_windowed(yw)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs, lhs):
        y = self.vmult(jnp.where(self.interior, lhs, 0))
        y = jnp.where(self.interior, y, 0)
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    def residual_defect_win(self, rhs_w, lhs):
        """Constrained f32 V-cycle defect in the sp windowed layout
        [Z, Yp, G]: ``float(rhs - A lhs)`` on interior dofs, zero on the
        boundary — the reference's dp-residual-to-sp rounding
        (/root/reference/common/multigrid_solver.h:432-437) emitted
        straight into the fused smoother's persistent layout.

        ``rhs_w`` is the PRECOMPUTED windowed pair of the constrained rhs
        (``to_windowed(where(interior, rhs, 0))``, built once per solve —
        rhs is constant), so the pair->node->window roundtrip between the
        dp residual and the windowed V-cycle disappears: the defect is the
        hi plane of one elementwise compensated pair subtraction.  Both
        operands are boundary-zero consistent windowed pairs, so the
        result needs no further masking."""
        from .df64 import df64_add

        xw = self.to_windowed(jnp.where(self.interior, lhs, 0))
        yw = self.vmult_windowed(xw)
        dh, _ = df64_add(rhs_w[:, 0], rhs_w[:, 1], -yw[:, 0], -yw[:, 1])
        return dh

    def residual_defect_win_pair(self, rhs_w, lhs_w):
        """:meth:`residual_defect_win` with the prolongated dp solution
        ALREADY in the windowed pair layout (interior-masked, consistent
        duplicates — ops/transfer.OzakiWindowedProlongate): the node grid
        never materializes between the FMG transfer and the V-cycle."""
        yw = self.vmult_windowed(lhs_w)
        dh, _ = df64_add(rhs_w[:, 0], rhs_w[:, 1], -yw[:, 0], -yw[:, 1])
        return dh


class WindowedHybridOzaki:
    """Flagship dp operator: fused windowed Mosaic kernel + XLA fallback.

    ``.win`` (PallasWindowedOzaki) serves the pair-native CG hot loop —
    persistent windowed vectors, zero per-iteration conversions.  On TPU
    the f64 node-grid vmult / vmult_residual entry points (FMG residuals)
    also route through the kernel + MXU permutation conversions
    (pallas_windowed_sp.perm_mm): hardware A/B 2026-08-19 measured
    flagship FMG 0.878 s vs 0.905 s on the chunked-XLA node path, same
    L2 error (docs/tpu_r3/bench_nodewin2.log) — the ROUND-2 relayouts
    that made windowed-with-conversions slower are gone since the
    perm_mm precision fix.  ``MGT_DP_NODE_VIA_WIN=0`` restores the
    DenseLaplaceOzakiChunked delegation (which still serves rhs
    assembly, diagonals and diagnostics either way).  In interpret mode
    (off-TPU) the chunked path stays the default — the kernel emulation
    is the slow side there.  Same limb scheme on both sides: bit-exact
    agreement (tests/test_pallas_windowed)."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None,
                 interpret: bool = False, cy_chunk: int = 32):
        import os

        from .laplace_dense import DenseLaplaceOzakiChunked

        self.win = PallasWindowedOzaki(grid, coef, interpret=interpret,
                                       cy_chunk=cy_chunk)
        self._chunked = DenseLaplaceOzakiChunked(grid, coef)
        env = os.environ.get("MGT_DP_NODE_VIA_WIN")
        via_win = (not interpret) if env is None else env not in ("", "0")
        if via_win:
            self.vmult = self.win.vmult
            self.vmult_residual = self.win.vmult_residual

    def __getattr__(self, name):
        return getattr(self._chunked, name)
