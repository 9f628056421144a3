"""Windowed fused sp matvec: the speed-of-light smoother path.

Single-precision sibling of ops/pallas_windowed (the dp pair kernel): the
sp vector format is the X-WINDOWED f32 plane ``[Z, Yp, G]`` — one component
of the dp pair layout, same lane map ``w[..., j*cx + i] = u[..., p*i + j]``.
The V-cycle smoother carries its vectors persistently in this layout
(solvers/multigrid.MultigridSolver, sp_impl="pallas_windowed"), so every
Chebyshev matvec runs as one Mosaic kernel with ZERO XLA window/scatter
relayouts — the glue that bounds the dense-element XLA path
(ops/laplace_dense.DenseLaplaceF32Chunked) at ~4 GDoF/s.

Per (z-slab, y-chunk) grid step:

    slab DMA -> lane split -> y/z window -> per-cell power-of-2 scale ->
    8-bit limb split (EXACT: 3 x 8 bits cover the full f32 mantissa) ->
    triangular bf16 group matmuls (6 N x N block products, m = k+l <= 2,
    dropped cross terms ~2^-24 relative — the accuracy class of an f32
    HIGHEST-precision matmul) -> f32 recombination -> y-unscatter with a
    sequential-carry fold -> in-kernel x-window re-emission -> one clean
    [lz, rows, G] block store.

Counterpart of the reference's float smoother matvec (the sp operand of
/root/reference/common/matrix_vector_kernel.h:30-216, driven by
PreconditionChebyshev at multigrid_solver.h:268-291); the persistent
windowed layout replaces deal.II's ghosted-vector gather tables
(vector_access_reduced.h) with the layout the TPU lane model wants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh.brick import DofGrid
from .laplace import DiagCoef
from .laplace_dense import _split_limbs_f64, element_matrix
from .masks import bcast_and, interior_axes_jnp

_I0 = np.int32(0)


def pow2_sigma(s_: jnp.ndarray):
    """(sigma, 1/sigma) per-column power-of-2 limb scale via exponent-bit
    extraction — EXACT, replacing ``exp2(ceil(log2(s)))`` which is inexact
    on integer arguments on both XLA:CPU and XLA:TPU (CLAUDE.md exp2 note;
    probe experiments/debug_exp2.py).  The inverse of a normal power of
    two is the exact exponent negation ``0x7F000000 - bits``."""
    s_ = jnp.maximum(s_.astype(jnp.float32), np.float32(1e-30))
    bits = jax.lax.bitcast_convert_type(s_, jnp.uint32)
    p2 = jax.lax.bitcast_convert_type(
        bits & np.uint32(0x7F800000), jnp.float32)
    sigma = jnp.where(s_ == p2, p2, p2 * np.float32(2.0))
    inv = jax.lax.bitcast_convert_type(
        np.uint32(0x7F000000)
        - jax.lax.bitcast_convert_type(sigma, jnp.uint32), jnp.float32)
    return sigma, inv

_LIMB_BITS_SP = 8     # 3 x 8 = 24 bits: exact split of an f32 input
_N_LIMBS_SP = 3
_MAX_M_SP = 2         # pairs k+l <= 2: 6 block products, ~2^-24 truncation


def window_perm_matrices(p: int, cx: int, X: int, G: int):
    """0/1 x-window permutation matrices (node->window [X, G] and
    window->node [G, X]) as f32 NUMPY constants for the MXU relayout.
    Kept numpy on purpose: XWindowMap memoizes them and the first call may
    happen inside a jit trace — a jnp array created there is a tracer and
    leaks into later traces (measured: solve_analyze after solve at 513^3);
    numpy constants embed safely into every consuming executable."""
    Pw = np.zeros((X, G), np.float32)
    for j in range(p + 1):
        for i in range(cx):
            Pw[min(p * i + j, X - 1), j * cx + i] = 1.0
    Pu = np.zeros((G, X), np.float32)
    for nn in range(X - 1):
        Pu[(nn % p) * cx + nn // p, nn] = 1.0
    Pu[p * cx + cx - 1, X - 1] = 1.0
    return Pw, Pu


def perm_mm(a: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """EXACT f32 permutation matmul: one dot_general at Precision.HIGHEST.
    The lane relayout rides the MXU instead of XLA's padded-copy shifts
    (the measured ~19 ms/plane glue at 513^3).

    Exactness on TPU: HIGHEST decomposes each f32 operand into three bf16
    limbs and accumulates all nine cross products in f32; with a 0/1
    matrix every output receives exactly one input's limbs times 1.0,
    whose f32 sum reconstructs the input bit-exactly (verified on v5e,
    experiments/debug_dpwin.py).  Two earlier forms FAILED on hardware
    while passing every CPU/interpret test: a DEFAULT-precision dot
    silently quantizes to bf16 (1.4e-2 relayout dev — root cause of the
    2026-08-18 flagship pair-CG cg_L2error 4.9e-4), and a hand-split
    3-limb compensated form needed an optimization_barrier whose presence
    re-triggered the known XLA fusion miscompile around the adjacent
    Mosaic custom call.  One plain HIGHEST dot has neither failure mode.
    """
    dims = (((a.ndim - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, P, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


class XWindowMap:
    """The node<->x-window lane relayout for one (p, cx) geometry — the
    SINGLE owner of the lane map ``w[..., j*cx + i] = u[..., p*i + j]``
    used by the sp kernel, the dp pair kernel, and the pair vector ops.
    On hardware the relayout rides the MXU (perm_mm); interpret/CPU keeps
    reshapes (bit-identical, pinned in tests)."""

    def __init__(self, p: int, cx: int, X: int, G: int):
        self.p, self.cx, self.X, self.G = p, cx, X, G
        self._Pw = self._Pu = None

    def _mats(self):
        if self._Pw is None:
            self._Pw, self._Pu = window_perm_matrices(
                self.p, self.cx, self.X, self.G)
        return self._Pw, self._Pu

    def win(self, a: jnp.ndarray, interpret: bool) -> jnp.ndarray:
        """f32 [..., X] -> [..., G] (no y/z padding)."""
        p, cx, X, G = self.p, self.cx, self.X, self.G
        if not interpret:
            return perm_mm(a, self._mats()[0])
        lead = a.shape[:-1]
        m = a[..., : X - 1].reshape(lead + (cx, p))
        t = a[..., 1:].reshape(lead + (cx, p))[..., p - 1:]
        w = jnp.concatenate([m, t], axis=-1)           # [..., cx, n]
        return jnp.swapaxes(w, -1, -2).reshape(lead + (G,))

    def unwin(self, a: jnp.ndarray, interpret: bool) -> jnp.ndarray:
        """f32 [..., G] -> [..., X]."""
        p, cx, X = self.p, self.cx, self.X
        if not interpret:
            return perm_mm(a, self._mats()[1])
        lead = a.shape[:-1]
        v = a.reshape(lead + (p + 1, cx))
        main = jnp.swapaxes(v[..., :p, :], -1, -2).reshape(lead + (cx * p,))
        last = v[..., p, cx - 1: cx]
        return jnp.concatenate([main, last], axis=-1)


class PallasWindowedSP:
    """sp A·u on windowed f32 vectors; p=4 3-D structured bricks."""

    def __init__(self, grid: DofGrid, coef: DiagCoef | None = None,
                 cy_chunk: int = 32, interpret: bool = False,
                 pad_to: int | None = None):
        assert grid.dim == 3 and grid.degree == 4
        self.grid = grid
        self.p, self.n, self.N = 4, 5, 125
        self.cz, self.cy, self.cx = grid.cells
        self.Z, self.Y, self.X = grid.shape
        self.Yp = -(-self.Y // 8) * 8
        # Lane padding: the kernel's internal lane split needs the window
        # count to be a multiple of the native 128 lane tile (Mosaic cannot
        # lower the G -> (n, cx) cast otherwise — measured on v5e).  Grids
        # with other cx run on a ZERO-PADDED window geometry cxp =
        # ceil(cx/128)*128: pad cells carry zeros end to end (zero input ->
        # zero element matvec; the boundary mask zeroes the one lane where
        # a real value leaks into the pad region, see _matvec_planes).
        # Interpret mode keeps cxp = cx unless a pad is requested (tests).
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
        sigma_K, limbs = _split_limbs_f64(K.T, _N_LIMBS_SP, _LIMB_BITS_SP)
        self.sigma_K = float(sigma_K)
        N = self.N
        self.off = [0]
        blocks = []
        for m in range(_MAX_M_SP + 1):
            blocks.append(np.vstack([limbs[m - l] for l in range(m + 1)]))
            self.off.append(self.off[-1] + (m + 1) * N)
        self.Kstack = jnp.asarray(np.vstack(blocks), jnp.bfloat16)
        self._interior_axes = interior_axes_jnp(grid)
        self._zy = None                                # install_diag_factors
        self._fx = None
        self.xmap = XWindowMap(self.p, self.cxp, self.Xp, self.G)

    @property
    def interior(self):
        return bcast_and(self._interior_axes)

    # -------------------------------------------------- layout conversions
    def window_x_line(self, f: np.ndarray, pad_value: float = 1.0) -> np.ndarray:
        """Host relayout of a 1-D x-axis factor [X] into window lanes [G]
        (``out[j*cxp+i] = f[p*i+j]``; used for separable diagonals/masks).
        Pad lanes get ``pad_value`` (1.0 keeps in-kernel divisions finite;
        the masked pad slots never reach real outputs)."""
        p, cx, G = self.p, self.cxp, self.G
        fp = np.pad(np.asarray(f), (0, self.Xp - self.X),
                    constant_values=pad_value)
        out = np.empty(G, fp.dtype)
        for j in range(p + 1):
            idx = np.minimum(p * np.arange(cx) + j, self.Xp - 1)
            out[j * cx:(j + 1) * cx] = fp[idx]
        return out

    def _pad_x(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.Xp - self.X)]
        return jnp.pad(x, pad) if self.Xp != self.X else x

    def to_windowed(self, x: jnp.ndarray) -> jnp.ndarray:
        """f32 node grid [Z, Y, X] -> windowed [Z, Yp, G]."""
        w = self.xmap.win(self._pad_x(x.astype(jnp.float32)), self.interpret)
        return jnp.pad(w, ((0, 0), (0, self.Yp - self.Y), (0, 0)))

    def from_windowed(self, w: jnp.ndarray) -> jnp.ndarray:
        """Windowed [Z, Yp, G] -> f32 node grid [Z, Y, X]."""
        return self.xmap.unwin(w[:, : self.Y], self.interpret)[..., : self.X]

    def dup_weights(self) -> jnp.ndarray:
        """[G] weights zeroing duplicated x-window slots in inner products
        (pad slots are identically zero in every dotted vector, so only
        the j=p duplicate block needs zero weights)."""
        w = np.ones(self.G, np.float32)
        w[self.p * self.cxp:] = 0.0
        w[self.p * self.cxp + self.cxp - 1] = 1.0
        return jnp.asarray(w)

    # -------------------------------------------------------------- kernel
    def _matvec_planes(self, x_hbm, kst_ref, slab, carry, zcarry, sem):
        """Shared matvec pipeline: DMA -> window -> limb matmuls ->
        unscatter/carries/masks; returns the block's finished output
        planes [p, RW, G] (all sequential carries resolved)."""
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
        s = slab[:, pl.ds(rows0, R)]                   # [n, R, G]

        s4 = s.reshape(n, R, n, cx)                    # lane split
        m_ = s4[:, : R - 1].reshape(n, cy_b, p, n, cx)
        t_ = s4[:, 1:].reshape(n, cy_b, p, n, cx)[:, :, p - 1: p]
        w = jnp.concatenate([m_, t_], axis=2)          # [lz, cy_b, ly, lx, cx]
        w = w.transpose(0, 2, 3, 1, 4)                 # [lz, ly, lx, cy_b, cx]
        u = w.reshape(N, F)

        # power-of-2 scale via exponent-bit extraction (exact; CLAUDE.md
        # exp2 note — f32 exp2 is inexact on integer arguments)
        s_ = jnp.max(jnp.abs(u), axis=0, keepdims=True)
        sigma, inv_sigma = pow2_sigma(s_)              # [1, F]
        rh = u * inv_sigma
        limbs = []
        for k in range(_N_LIMBS_SP):
            scale = np.float32(2.0 ** (_LIMB_BITS_SP * (k + 1)))
            inv = np.float32(2.0 ** (-_LIMB_BITS_SP * (k + 1)))
            chopped = jnp.round(rh * scale) * inv
            rh = rh - chopped                          # exact (aligned grids)
            limbs.append(
                (chopped * np.float32(2.0 ** (_LIMB_BITS_SP * k))
                 ).astype(jnp.bfloat16))
        big = jnp.concatenate(limbs, axis=0)           # [3N, F] bf16

        acc = None
        for m in range(_MAX_M_SP + 1):
            Km = kst_ref[self.off[m]: self.off[m + 1], :]
            Ym = jax.lax.dot_general(
                Km, big[: (m + 1) * N],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [N, F] f32
            delta = np.float32(self.sigma_K * 2.0 ** (-_LIMB_BITS_SP * m))
            term = Ym * (delta * sigma)                # fold per column
            acc = term if acc is None else acc + term

        # y-unscatter with chunk-boundary carry (see ops/pallas_windowed)
        wv = acc.reshape(n, n, n, cy_b, cx)            # [lz, ly, lx, cy_b, cx]
        wv = wv.transpose(3, 1, 0, 2, 4)               # [cy_b, ly, lz, lx, cx]
        main = wv[:, :p].reshape(cy_b * p, n, n, cx)
        tail = wv[:, p]                                # [cy_b, lz, lx, cx]
        tsh = jnp.concatenate(
            [jnp.zeros((1, n, n, cx), acc.dtype), tail[: cy_b - 1]], axis=0)
        tpad = jnp.concatenate(
            [tsh[:, None], jnp.zeros((cy_b, p - 1, n, n, cx), acc.dtype)],
            axis=1).reshape(cy_b * p, n, n, cx)
        y = main + tpad                                # [rows, lz, lx, cx]

        cin = jnp.where(yj > 0, carry[...], 0.0)       # [n, n, cx]
        y = jnp.concatenate([(y[0] + cin)[None], y[1:]], axis=0)
        carry[...] = tail[cy_b - 1]

        # x-window re-emission (lane rolls; see ops/pallas_windowed notes)
        _one = np.int32(1)
        _cxm1 = np.int32(cx - 1)
        RW = cy_b * p
        mh_ = y[:, :, :p].reshape(RW, n, p * cx)
        tail_x = pltpu.roll(y[:, :, p], _one, 2)       # cell i-1 tail -> i
        zpad = jnp.zeros((RW, n, (p - 1) * cx), jnp.float32)
        wh_ = mh_ + jnp.concatenate([tail_x, zpad], axis=-1)
        wph = pltpu.roll(wh_[:, :, :cx], _cxm1, 2)     # i+1 duplicate block
        wh = jnp.concatenate([wh_, wph], axis=-1).transpose(1, 0, 2)
        # [lz, RW, G]

        # in-kernel z-overlap fold + boundary masks (see ops/pallas_windowed)
        rows0 = yj * RW
        cin_z = jnp.where(zi > 0, zcarry[pl.ds(rows0, RW), :], 0.0)
        zcarry[pl.ds(rows0, RW), :] = wh[p]
        p0 = wh[0] + cin_z
        _f0, _f1 = np.float32(0.0), np.float32(1.0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (RW, G), 0)
        ymask = jnp.where((yj == 0) & (row_ids == 0), _f0, _f1)
        zmask0 = jnp.where(zi == 0, _f0, _f1)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (RW, G), 1)
        # node-id arithmetic mask (j-major lane = j*cxp + i holds node
        # p*i + j): zero the global x boundaries AND every pad slot
        # (node >= X-1 covers the real last node, its duplicates — incl.
        # the pad-window head that receives the real last cell's tail
        # roll — and all pad cells).  Reduces to the unpadded
        # lane==0 | lane==G-1 mask when cxp == cx.
        node = p * (lane_ids % np.int32(cx)) + lane_ids // np.int32(cx)
        xm = jnp.where((node == 0) | (node >= np.int32(self.X - 1)),
                       _f0, _f1)
        p0 = p0 * (zmask0 * ymask * xm)
        return jnp.concatenate([p0[None], wh[1:p] * (ymask * xm)[None]],
                               axis=0)                 # [p, RW, G]

    def _kernel(self, x_hbm, kst_ref, out_ref, slab, carry, zcarry, sem):
        out_ref[0, :, 0] = self._matvec_planes(
            x_hbm, kst_ref, slab, carry, zcarry, sem)

    def _kernel_cheb(self, x_hbm, b_ref, xold_ref, f12_ref, zy_ref, fx_ref,
                     kst_ref, out_ref, slab, carry, zcarry, sem):
        """Fused Chebyshev-update epilogue (the reference's action 3,
        /root/reference/common/laplace_operator_dg.h:1839-1860):
        ``x_new = x + f1 (x - x_old) + f2 diag^-1 (b - A x)`` emitted by
        the same kernel pass that computes A x — the separate residual and
        update streams over HBM disappear.  The separable diagonal is
        rebuilt in-kernel from the [3, Z, Yp] z*y planes and [3, G]
        windowed x factors."""
        y = self._matvec_planes(x_hbm, kst_ref, slab, carry, zcarry, sem)
        p = self.p
        rows0 = pl.program_id(1) * self.cy_b * p
        x_blk = slab[:p, pl.ds(rows0, self.cy_b * p)]  # [p, RW, G]
        f1 = f12_ref[0, 0]
        f2 = f12_ref[0, 1]
        diag = None
        for d in range(3):
            term = zy_ref[0, 0, d][:, :, None] * fx_ref[d][None, None, :]
            diag = term if diag is None else diag + term
        r = b_ref[...] - y
        out_ref[0, :, 0] = (x_blk + f1 * (x_blk - xold_ref[...])
                            + (f2 / diag) * r)

    def _kernel_resid(self, x_hbm, b_ref, kst_ref, out_ref, slab, carry,
                      zcarry, sem):
        """Fused residual epilogue (reference action 4): b - A x in the
        matvec pass."""
        y = self._matvec_planes(x_hbm, kst_ref, slab, carry, zcarry, sem)
        out_ref[0, :, 0] = b_ref[...] - y

    def _kernel_cheb_inplace(self, x_hbm, b_ref, xold_ref, f12_ref, zy_ref,
                             fx_ref, kst_ref, out_ref, slab, carry, zcarry,
                             sem):
        """:meth:`_kernel_cheb` writing straight into the [Z, Yp, G] vector
        layout (out aliases x_old's buffer; see cheb_fused)."""
        y = self._matvec_planes(x_hbm, kst_ref, slab, carry, zcarry, sem)
        p = self.p
        rows0 = pl.program_id(1) * self.cy_b * p
        x_blk = slab[:p, pl.ds(rows0, self.cy_b * p)]
        f1 = f12_ref[0, 0]
        f2 = f12_ref[0, 1]
        diag = None
        for d in range(3):
            term = zy_ref[0, 0, d][:, :, None] * fx_ref[d][None, None, :]
            diag = term if diag is None else diag + term
        r = b_ref[...] - y
        out_ref[...] = (x_blk + f1 * (x_blk - xold_ref[...])
                        + (f2 / diag) * r)

    def _call(self, kernel, xw, extra_operands=(), extra_specs=(),
              n_streams=2):
        """Shared pallas_call scaffolding for all epilogue variants: same
        grid, output/scratch shapes, VMEM limit and cost model; only the
        kernel body and its extra blocked inputs differ (a divergence here
        would be a hardware-only bug interpret tests can't catch)."""
        p, G, cy_b = self.p, self.G, self.cy_b
        cz, nyc = self.cz, self.nyc
        rows = cy_b * p
        flops = (2 * sum((m + 1) for m in range(_MAX_M_SP + 1)) * self.N**2
                 * self.cy * self.cx * cz)
        return pl.pallas_call(
            kernel,
            grid=(cz, nyc),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                *extra_specs,
                pl.BlockSpec((self.off[-1], self.N),
                             lambda zi, yj: (_I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, p, 1, rows, G),
                lambda zi, yj: (zi, _I0, yj, _I0, _I0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cz, p, nyc, rows, G),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((self.n, self.Yp, G), jnp.float32),
                pltpu.VMEM((self.n, self.n, self.cxp), jnp.float32),
                pltpu.VMEM((self.cy * p, G), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=n_streams * xw.size * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(xw, *extra_operands, self.Kstack)

    def _blk_spec(self):
        """BlockSpec of one output-shaped windowed input block."""
        return pl.BlockSpec((self.p, self.cy_b * self.p, self.G),
                            lambda zi, yj: (zi, yj, _I0),
                            memory_space=pltpu.VMEM)

    def _call_inplace(self, kernel, xw, extra_operands, extra_specs,
                      alias_input, n_streams):
        """pallas_call writing straight into the persistent [Z, Yp, G]
        layout: the output ALIASES operand ``alias_input`` (1-based over
        (xw, *extra_operands)), whose buffer must be dead at the call site
        and must carry the layout's zero pad rows — the grid writes only
        rows z < cz*p, y < Y-1, so the aliased buffer's top-z plane and
        y-pad rows become the output's (the invariant every windowed
        vector holds; the _finish reshape+pad pass disappears).  XLA's
        alias analysis inserts a defensive copy if the operand is live, so
        gating is a pure perf choice, never a correctness one."""
        p, G, cy_b = self.p, self.G, self.cy_b
        cz, nyc = self.cz, self.nyc
        rows = cy_b * p
        flops = (2 * sum((m + 1) for m in range(_MAX_M_SP + 1)) * self.N**2
                 * self.cy * self.cx * cz)
        return pl.pallas_call(
            kernel,
            grid=(cz, nyc),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                *extra_specs,
                pl.BlockSpec((self.off[-1], self.N),
                             lambda zi, yj: (_I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (p, rows, G),
                lambda zi, yj: (zi, yj, _I0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((self.Z, self.Yp, G),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((self.n, self.Yp, G), jnp.float32),
                pltpu.VMEM((self.n, self.n, self.cxp), jnp.float32),
                pltpu.VMEM((self.cy * p, G), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={alias_input: 0},
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=n_streams * xw.size * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(xw, *extra_operands, self.Kstack)

    def _finish(self, o):
        """[cz, p, nyc, rows, G] kernel output -> padded [Z, Yp, G]."""
        o = jax.lax.optimization_barrier(o)
        o = o.reshape(self.cz * self.p, self.Y - 1, self.G)
        return jnp.pad(o, ((0, 1), (0, self.Yp - self.Y + 1), (0, 0)))

    # ------------------------------------------------------ windowed apply
    def vmult_windowed(self, xw: jnp.ndarray) -> jnp.ndarray:
        """Windowed in/out; ASSUMES boundary-zero input (the V-cycle defect
        invariant) and returns a boundary-zero result."""
        # barriers pin the kernel operand/result as standalone values (the
        # dp kernel's measured fusion miscompile; see ops/pallas_windowed)
        xw = jax.lax.optimization_barrier(xw)
        return self._finish(self._call(self._kernel, xw))

    def resid_fused(self, xw: jnp.ndarray, bw: jnp.ndarray) -> jnp.ndarray:
        """b - A x on windowed vectors, one kernel pass (the V-cycle's
        pre-restrict residual; saves the separate subtract stream)."""
        xw, bw = jax.lax.optimization_barrier((xw, bw))
        o = self._call(self._kernel_resid, xw, (bw,), (self._blk_spec(),),
                       n_streams=3)
        return self._finish(o)

    # --------------------------------------------- fused Chebyshev update
    def install_diag_factors(self, lap_op) -> None:
        """Bake the separable diagonal's factors for the in-kernel
        rebuild: [3, Z, Yp] coefficient-scaled z*y planes and [3, G]
        windowed x lines (from ops/laplace.LaplaceOperator._diag_lines)."""
        assert isinstance(lap_op.coef, DiagCoef)
        zy, fx = [], []
        for d in range(3):
            lines = lap_op._diag_lines[d]
            fz = np.asarray(lines[0], np.float32)
            fy = np.pad(np.asarray(lines[1], np.float32),
                        (0, self.Yp - self.Y), constant_values=1.0)
            zy.append(np.float32(lap_op.coef.values[d])
                      * fz[:, None] * fy[None, :])
            fx.append(self.window_x_line(np.asarray(lines[2], np.float32)))
        # blocked [cz, nyc, 3, p, rows] layout: Mosaic requires the LAST
        # TWO block dims to be (8,128)-tiled or full — a [3, Z, Yp] layout
        # blocked (3, p, rows) has second-minor p=4 and fails to lower
        # (first-hardware-run finding); pre-blocking makes the (p, rows)
        # trailing dims exactly the array extents.  The Z-th z plane and
        # the y padding are boundary rows the kernel never reads.
        Zb = self.cz * self.p
        Yb = self.nyc * self.cy_b * self.p
        a = np.stack(zy)[:, :Zb, :Yb]
        a = a.reshape(3, self.cz, self.p, self.nyc, self.cy_b * self.p)
        self._zy = jnp.asarray(a.transpose(1, 3, 0, 2, 4))
        self._fx = jnp.asarray(np.stack(fx))           # [3, G]

    def cheb_fused(self, xw, xw_old, bw, f1, f2) -> jnp.ndarray:
        """One fused Chebyshev iteration on windowed vectors:
        ``x + f1 (x - x_old) + f2 diag^-1 (b - A x)`` in a single kernel
        pass (f1/f2 are traced scalars, streamed via a tiny VMEM block, so
        the whole recurrence reuses ONE compiled kernel)."""
        assert self._zy is not None, "install_diag_factors first"
        p, G = self.p, self.G
        rows = self.cy_b * p
        f12 = jnp.stack([jnp.asarray(f1, jnp.float32),
                         jnp.asarray(f2, jnp.float32)]).reshape(1, 2)
        xw, xw_old, bw = jax.lax.optimization_barrier((xw, xw_old, bw))
        blk = self._blk_spec()
        specs = (
            blk,                                       # b
            blk,                                       # x_old
            pl.BlockSpec((1, 2), lambda zi, yj: (_I0, _I0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3, p, rows),
                         lambda zi, yj: (zi, yj, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, G), lambda zi, yj: (_I0, _I0),
                         memory_space=pltpu.VMEM),
        )
        if self._use_cheb_alias():
            # x_old is dead after a Chebyshev iteration (the recurrence
            # carries (x_new, x)) and holds the layout's zero pad rows:
            # alias its buffer as the output and skip the _finish pad pass
            o = self._call_inplace(
                self._kernel_cheb_inplace, xw,
                extra_operands=(bw, xw_old, f12, self._zy, self._fx),
                extra_specs=specs, alias_input=2, n_streams=4)
            return jax.lax.optimization_barrier(o)
        o = self._call(
            self._kernel_cheb, xw,
            extra_operands=(bw, xw_old, f12, self._zy, self._fx),
            extra_specs=specs,
            n_streams=4)
        return self._finish(o)

    @staticmethod
    def _use_cheb_alias() -> bool:
        """MGT_CHEB_ALIAS gate (default OFF until the hardware
        bit-exactness + timing A/B lands — CLAUDE.md kernel-change rule)."""
        import os

        return os.environ.get("MGT_CHEB_ALIAS", "0") not in ("", "0")

    # ------------------------------------------------- node-grid interface
    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """f32 node-grid convenience (conversions included; the smoother hot
        path uses vmult_windowed on persistent windowed vectors)."""
        xm = jnp.where(self.interior, src, 0).astype(jnp.float32)
        yw = self.vmult_windowed(self.to_windowed(xm))
        y = self.from_windowed(yw)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs, lhs):
        y = self.vmult(jnp.where(self.interior, lhs, 0))
        y = jnp.where(self.interior, y, 0)
        return jnp.where(self.interior, rhs - y, rhs - lhs)


class FusedChebyshev:
    """First-kind Chebyshev smoother with every iteration's residual and
    vector update fused into the windowed sp kernel (PallasWindowedSP
    .cheb_fused) — the TPU analogue of the reference's action-3 merged
    matvec (/root/reference/common/laplace_operator_dg.h:910-955,
    1839-1860).  Drop-in for solvers.chebyshev.Chebyshev on windowed
    vectors; the interval (theta, delta, degree) is cloned from the node
    smoother's Lanczos estimate (same operator spectrum)."""

    def __init__(self, op: PallasWindowedSP, inv_diag_fn, theta: float,
                 delta: float, degree: int, max_eig: float, min_eig: float):
        assert op._zy is not None, "install_diag_factors first"
        self.op = op
        self.vmult_op = op.vmult_windowed
        self.inv_diag_fn = inv_diag_fn
        self.precond = lambda r: inv_diag_fn() * r
        self.theta = theta
        self.delta = delta
        self.degree = degree
        self.max_eig = max_eig
        self.min_eig = min_eig
        self.kind = "first_kind"

    def _loop(self, x, x_old, b):
        th, de = self.theta, self.delta
        if self.degree <= 1:
            return x

        def body(_, s):
            x, x_old, rho = s
            rho_new = 1.0 / (2.0 * th / de - rho)
            f1 = rho_new * rho
            f2 = 2.0 * rho_new / de
            return (self.op.cheb_fused(x, x_old, b, f1, f2), x, rho_new)

        rho0 = jnp.asarray(de / th, x.dtype)
        x, _, _ = jax.lax.fori_loop(0, self.degree - 1, body, (x, x_old, rho0))
        return x

    def vmult(self, b: jnp.ndarray) -> jnp.ndarray:
        x = self.inv_diag_fn() * b * (1.0 / self.theta)
        return self._loop(x, jnp.zeros_like(b), b)

    def step(self, x0: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # x0 + P^-1 (b - A x0) / theta == one fused pass with f1 = 0
        x = self.op.cheb_fused(x0, x0, b, 0.0, 1.0 / self.theta)
        return self._loop(x, x0, b)


def windowed_inv_diag_factory(op_win: PallasWindowedSP, lap_op):
    """Windowed separable inverse diagonal: relayouts the x-axis factor
    lines of ``lap_op``'s separable node diagonal
    (ops/laplace.LaplaceOperator.inverse_diagonal) into window lanes at
    setup, and returns a zero-arg callable rebuilding the windowed
    ``1/diag(A)`` in-graph from 1-D constants (so jitted smoothers embed
    only O(shape_d) literals — the LazyMaskList rule, ops/masks.py)."""
    assert isinstance(lap_op.coef, DiagCoef)
    dim = 3
    fz, fy, fx = [], [], []
    Yp = op_win.Yp
    for d in range(dim):
        lines = lap_op._diag_lines[d]
        fz.append(jnp.asarray(np.asarray(lines[0], np.float32)))
        y_line = np.asarray(lines[1], np.float32)
        # pad y to the sublane-aligned Yp with 1.0 (kept positive: padded
        # rows carry zero residuals, but 1/diag must stay finite)
        fy.append(jnp.asarray(np.pad(y_line, (0, Yp - y_line.size),
                                     constant_values=1.0)))
        fx.append(jnp.asarray(op_win.window_x_line(
            np.asarray(lines[2], np.float32))))
    cvals = [np.float32(v) for v in lap_op.coef.values]

    def inv_diag():
        diag = None
        for d in range(dim):
            term = (fz[d][:, None, None] * fy[d][None, :, None]
                    * fx[d][None, None, :]) * cvals[d]
            diag = term if diag is None else diag + term
        return 1.0 / diag

    return inv_diag
