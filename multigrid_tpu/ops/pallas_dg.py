"""Fused Mosaic SIP-DG matvec: the TPU speed-of-light DG path.

One kernel pass per z cell layer evaluates the whole block 7-point DG
stencil of ops/dg_stencil (volume + all 12 face flux terms + basis
changes folded into three MXU matmul families):

    layer DMA (own + next z layer) -> per-cell power-of-2 scale ->
    limb split -> A0 group matmuls (dense own-cell block) ->
    T group matmuls (all-face value/gn traces) -> in-VMEM neighbor
    exchange (lane rolls for x/y, sequential carry + one Tzb matmul for
    z, Dirichlet mirror as trace-space sign masks) -> wire limb split ->
    per-direction L group matmuls (incoming flux lifts) -> one clean
    [N, F] block store.

This is the TPU re-derivation of the reference's 750-line fused cell+face
kernel (/root/reference/common/laplace_operator_dg.h:1110-1861): where the
reference hand-schedules SIMD lanes, even-odd sweeps and MPI face packs,
here every hot op is a near-square bf16 limb matmul on the MXU and the
face exchange is a register-level lane roll.  Vector layout ``[cz, N, F]``
(node-major sublanes, layer cells in lanes, F = cy*cx zero-padded to the
128-lane tile) — DG has no shared dofs, so unlike the CG windowed layout
there are no duplicated slots; the layout is a pure transpose of the
natural block array and persists across smoother iterations.

Precision tiers (the established schemes of ops/pallas_windowed*):
  - PallasDGSP:    f32 in/out, 3 x 8-bit limbs, pairs k+l <= 2
                   (6 block products, ~2^-24 truncation = f32 HIGHEST
                   class; same as the brick sp kernel).
  - PallasDGOzaki: f32 (hi, lo) pair in/out, 7 x 7-bit limbs, pairs
                   k+l <= 6 (28 products); group terms m <= 1 combine
                   compensated, the m >= 2 tail sums in plain f32 (tail
                   magnitude <= 2^-14 sigma -> ~1e-11 relative class, the
                   hardware-verified accuracy of the XLA dp DG operator,
                   docs/tpu_r4/matvec_dg_dp34.log).  The dp
                   exact-accumulation bound caps 3-D pairs at p = 4
                   (ops/laplace_dense.py:169-171 rationale).

Limb scales ride pow2_ceil-style exponent-bit extraction (f32 exp2 is
inexact on integer args — CLAUDE.md; ops/laplace_general_mxu.pow2_ceil_f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df64 import df64_add, join_f64, split_f64, two_sum
from .dg import DGGrid
from .dg_stencil import _pad8, build_stencil
from .laplace_dense import _split_limbs_f64

_I0 = np.int32(0)


def _pow2_ceil_kernel(s: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two >= s via exponent-bit extraction (exact; the
    kernel twin of ops/laplace_general_mxu.pow2_ceil_f32)."""
    bits = jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.uint32)
    p = jax.lax.bitcast_convert_type(
        bits & np.uint32(0x7F800000), jnp.float32)
    return jnp.where(s == p, p, p * np.float32(2.0))


def _col_sigma(a: jnp.ndarray):
    """Per-column power-of-2 scale (sigma, 1/sigma) from max |a| rows."""
    s = jnp.max(jnp.abs(a), axis=0, keepdims=True)
    sig = _pow2_ceil_kernel(jnp.maximum(s, np.float32(1e-30)))
    sigma = jnp.where(s > 0, sig, np.float32(1.0))
    return sigma, np.float32(1.0) / sigma


def _split_limbs_sp(u: jnp.ndarray, n_limbs: int, bits: int):
    """[R, F] f32 -> (sigma [1, F], bf16 limb stack [n_limbs*R, F])."""
    sigma, inv_sigma = _col_sigma(u)
    r = u * inv_sigma
    limbs = []
    for k in range(n_limbs):
        scale = np.float32(2.0 ** (bits * (k + 1)))
        inv = np.float32(2.0 ** (-bits * (k + 1)))
        chopped = jnp.round(r * scale) * inv
        r = r - chopped
        limbs.append(
            (chopped * np.float32(2.0 ** (bits * k))).astype(jnp.bfloat16))
    return sigma, jnp.concatenate(limbs, axis=0)


def _split_limbs_pair(uh: jnp.ndarray, ul: jnp.ndarray, n_limbs: int,
                      bits: int):
    """f32 pair [R, F] -> (sigma, bf16 limb stack [n_limbs*R, F]); the
    two_sum chain folds the lo plane in (ops/pallas_windowed scheme)."""
    sigma, inv_sigma = _col_sigma(uh)
    rh = uh * inv_sigma
    rl = ul * inv_sigma
    limbs = []
    for k in range(n_limbs):
        scale = np.float32(2.0 ** (bits * (k + 1)))
        inv = np.float32(2.0 ** (-bits * (k + 1)))
        chopped = jnp.round(rh * scale) * inv
        rh = rh - chopped
        rh, rl = two_sum(rh, rl)
        limbs.append(
            (chopped * np.float32(2.0 ** (bits * k))).astype(jnp.bfloat16))
    return sigma, jnp.concatenate(limbs, axis=0)


class _MatStack:
    """Limb group stack of a constant f64 matrix M [K_in, R_out] for
    dot_general(Km, vec_limbs[:(m+1)*K], contract dim0 x dim0) -> [R_out, F]
    (the brick Kstack layout, ops/laplace_dense._split_limbs_f64)."""

    def __init__(self, MT: np.ndarray, n_limbs: int, bits: int, max_m: int):
        MT = np.asarray(MT, np.float64)
        # per-OUTPUT-ROW power-of-2 normalization, folded back into the
        # limbs: a single global matrix sigma starves small-magnitude
        # output rows of limb bits when row scales are heterogeneous (the
        # gll/gauss basis-change-folded matrices span ~2^10 across rows —
        # measured 30x accuracy loss vs hermite in interpret).  Powers of
        # two keep each limb's b-bit mantissa exact, and every output
        # element's products still share one scale grid, so the f32
        # exact-accumulation argument (ops/laplace_dense.py:213) is
        # unchanged.
        mx = np.max(np.abs(MT), axis=0)
        rho = np.exp2(np.ceil(np.log2(np.where(mx > 0, mx, 1.0))))
        _, limbs = _split_limbs_f64(MT / rho[None, :], n_limbs, bits)
        limbs = [lk * rho[None, :].astype(np.float32) for lk in limbs]
        self.sigma = 1.0
        self.K = MT.shape[0]
        self.bits = bits
        self.max_m = max_m
        self.off = [0]
        blocks = []
        for m in range(max_m + 1):
            blocks.append(np.vstack([limbs[m - l] for l in range(m + 1)]))
            self.off.append(self.off[-1] + (m + 1) * self.K)
        self.stack = jnp.asarray(np.vstack(blocks), jnp.bfloat16)

    def terms(self, kst_ref, big, sigma_col):
        """Yield the per-group f32-exact partial products (scale folded)."""
        for m in range(self.max_m + 1):
            Km = kst_ref[self.off[m]: self.off[m + 1], :]
            Ym = jax.lax.dot_general(
                Km, big[: (m + 1) * self.K],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = np.float32(self.sigma * 2.0 ** (-self.bits * m))
            yield Ym * (delta * sigma_col)


def _acc_sp(terms):
    acc = None
    for t in terms:
        acc = t if acc is None else acc + t
    return acc


def _acc_pair(terms, acc=None, tail_plain_m: int = 2):
    """Compensated accumulation of ordered group terms: m < tail_plain_m
    compensated (df64), the geometric tail (<= 2^-7m relative) in plain
    f32 — ~1e-11 class at tail_plain_m=2 (module docstring)."""
    acc_h, acc_l = acc if acc is not None else (None, None)
    tail = None
    for m, t in enumerate(terms):
        if m < tail_plain_m:
            if acc_h is None:
                acc_h, acc_l = t, jnp.zeros_like(t)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, t, jnp.zeros_like(t))
        else:
            tail = t if tail is None else tail + t
    if tail is not None:
        acc_h, acc_l = df64_add(acc_h, acc_l, tail, jnp.zeros_like(tail))
    return acc_h, acc_l


class _PallasDGBase:
    """Shared scaffolding of the sp / dp fused DG kernels."""

    pair = False

    def __init__(self, grid: DGGrid, interpret: bool | None = None,
                 f_pad: int | None = None):
        assert grid.dim == 3
        self.grid = grid
        if interpret is None:   # Mosaic is TPU-only: interpret elsewhere
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        st = build_stencil(grid)
        self.st = st
        self.N = st.N
        self.CH = st.CH
        self.TR = st.TR
        self.n2 = st.n2
        self.cz, self.cy, self.cx = grid.cells
        F = self.cy * self.cx
        self.F = F
        if f_pad is not None:
            assert f_pad >= F
            self.Fp = f_pad
        elif interpret:
            self.Fp = F
        else:
            self.Fp = -(-F // 128) * 128
        nl, bits, mm = self.n_limbs, self.limb_bits, self.max_m
        # WIRE LAYOUT: per direction d, four SEPARATELY 8-ALIGNED
        # quantity blocks of Q = pad8(n^2) rows each, ordered
        # [u(side0), u(side1), g(side0), g(side1)] — value and gn traces
        # are limb-split with their OWN per-column sigma.  One shared
        # sigma across channels starves whichever channel is physically
        # smaller: a static power-of-two rebalance (r5 v1) fixed the
        # random-input case but broke on SMOOTH inputs, where the actual
        # gn/value ratio is ~1 instead of the matrix-norm ~2^5 — measured
        # 1e-1 matvec error on a Jacobi-preconditioned iterate vs 4e-5
        # for XLA f32.  Per-quantity sigmas adapt to the data, need no
        # balancing constants, and the Dirichlet mirror becomes a
        # whole-block sign (u blocks negate, g blocks keep).
        n2 = self.n2
        Q = _pad8(n2)
        self.Q = Q
        self.DQ = 4 * Q
        self.TR = 12 * Q
        # JUMP-FORM factorization (ops/dg_stencil docstring): the kernel
        # computes J = u_m - u_p and Gs = g_own + g_in in trace space
        # (exact VPU subtraction of nearby values) and lifts them with
        # LJ / LG; A0 is the VOLUME term only.  The plain A0+L split
        # rounds the hugely-canceling sigma*u_m / sigma*u_p terms at
        # their own magnitudes — 1e-1 matvec error on smooth iterates.
        Tq = np.zeros((self.TR, self.N))
        Lq = np.zeros((self.N, self.TR))    # u slots from LJ, g from LG
        for d in range(3):
            for s_ in (0, 1):
                r_old = st.face_rows(d, s_).start
                for qi, q0, M in ((0, 0, st.LJ), (1, n2, st.LG)):
                    r_new = d * self.DQ + 2 * Q * qi + s_ * Q
                    Tq[r_new: r_new + n2] = st.T[r_old + q0: r_old + q0 + n2]
                    Lq[:, r_new: r_new + n2] = M[
                        :, r_old + q0: r_old + q0 + n2]
        if self.pair:
            # dp exact-accumulation bound (ops/laplace_dense.py:213): the
            # largest group contracts (max_m+1)*K bf16 limb products
            for K in (self.N, 2 * Q):
                if (mm + 1) * K >= 2 ** (24 - 2 * bits):
                    raise ValueError(
                        f"Ozaki exact-accumulation bound violated: "
                        f"({mm + 1})*{K} >= 2^{24 - 2 * bits} "
                        "(3-D dp DG kernel is p <= 4; use the df64 path)")
        self.mA = _MatStack(st.A0v.T, nl, bits, mm)
        self.mT = _MatStack(Tq.T, nl, bits, mm)
        # next-layer z-bottom traces: (d=0, side 0) u and g blocks
        self.mTzb = _MatStack(
            np.vstack([Tq[0: Q], Tq[2 * Q: 3 * Q]]).T, nl, bits, mm)
        # per-(direction, quantity) lifts: J channels ride LJ, Gs ride LG
        self.mLu = [
            _MatStack(Lq[:, d * self.DQ: d * self.DQ + 2 * Q].T,
                      nl, bits, mm) for d in range(3)
        ]
        self.mLg = [
            _MatStack(Lq[:, d * self.DQ + 2 * Q: (d + 1) * self.DQ].T,
                      nl, bits, mm) for d in range(3)
        ]

    # ------------------------------------------------- layout conversions
    def to_kernel(self, u: jnp.ndarray) -> jnp.ndarray:
        """natural f32 [cz, cy, cx, n, n, n] -> [cz+1, N, Fp] (one zero
        halo layer appended; pad lanes zero)."""
        cz = self.cz
        w = u.astype(jnp.float32).transpose(0, 3, 4, 5, 1, 2).reshape(
            cz, self.N, self.F)
        return jnp.pad(w, ((0, 1), (0, 0), (0, self.Fp - self.F)))

    def from_kernel(self, y: jnp.ndarray) -> jnp.ndarray:
        """[cz, N, Fp] -> natural [cz, cy, cx, n, n, n]."""
        nn = self.grid.n
        return y[:, :, : self.F].reshape(
            self.cz, nn, nn, nn, self.cy, self.cx).transpose(0, 4, 5, 1, 2, 3)

    # ------------------------------------------------------- wire assembly
    def _wire(self, t_parts, tz_parts, tcar_read, zi):
        """Assemble the incoming wire block [TR, Fp] (per plane) from the
        outgoing traces: x/y lane rolls, z carry + next-layer traces,
        whole-block Dirichlet mirror signs (u blocks negate, g blocks
        keep).  ``t_parts``/``tz_parts``/``tcar_read`` are tuples of
        planes (1 for sp, 2 for pair); tz = [u0_next; g0_next] [2Q, Fp];
        carry = [u1_prev; g1_prev] [2Q, Fp]."""
        Q, DQ, Fp, F = self.Q, self.DQ, self.Fp, self.F
        cz, cy, cx = self.cz, self.cy, self.cx
        nplanes = len(t_parts)

        lane = jax.lax.broadcasted_iota(jnp.int32, (Q, Fp), 1)
        ix = lane % np.int32(cx)
        iy = lane // np.int32(cx)
        padmask = (lane < np.int32(F)).astype(jnp.float32)

        def side_inputs(t, tcar, tz, d, qi, msign):
            """(own0, own1, in0, in1) for one (direction, quantity)."""
            r0 = d * self.DQ + 2 * Q * qi
            own0 = t[r0: r0 + Q]
            own1 = t[r0 + Q: r0 + 2 * Q]
            if d == 0:
                prev = tcar[qi * Q: (qi + 1) * Q]
                nxt = tz[qi * Q: (qi + 1) * Q]
                in0 = jnp.where(zi > 0, prev, msign * own0)
                in1 = jnp.where(zi < np.int32(cz - 1), nxt, msign * own1)
            else:
                sh_lo = np.int32(cx if d == 1 else 1)
                sh_hi = np.int32(Fp - cx if d == 1 else Fp - 1)
                ids = iy if d == 1 else ix
                c_dim = cy if d == 1 else cx
                in0 = jnp.where(ids == 0, msign * own0,
                                pltpu.roll(own1, sh_lo, 1))
                in1 = jnp.where(ids == np.int32(c_dim - 1), msign * own1,
                                pltpu.roll(own0, sh_hi, 1))
            return own0, own1, in0, in1

        # JUMP FORM: combine own and incoming IN TRACE SPACE (exact/
        # compensated subtraction of nearby values — the whole point of
        # this factorization): u blocks carry J = u_own - u_in, g blocks
        # Gs = g_own + g_in.  The pair combine MUST be compensated
        # (df64_add): a plain per-plane subtraction drops the hi
        # rounding and caps the dp wire at 2^-24.
        chunks = [[] for _ in range(nplanes)]
        for d in range(3):
            for qi, msign in ((0, np.float32(-1.0)), (1, np.float32(1.0))):
                cmb = np.float32(-1.0) if qi == 0 else np.float32(1.0)
                sides = [side_inputs(t_parts[p_i], tcar_read[p_i],
                                     tz_parts[p_i], d, qi, msign)
                         for p_i in range(nplanes)]
                for k in (0, 1):                       # side 0 then side 1
                    if nplanes == 2:
                        ch_h, ch_l = df64_add(
                            sides[0][k], sides[1][k],
                            cmb * sides[0][2 + k], cmb * sides[1][2 + k])
                        chunks[0].append(ch_h * padmask)
                        chunks[1].append(ch_l * padmask)
                    else:
                        ch = sides[0][k] + cmb * sides[0][2 + k]
                        chunks[0].append(ch * padmask)
        # chunk order per direction: J0, J1, G0, G1
        return [jnp.concatenate(c, axis=0) for c in chunks]


class PallasDGSP(_PallasDGBase):
    """f32 fused DG A.u (f32-HIGHEST accuracy class)."""

    n_limbs = 3
    limb_bits = 8
    max_m = 2
    pair = False

    # -------------------------------------------------------------- kernel
    def _matvec_layer(self, x_hbm, a_ref, t_ref, z_ref, l_refs, slab, tcar,
                      sem):
        """Shared matvec pipeline for one z layer: DMA -> limb split ->
        A0/T/Tzb matmuls -> wire -> L matmuls; returns y [N, Fp] (the
        epilogue variants share this body — a divergence here would be a
        hardware-only bug interpret tests can't catch)."""
        zi = pl.program_id(0)
        Q, DQ = self.Q, self.DQ

        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()

        sig_o, big_o = _split_limbs_sp(slab[0], self.n_limbs, self.limb_bits)
        sig_n, big_n = _split_limbs_sp(slab[1], self.n_limbs, self.limb_bits)

        y = _acc_sp(self.mA.terms(a_ref, big_o, sig_o))
        t = _acc_sp(self.mT.terms(t_ref, big_o, sig_o))
        tz = _acc_sp(self.mTzb.terms(z_ref, big_n, sig_n))

        (wire,) = self._wire((t,), (tz,), (tcar,), zi)
        # carry = own (d=0, side 1) u and g blocks; TWO ref stores, not a
        # sublane concat of nonzero-offset slices (Mosaic offset rule —
        # the r3 brick lesson, ops/pallas_windowed.py x-window notes)
        tcar[0: Q] = t[Q: 2 * Q]
        tcar[Q: 2 * Q] = t[3 * Q: 4 * Q]

        lu_refs, lg_refs = l_refs
        for d in range(3):
            uch = wire[d * DQ: d * DQ + 2 * Q]
            gch = wire[d * DQ + 2 * Q: (d + 1) * DQ]
            sig_u, big_u = _split_limbs_sp(uch, self.n_limbs,
                                           self.limb_bits)
            sig_g, big_g = _split_limbs_sp(gch, self.n_limbs,
                                           self.limb_bits)
            y = y + _acc_sp(self.mLu[d].terms(lu_refs[d], big_u, sig_u))
            y = y + _acc_sp(self.mLg[d].terms(lg_refs[d], big_g, sig_g))
        return y

    def _kernel(self, x_hbm, a_ref, t_ref, z_ref, lu0, lu1, lu2, lg0, lg1,
                lg2, out_ref, slab, tcar, sem):
        out_ref[0] = self._matvec_layer(x_hbm, a_ref, t_ref, z_ref,
                                        ((lu0, lu1, lu2), (lg0, lg1, lg2)),
                                        slab, tcar, sem)

    def _kernel_cheb(self, x_hbm, b_ref, xold_ref, f12_ref, idg_ref, a_ref,
                     t_ref, z_ref, lu0, lu1, lu2, lg0, lg1, lg2, t3_ref,
                     t3t_ref, out_ref, slab, tcar, sem):
        """Fused Chebyshev-update epilogue (the reference's action 3,
        /root/reference/common/laplace_operator_dg.h:1839-1860, with the
        JacobiTransformed preconditioner folded in,
        laplace_operator_dg.h:2084-2095):

            x_new = x + f1 (x - x_old) + f2 T3 diag^-1 T3^T (b - A x)

        emitted by the same kernel pass that computes A x — the separate
        Jacobi matmuls and residual/update streams over HBM disappear."""
        y = self._matvec_layer(x_hbm, a_ref, t_ref, z_ref,
                               ((lu0, lu1, lu2), (lg0, lg1, lg2)), slab,
                               tcar, sem)
        r = b_ref[0] - y
        sig_r, big_r = _split_limbs_sp(r, self.n_limbs, self.limb_bits)
        w = _acc_sp(self.mT3t.terms(t3t_ref, big_r, sig_r))
        w = w * idg_ref[0]
        sig_w, big_w = _split_limbs_sp(w, self.n_limbs, self.limb_bits)
        pc = _acc_sp(self.mT3.terms(t3_ref, big_w, sig_w))
        x = slab[0]
        f1 = f12_ref[0, 0]
        f2 = f12_ref[0, 1]
        out_ref[0] = x + f1 * (x - xold_ref[0]) + f2 * pc

    def _mats(self):
        return (self.mA, self.mT, self.mTzb, *self.mLu, *self.mLg)

    def _call(self, xk: jnp.ndarray) -> jnp.ndarray:
        N, TR, Q, Fp, cz = self.N, self.TR, self.Q, self.Fp, self.cz
        mats = self._mats()
        mac = (self.mA.stack.shape[0] * N + self.mT.stack.shape[0] * TR
               + self.mTzb.stack.shape[0] * 2 * Q
               + sum(m.stack.shape[0] * N for m in (*self.mLu, *self.mLg)))
        const_spec = [
            pl.BlockSpec(m.stack.shape, lambda zi: (_I0, _I0),
                         memory_space=pltpu.VMEM)
            for m in mats
        ]
        return pl.pallas_call(
            self._kernel,
            grid=(cz,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), *const_spec],
            out_specs=pl.BlockSpec((1, N, Fp), lambda zi: (zi, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cz, N, Fp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, N, Fp), jnp.float32),
                pltpu.VMEM((2 * Q, Fp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * mac * Fp * cz,
                bytes_accessed=3 * xk.size * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(xk, *(m.stack for m in mats))

    # --------------------------------------------- fused Chebyshev update
    def install_jacobi(self, T3: np.ndarray, inv_diag_k: jnp.ndarray):
        """Bake the JacobiTransformed data for the fused epilogue: the
        [N, N] eigenbasis tensor T3 (limb stacks for both orientations)
        and the kernel-layout inverse transformed diagonal
        [cz(+1), N, Fp] (halo layer ignored)."""
        nl, bits, mm = self.n_limbs, self.limb_bits, self.max_m
        T3 = np.asarray(T3, np.float64)
        self.mT3 = _MatStack(T3.T, nl, bits, mm)
        self.mT3t = _MatStack(T3, nl, bits, mm)
        self._idg_k = inv_diag_k[: self.cz].astype(jnp.float32)

    def cheb_fused(self, xk, xk_old, bk, f1, f2) -> jnp.ndarray:
        """One fused Chebyshev iteration on persistent-layout vectors:
        ``x + f1 (x - x_old) + f2 P^-1 (b - A x)`` in a single kernel pass
        (f1/f2 are traced scalars via a tiny SMEM block, so the whole
        recurrence reuses ONE compiled kernel)."""
        assert hasattr(self, "mT3"), "install_jacobi first"
        N, Fp, cz = self.N, self.Fp, self.cz
        f12 = jnp.stack([jnp.asarray(f1, jnp.float32),
                         jnp.asarray(f2, jnp.float32)]).reshape(1, 2)
        # no barriers around this Mosaic call (see vmult_kernel)
        blk = pl.BlockSpec((1, N, Fp), lambda zi: (zi, _I0, _I0),
                           memory_space=pltpu.VMEM)
        mats = (*self._mats(), self.mT3, self.mT3t)
        const_spec = [
            pl.BlockSpec(m.stack.shape, lambda zi: (_I0, _I0),
                         memory_space=pltpu.VMEM)
            for m in mats
        ]
        mac = sum(m.stack.shape[0] for m in mats) * N
        o = pl.pallas_call(
            self._kernel_cheb,
            grid=(cz,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                blk,                                   # b
                blk,                                   # x_old
                pl.BlockSpec((1, 2), lambda zi: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                blk,                                   # inv transformed diag
                *const_spec,
            ],
            out_specs=pl.BlockSpec((1, N, Fp), lambda zi: (zi, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cz, N, Fp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, N, Fp), jnp.float32),
                pltpu.VMEM((2 * self.Q, Fp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * mac * Fp * cz,
                bytes_accessed=6 * xk.size * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(xk, bk, xk_old, f12, self._idg_k,
          *(m.stack for m in mats))
        return self.repad_top(o)

    # ----------------------------------------------------------- interface
    def vmult_kernel(self, xk: jnp.ndarray) -> jnp.ndarray:
        """[cz+1, N, Fp] persistent layout in -> [cz, N, Fp] out.

        NO optimization_barrier here: wrapping THIS kernel's operand and
        result in barriers made the compiled program hang/fault on v5e
        (dg_bisect 2026-08-21: every staged subset and the bare _call
        pass; only the barrier-wrapped form dies) — the mirror image of
        the brick kernels, where the barriers FIX a fusion miscompile.
        Both are the same lesson: XLA's choices around a Mosaic custom
        call are fragile; hardware-gate every change here (CLAUDE.md)."""
        return self._call(xk)

    def repad_top(self, y: jnp.ndarray) -> jnp.ndarray:
        """[cz, N, Fp] kernel output -> persistent [cz+1, N, Fp] (restore
        the zero halo layer; smoother vectors carry it end to end)."""
        return jnp.pad(y, ((0, 1), (0, 0), (0, 0)))

    def vmult_persistent(self, xk: jnp.ndarray) -> jnp.ndarray:
        """[cz+1, N, Fp] in AND out: the smoother-loop form."""
        return self.repad_top(self.vmult_kernel(xk))

    def vmult(self, u: jnp.ndarray) -> jnp.ndarray:
        """natural f32 block layout in/out (conversions included)."""
        return self.from_kernel(self.vmult_kernel(self.to_kernel(u)))

    def vmult_residual(self, rhs, lhs):
        return rhs - self.vmult(lhs)


class PallasDGOzaki(_PallasDGBase):
    """dp (f32-pair) fused DG A.u, ~1e-11 relative class; p <= 4.

    max_m = 5, not the brick kernel's 6: the m = 6 group's terms sit at
    2^-42 relative (2e-13) — far below this kernel's plain-tail accuracy
    class (~1e-11, module docstring) — while costing 7 of 28 limb-pair
    products = 25% of every matmul family.  (The brick dp kernel keeps
    m <= 6 because its target is bit-exactness against the XLA m <= 6
    oracle at 2e-15.)  Measured in interpret: dev moves ~1.1e-11 ->
    ~1.6e-11 class."""

    n_limbs = 7
    limb_bits = 7
    max_m = 5
    pair = True

    # ------------------------------------------------- layout conversions
    def to_kernel_pair(self, u64: jnp.ndarray) -> jnp.ndarray:
        """natural f64 [cz, cy, cx, n, n, n] -> [cz+1, 2, N, Fp]."""
        cz = self.cz
        uh, ul = split_f64(u64)
        w = jnp.stack([uh, ul], axis=1)               # [cz, 2, cy, cx, n...]
        w = w.transpose(0, 1, 4, 5, 6, 2, 3).reshape(cz, 2, self.N, self.F)
        return jnp.pad(w, ((0, 1), (0, 0), (0, 0), (0, self.Fp - self.F)))

    def from_kernel_pair(self, y: jnp.ndarray) -> jnp.ndarray:
        """[cz, 2, N, Fp] -> natural f64."""
        nn = self.grid.n
        v = y[:, :, :, : self.F].reshape(
            self.cz, 2, nn, nn, nn, self.cy, self.cx
        ).transpose(0, 1, 5, 6, 2, 3, 4)
        return join_f64(v[:, 0], v[:, 1])

    # -------------------------------------------------------------- kernel
    def _mats(self):
        return (self.mA, self.mT, self.mTzb, *self.mLu, *self.mLg)

    def _kernel(self, x_hbm, a_ref, t_ref, z_ref, lu0, lu1, lu2, lg0, lg1,
                lg2, out_ref, slab, tcar_h, tcar_l, sem):
        zi = pl.program_id(0)
        Q, DQ = self.Q, self.DQ

        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(zi, 2)], slab, sem)
        cp.start()
        cp.wait()

        sig_o, big_o = _split_limbs_pair(slab[0, 0], slab[0, 1],
                                         self.n_limbs, self.limb_bits)
        sig_n, big_n = _split_limbs_pair(slab[1, 0], slab[1, 1],
                                         self.n_limbs, self.limb_bits)

        yh, yl = _acc_pair(self.mA.terms(a_ref, big_o, sig_o))
        th, tl = _acc_pair(self.mT.terms(t_ref, big_o, sig_o))
        tzh, tzl = _acc_pair(self.mTzb.terms(z_ref, big_n, sig_n))

        wh, wl = self._wire((th, tl), (tzh, tzl), (tcar_h, tcar_l), zi)
        # two ref stores per plane (see the sp kernel's carry note)
        tcar_h[0: Q] = th[Q: 2 * Q]
        tcar_h[Q: 2 * Q] = th[3 * Q: 4 * Q]
        tcar_l[0: Q] = tl[Q: 2 * Q]
        tcar_l[Q: 2 * Q] = tl[3 * Q: 4 * Q]

        lu_refs = (lu0, lu1, lu2)
        lg_refs = (lg0, lg1, lg2)
        for d in range(3):
            for mfam, lref, r0 in ((self.mLu, lu_refs, d * DQ),
                                   (self.mLg, lg_refs, d * DQ + 2 * Q)):
                ch_h = wh[r0: r0 + 2 * Q]
                ch_l = wl[r0: r0 + 2 * Q]
                sig_w, big_w = _split_limbs_pair(ch_h, ch_l, self.n_limbs,
                                                 self.limb_bits)
                yh, yl = _acc_pair(mfam[d].terms(lref[d], big_w, sig_w),
                                   acc=(yh, yl))

        out_ref[0, 0] = yh
        out_ref[0, 1] = yl

    def _call(self, xk: jnp.ndarray) -> jnp.ndarray:
        N, TR, Q, Fp, cz = self.N, self.TR, self.Q, self.Fp, self.cz
        mats = self._mats()
        mac = (self.mA.stack.shape[0] * N + self.mT.stack.shape[0] * TR
               + self.mTzb.stack.shape[0] * 2 * Q
               + sum(m.stack.shape[0] * N for m in (*self.mLu, *self.mLg)))
        const_spec = [
            pl.BlockSpec(m.stack.shape, lambda zi: (_I0, _I0),
                         memory_space=pltpu.VMEM)
            for m in mats
        ]
        return pl.pallas_call(
            self._kernel,
            grid=(cz,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), *const_spec],
            out_specs=pl.BlockSpec((1, 2, N, Fp), lambda zi: (zi, _I0, _I0,
                                                              _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cz, 2, N, Fp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 2, N, Fp), jnp.float32),
                pltpu.VMEM((2 * Q, Fp), jnp.float32),
                pltpu.VMEM((2 * Q, Fp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * mac * Fp * cz,
                bytes_accessed=3 * xk.size * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=self.interpret,
        )(xk, *(m.stack for m in mats))

    # ----------------------------------------------------------- interface
    def vmult_kernel(self, xk: jnp.ndarray) -> jnp.ndarray:
        """[cz+1, 2, N, Fp] pair layout in -> [cz, 2, N, Fp] out (no
        barriers — see the sp twin's note)."""
        return self._call(xk)

    def vmult(self, u64: jnp.ndarray) -> jnp.ndarray:
        """natural f64 block layout in/out (conversions included)."""
        return self.from_kernel_pair(self.vmult_kernel(
            self.to_kernel_pair(u64)))

    def vmult_residual(self, rhs, lhs):
        return rhs - self.vmult(lhs)


class FusedChebyshevDG:
    """First-kind Chebyshev smoother with every iteration's residual,
    JacobiTransformed preconditioner and vector update fused into the DG
    sp kernel (PallasDGSP.cheb_fused) — the TPU analogue of the
    reference's action-3 merged DG matvec
    (/root/reference/common/laplace_operator_dg.h:910-955, 1839-1860).
    Drop-in for solvers.chebyshev.Chebyshev on persistent-layout vectors;
    the interval (theta, delta, degree) is cloned from the natural-layout
    smoother's Lanczos estimate (identical spectrum: the layout is a dof
    permutation)."""

    def __init__(self, op: PallasDGSP, precond, theta: float, delta: float,
                 degree: int):
        assert hasattr(op, "mT3"), "install_jacobi first"
        self.op = op
        self.vmult_op = op.vmult_persistent
        self.precond = precond            # kernel-layout P^-1 (first apply)
        self.theta = theta
        self.delta = delta
        self.degree = degree
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
        x, _, _ = jax.lax.fori_loop(0, self.degree - 1, body,
                                    (x, x_old, rho0))
        return x

    def vmult(self, b: jnp.ndarray) -> jnp.ndarray:
        x = self.precond(b) * (1.0 / self.theta)
        return self._loop(x, jnp.zeros_like(b), b)

    def step(self, x0: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # x0 + P^-1 (b - A x0) / theta == one fused pass with f1 = 0
        x = self.op.cheb_fused(x0, x0, b, 0.0, 1.0 / self.theta)
        return self._loop(x, x0, b)
