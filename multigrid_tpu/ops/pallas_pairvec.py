"""Pallas kernels for the windowed-pair dp CG vector glue.

kernel_profile18 measured the XLA forms of the pair vector ops ~9x off
HBM speed-of-light at the 135M flagship (pair_axpy 44.8 ms, pair_dot
35.2 ms for 4.1/2.7 GB of streamed planes): the compensated df64
arithmetic (ops/pairvec) must chain its 16M-element chunks through
``optimization_barrier`` to bound temp HBM, and every barrier
materializes intermediates to HBM.  Inside a Mosaic kernel the same
arithmetic runs register-to-register: one HBM pass per operand plane,
VPU-bound nowhere.

Arithmetic notes (all f32 — Mosaic has no f64 vectors):

- products use the bitmask ROUNDED Dekker split (ops/df64._dekker_split)
  with a contraction-proof recombination (see _dekker_prod): the
  (p, err) pair equals the true product to ~2^-46 relative, robust to
  FMA contraction by construction.  The pair decomposition is NOT
  bit-identical to ops/df64.two_prod's f64-widening form, but joins
  agree at the 2^-45 class (pinned in tests/test_pallas_pairvec.py and
  the hardware gate experiments/debug_pairvec.py).
- the dot kernel keeps products exact, reduces each z-plane's terms in
  f32 (sqrt(Yp/8)-term pairwise groups — the same accuracy class as
  ops/df64._chunk_sum_to_f64's 512-element chunks) and carries the
  cross-plane accumulator as a compensated (hi, lo) VMEM pair, so the
  result matches ops/pairvec.pair_dot's ~1e-6-relative class without
  any f64 emulation.

Counterpart of the reference's vector kernels inside its fused CG
(/root/reference/common/multigrid_solver.h:516-619, the merged
vector-update interfaces); here they are standalone single-pass kernels
because XLA owns the surrounding loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .df64 import _dekker_split, quick_two_sum, split_f64, two_sum

_I0 = np.int32(0)


def _y_block(Yp: int, cap: int = 128) -> int:
    """Largest divisor of Yp that is a multiple of 8 and <= cap.

    A full flagship plane-pair block (2*520*640 f32 = 2.7 MB) times three
    operands, double-buffered, overflows the 16 MB scoped-VMEM limit
    (measured: 22.86M requested at 513^3 — pairvec_gate21b); blocking the
    Y axis keeps every operand block a few hundred KB.  Yp is always a
    multiple of 8 (the windowed layout pads the sublane axis) — asserted
    because a silent fall-through would only surface later as an opaque
    reshape error in _dot_kernel's by//8 regrouping."""
    assert Yp % 8 == 0, \
        f"windowed pair layout requires Yp % 8 == 0, got {Yp}"
    best = 8
    for by in range(8, min(Yp, cap) + 1, 8):
        if Yp % by == 0:
            best = by
    return best


def _dekker_prod(a, b):
    """f32 product a*b -> (p, err) with p + err == a*b to ~2^-46 |a*b|,
    CONTRACTION-PROOF BY CONSTRUCTION.

    The classical Dekker form (p = a*b; err from half-products vs p) is
    correct arithmetic but not robust under compilation: the fresh
    ``a*b`` multiply gets FMA-contracted into whatever add consumes p
    (e.g. two_sum's ``s = yh + p`` -> ``fma(a, b, yh)``), which
    desynchronizes s from the rounded p inside the error recovery —
    measured 1-ulp-of-product errors at ~0.3%% of elements on XLA:CPU,
    varying with vectorization shape, and not reliably suppressed by
    optimization_barrier.  Here instead EVERY multiply is exact by
    construction (12-bit halves; an FMA of an exact product is identical
    to mul+add, so contraction cannot change any value) and the pieces
    are combined with two_sum chains (adds only, nothing to contract):

        a1*b1 + a1*b2 + a2*b1 == ph + e1 + e2   (exactly)
        err = (e1 + e2) + a2*b2                 (rounds at ~2^-46 |p|)
    """
    a1, a2 = _dekker_split(a)
    b1, b2 = _dekker_split(b)
    s1, e1 = two_sum(a1 * b1, a1 * b2)
    ph, e2 = two_sum(s1, a2 * b1)
    err = (e1 + e2) + a2 * b2
    return ph, err


def _dekker_prod_bsplit(a, b, b1, b2):
    """_dekker_prod with ``b`` PRE-SPLIT (b1 + b2 == b, b1 <= 12
    significand bits).  Needed when b is a kernel scalar: Mosaic's
    ``tpu.bitcast`` only accepts vectors, so ``_dekker_split(b)`` cannot
    run inside the kernel (pairvec_gate21 verification failure) — the
    caller splits b in XLA and passes the halves through SMEM.  The
    combination sequence is identical to _dekker_prod, so the result is
    bit-identical."""
    a1, a2 = _dekker_split(a)
    s1, e1 = two_sum(a1 * b1, a1 * b2)
    ph, e2 = two_sum(s1, a2 * b1)
    err = (e1 + e2) + a2 * b2
    return ph, err


def _axpy_planes(yh, yl, xh, xl, ch, cl, ch1, ch2):
    """df64 y + c*x on (hi, lo) planes; the ops/pairvec._axpy_block
    formula with the contraction-proof product standing in for the
    f64-widening two_prod (same class, different pair decomposition).
    ``ch1``/``ch2`` are the XLA-side Dekker halves of ch (scalar bitcast
    is unsupported in Mosaic)."""
    p, e = _dekker_prod_bsplit(xh, ch, ch1, ch2)
    e = e + (xh * cl + xl * ch)
    s, t = two_sum(yh, p)
    t = t + (yl + e)
    return quick_two_sum(s, t)


def _axpy_kernel(c_ref, y_ref, x_ref, o_ref):
    ch = c_ref[0, 0]
    cl = c_ref[0, 1]
    ch1 = c_ref[0, 2]
    ch2 = c_ref[0, 3]
    oh, ol = _axpy_planes(y_ref[0, 0], y_ref[0, 1],
                          x_ref[0, 0], x_ref[0, 1], ch, cl, ch1, ch2)
    o_ref[0, 0] = oh
    o_ref[0, 1] = ol


def pair_axpy_kernel(y: jnp.ndarray, x: jnp.ndarray, alpha,
                     interpret: bool = False) -> jnp.ndarray:
    """y + alpha * x on windowed pairs [Z, 2, Yp, G]; one HBM pass over
    (z, y-block) tiles (see _y_block for why not whole planes).

    The output aliases y's buffer (y is dead at every call site in
    cg_solve_stepped_pair; XLA inserts a defensive copy otherwise)."""
    Z, _, Yp, G = y.shape
    ch, cl = split_f64(jnp.asarray(alpha, jnp.float64))
    ch = ch.astype(jnp.float32)
    ch1, ch2 = _dekker_split(ch)
    c = jnp.stack([ch, cl.astype(jnp.float32), ch1, ch2]).reshape(1, 4)
    by = _y_block(Yp)
    blk = pl.BlockSpec((1, 2, by, G), lambda zi, yi: (zi, _I0, yi, _I0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _axpy_kernel,
        grid=(Z, Yp // by),
        in_specs=[
            pl.BlockSpec((1, 4), lambda zi, yi: (_I0, _I0),
                         memory_space=pltpu.SMEM),
            blk, blk,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((Z, 2, Yp, G), jnp.float32),
        input_output_aliases={1: 0},
        cost_estimate=pl.CostEstimate(
            flops=22 * y.size, bytes_accessed=3 * y.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(c, y, x)


def _dot_kernel(a_ref, b_ref, w_ref, o_ref, acc_h, acc_l):
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    nz = pl.num_programs(0)
    ny = pl.num_programs(1)
    ah, al = a_ref[0, 0], a_ref[0, 1]                  # [by, G]
    bh, bl = b_ref[0, 0], b_ref[0, 1]
    ph, pe = _dekker_prod(ah, bh)
    rest = pe + (ah * bl + al * bh)
    w = w_ref[0]                                       # [G], 0/1: exact
    vh = ph * w
    vr = rest * w
    by, G = vh.shape
    q = by // 8
    lvh = jnp.sum(vh.reshape(q, 8, G), axis=0)         # [8, G]
    lvr = jnp.sum(vr.reshape(q, 8, G), axis=0)
    first = jnp.logical_and(zi == 0, yi == 0)

    @pl.when(first)
    def _():
        acc_h[...] = lvh
        acc_l[...] = lvr

    @pl.when(jnp.logical_not(first))
    def _():
        s, e = two_sum(acc_h[...], lvh)
        acc_h[...] = s
        acc_l[...] = acc_l[...] + (e + lvr)

    @pl.when(jnp.logical_and(zi == nz - 1, yi == ny - 1))
    def _():
        o_ref[0] = acc_h[...]
        o_ref[1] = acc_l[...]


def pair_dot_kernel(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """f64 dot of two windowed pairs with 0/1 lane weights ``w`` [G]:
    exact pair products + compensated cross-plane accumulation in one
    HBM pass; the [2, 8, G] partial grid finishes in a small XLA f64
    sum (~5k elements)."""
    Z, _, Yp, G = a.shape
    by = _y_block(Yp)
    blk = pl.BlockSpec((1, 2, by, G), lambda zi, yi: (zi, _I0, yi, _I0),
                       memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        _dot_kernel,
        grid=(Z, Yp // by),
        in_specs=[
            blk, blk,
            pl.BlockSpec((1, G), lambda zi, yi: (_I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 8, G), lambda zi, yi: (_I0, _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 8, G), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, G), jnp.float32),
            pltpu.VMEM((8, G), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=24 * a.size, bytes_accessed=2 * a.size * 4,
            transcendentals=0),
        interpret=interpret,
    )(a, b, w.reshape(1, G).astype(jnp.float32))
    return jnp.sum(parts[0].astype(jnp.float64)) + \
        jnp.sum(parts[1].astype(jnp.float64))


def use_pairvec_kernels(interpret: bool) -> bool:
    """MGT_PAIR_VEC_KERNEL gate — default ON for compiled (TPU)
    geometries since 2026-08-20: full gate run bit-clean at 24/40/128
    incl. the flagship shape (docs/tpu_r4/pairvec_gate.log: axpy 9.66 ms
    vs 36.0 XLA, dot 7.32 vs 26.3), flagship end-to-end at reference
    parity (flag128_pairvec.log: 8 its, red 0.0668, L2 4.20e-10), and
    the headline CG row 3.464 -> 2.185 s (flagrow_pvk.log).  Interpret
    mode (CPU) keeps the XLA forms unless the env forces the kernels."""
    env = os.environ.get("MGT_PAIR_VEC_KERNEL")
    if env is not None:
        return env not in ("", "0")
    return not interpret
