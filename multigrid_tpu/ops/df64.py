"""Double-float (two-float32) compensated arithmetic for the dp operator path.

TPU MXU/VPU have no native fp64; XLA's f64 emulation of the sum-factorized
contractions is ~100x slower than fp32 on this hardware (measured).  This
module implements the classic double-double technique on float32 pairs
(Dekker splitting + compensated sums, no FMA required), giving ~2^-45
relative accuracy — more than enough for the reference's dp targets
(CG rtol 1e-9, L2 errors ~4e-10, /root/reference/README.md:159) — while
staying on the fast f32 vector units.

This is the "double-double via MXU where profitable" plan from SURVEY.md §7
(hard part 5): the contraction length is p+1 (tiny), so the VPU broadcast
form below is the MXU-free sweet spot; all ops fuse under XLA.

Convention: a df64 value is a pair (hi, lo) of f32 arrays with
|lo| <= ulp(hi)/2; hi + lo represents the value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mask_split_np(hi: np.ndarray):
    """Host-side 12-bit mantissa-mask split of f32 values."""
    bits = hi.view(np.uint32) & np.uint32(0xFFFFF000)
    hhi = bits.view(np.float32)
    return hhi, hi - hhi


def split_f64(x) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f64 array -> (hi, lo) f32 pair with hi = f32(x), lo = f32(x - hi)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def join_f64(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _dekker_split(a):
    """Split into halves by ROUND-TO-NEAREST mantissa masking (exact
    products in f32).

    Implemented with a bitmask instead of the classical Dekker arithmetic
    (t = 4097*a; hi = t - (t - a)): compilers may contract the latter into
    an FMA, which skips the rounding the algorithm relies on (observed with
    XLA:CPU).  Adding 0x800 before masking rounds the kept 11 stored bits
    to nearest (the carry propagates correctly through the IEEE exponent
    field), reproducing Veltkamp's rounded split: hi has <= 12 significand
    bits and |lo| <= 2^-12 |a| (lo <= 11 bits + sign).  A TRUNCATING mask
    (the earlier form) leaves lo up to 12 bits, which breaks the exactness
    of Dekker's error-term additions on rare operand patterns — measured
    1-ulp-of-product errors at ~1e-4 frequency (join off by 2^-23
    relative), found via the pair-axpy kernel bit-equality gate."""
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    ahi = jax.lax.bitcast_convert_type(
        (ai + jnp.uint32(0x800)) & jnp.uint32(0xFFFFF000), jnp.float32)
    alo = a - ahi
    return ahi, alo


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return s, err


def two_prod(a, b, bhi=None, blo=None):
    """Exact product a*b = p + err in f32.

    Implemented by widening to f64 (an f32*f32 product is exact in f64);
    XLA emulates the f64 multiply with a handful of f32 ops on TPU —
    comparable to the classical Dekker sequence, but immune to the
    FMA-contraction/simplifier rewrites that silently break Dekker's
    rounding assumptions under jit (observed on XLA:CPU).  ``bhi``/``blo``
    are accepted for API compatibility and ignored.
    """
    # p must be derived FROM p64 (not computed as an f32 multiply): XLA's
    # excess-precision rewrite turns convert_f64(mul_f32(a,b)) into
    # mul_f64(convert(a), convert(b)), which would cancel the error term.
    p64 = a.astype(jnp.float64) * b.astype(jnp.float64)
    p = p64.astype(jnp.float32)
    err = (p64 - p.astype(jnp.float64)).astype(jnp.float32)
    return p, err


def _chunk_sum_to_f64(x32: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Sum an f32 array: f32 partial sums per chunk (fast, pairwise), then
    one SMALL f64 reduction over the partials."""
    x32 = x32.ravel()
    pad = (-x32.size) % chunk
    if pad:
        x32 = jnp.concatenate([x32, jnp.zeros((pad,), x32.dtype)])
    s = jnp.sum(x32.reshape(-1, chunk), axis=1)
    return jnp.sum(s.astype(jnp.float64))


def sum_f64(x: jnp.ndarray) -> jnp.ndarray:
    """Accurate-enough sum of an f64 array avoiding full-length f64
    reductions (XLA:TPU emulates f64 reduces at ~100x cost: one 17M-dof
    f64 vdot measured 190 ms vs 2 ms for the f32 one).  The value is split
    into an exact f32 pair and both components are chunk-summed in f32
    with a small f64 combine; relative error ~1e-6 of sum(|x|)."""
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    return _chunk_sum_to_f64(xh) + _chunk_sum_to_f64(xl)


def _dot_f64_block(a, b):
    ah = a.astype(jnp.float32)
    al = (a - ah.astype(jnp.float64)).astype(jnp.float32)
    bh = b.astype(jnp.float32)
    bl = (b - bh.astype(jnp.float64)).astype(jnp.float32)
    ph, pl = two_prod(ah, bh)
    rest = pl + (ah * bl + al * bh)
    return _chunk_sum_to_f64(ph) + _chunk_sum_to_f64(rest)


def dot_f64(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product of f64 vectors without big f64 reductions: exact f32
    pair products (two_prod) + chunked f32 sums + small f64 combine.
    Error ~1e-6 relative to sum(|a_i b_i|) — ample for CG coefficients and
    far below the discrimination needed by rtol-1e-9 convergence checks;
    the residual RECURRENCE itself stays full f64 (elementwise f64 is
    cheap on TPU, only reductions are not).

    Above 16M elements the split/product temps (~7 full-size f32 arrays)
    would add GBs of HBM peak inside larger programs, so the vector is
    processed in slices chained through ``optimization_barrier`` (the data
    dependency stops XLA from scheduling all slices' temps concurrently)."""
    af = a.ravel()
    bf = b.ravel()
    n = af.size
    limit = 16_000_000
    if n <= limit:
        return _dot_f64_block(af, bf)
    n_chunks = -(-n // limit)
    csize = -(-n // n_chunks)
    acc = jnp.zeros((), jnp.float64)
    for i in range(n_chunks):
        lo = i * csize
        hi = min(n, lo + csize)
        s = _dot_f64_block(af[lo:hi], bf[lo:hi])
        acc = acc + s
        if i + 1 < n_chunks:
            af, acc = jax.lax.optimization_barrier((af, acc))
    return acc


def norm_f64(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot_f64(a, a))


def df64_add(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl), sloppy double-double addition (~2^-47)."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return quick_two_sum(s, e)


def df64_mul_f64const(xh, xl, c: float):
    """df64 * exact f64 scalar constant."""
    ch = np.float32(c)
    cl = np.float32(c - float(ch))
    p, e = two_prod(xh, ch)
    e = e + (xh * cl + xl * ch)
    return quick_two_sum(p, e)


class SplitMatrix:
    """An exact f64 matrix pre-split for df64 contractions."""

    def __init__(self, M: np.ndarray):
        M = np.asarray(M, np.float64)
        self.n_out, self.n_in = M.shape
        hi = M.astype(np.float32)
        lo = (M - hi.astype(np.float64)).astype(np.float32)
        self.hi = jnp.asarray(hi)
        self.lo = jnp.asarray(lo)
        # precomputed mantissa-mask splits of hi entries
        hhi, hlo = _mask_split_np(np.ascontiguousarray(hi))
        self.hi_split = (jnp.asarray(hhi), jnp.asarray(hlo))


def apply_1d_df64(wh: jnp.ndarray, wl: jnp.ndarray, M: SplitMatrix, axis: int):
    """df64 contraction of M[n_out, n_in] against ``axis`` of (wh, wl).

    Unrolled over the (small) contraction index; each term is an exact
    two_prod with compensated accumulation, all elementwise on the VPU and
    fusable by XLA.  The df64 replacement of :func:`ops.laplace.apply_1d`.
    """
    axis = axis % wh.ndim
    # move contraction axis last for clean broadcasting
    xh = jnp.moveaxis(wh, axis, -1)
    xl = jnp.moveaxis(wl, axis, -1)
    out_shape_tail = (M.n_out,)
    bshape = (1,) * (xh.ndim - 1)
    sh = sl = None
    for i in range(M.n_in):
        a_h = xh[..., i : i + 1]
        a_l = xl[..., i : i + 1]
        mh = M.hi[:, i].reshape(bshape + out_shape_tail)
        ml = M.lo[:, i].reshape(bshape + out_shape_tail)
        mhh = M.hi_split[0][:, i].reshape(bshape + out_shape_tail)
        mhl = M.hi_split[1][:, i].reshape(bshape + out_shape_tail)
        p, e = two_prod(a_h, mh, bhi=mhh, blo=mhl)
        e = e + (a_h * ml + a_l * mh)
        if sh is None:
            sh, sl = quick_two_sum(p, e)
        else:
            sh, sl = df64_add(sh, sl, p, e)
    return jnp.moveaxis(sh, -1, axis), jnp.moveaxis(sl, -1, axis)
