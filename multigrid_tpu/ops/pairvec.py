"""df64 vector arithmetic on windowed f32-pair dp vectors.

The flagship dp CG (solvers/cg.cg_solve_stepped_pair) carries its vectors
in the x-windowed (hi, lo) pair format of ops/pallas_windowed — the
persistent dp vector layout the fused Mosaic matvec consumes directly, the
TPU counterpart of the reference's ghosted vector format
(/root/reference/common/vector_access_reduced.h).  This module supplies the
CG vector kernel set on that format:

- ``pair_axpy`` / ``pair_xpby``: compensated df64 updates (~2^-47 relative,
  exceeding native f64 per-op accuracy) running entirely on the f32 VPU —
  bandwidth-bound, no fp64 emulation.
- ``pair_dot``: dp-grade dot via exact two_prod products + chunked f32
  partial sums (same accuracy class as ops/df64.dot_f64, which the f64
  node-grid CG uses), with duplicate-slot weighting folded in.
- ``pair_norm_f32``: f32 stopping-criterion norm (1e-7 relative, ample
  against a relative 1e-9 threshold; cf. cg_solve_stepped).

All functions slice their full-length temporaries through
``optimization_barrier`` above ~16M elements — the dot/axpy temps would
otherwise add multi-GB HBM peaks at the 135M-dof flagship (CLAUDE.md HBM
rules).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .df64 import _chunk_sum_to_f64, quick_two_sum, split_f64, two_prod, two_sum

_CHUNK = 16_000_000


def _pair_flat(a):
    """[Z, 2, Yp, G] windowed pair -> (hi, lo) flat f32 views."""
    return a[:, 0].reshape(-1), a[:, 1].reshape(-1)


def _slices(n: int):
    n_chunks = -(-n // _CHUNK)
    csize = -(-n // n_chunks)
    return [(i * csize, min(n, (i + 1) * csize)) for i in range(n_chunks)]


def pair_dot(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """f64 dot of two windowed pairs with lane weights ``w`` [G] (0/1 mask
    zeroing duplicated x-window slots; exact products since w is 0 or 1)."""
    Z, _, Yp, G = a.shape
    wf = jnp.broadcast_to(w[None, None, :], (Z, Yp, G)).reshape(-1)
    ah, al = _pair_flat(a)
    bh, bl = _pair_flat(b)
    acc = jnp.zeros((), jnp.float64)
    cuts = _slices(ah.size)
    for k, (lo, hi) in enumerate(cuts):
        ph, pe = two_prod(ah[lo:hi], bh[lo:hi])
        rest = pe + (ah[lo:hi] * bl[lo:hi] + al[lo:hi] * bh[lo:hi])
        ws = wf[lo:hi]
        acc = acc + _chunk_sum_to_f64(ph * ws) + _chunk_sum_to_f64(rest * ws)
        if k + 1 < len(cuts):
            (ah, al, bh, bl, wf), acc = jax.lax.optimization_barrier(
                ((ah, al, bh, bl, wf), acc))
    return acc


def pair_norm_f32(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """f32 weighted 2-norm of the hi plane (stopping criterion only)."""
    hi = a[:, 0]
    s = jnp.sum(jnp.sum(hi * hi, axis=(0, 1)) * w)
    return jnp.sqrt(s)


def _axpy_block(yh, yl, xh, xl, ch, cl):
    """df64 y + c*x elementwise; c = (ch, cl) a split f64 scalar."""
    p, e = two_prod(xh, ch)
    e = e + (xh * cl + xl * ch)
    s, t = two_sum(yh, p)
    t = t + (yl + e)
    return quick_two_sum(s, t)


def pair_axpy(y: jnp.ndarray, x: jnp.ndarray, alpha) -> jnp.ndarray:
    """y + alpha * x on windowed pairs; ``alpha`` is an f64 scalar (traced
    or concrete).  Chunked to bound temp HBM; donation-friendly (output
    shape == y's)."""
    ch, cl = split_f64(jnp.asarray(alpha, jnp.float64))
    yh, yl = _pair_flat(y)
    xh, xl = _pair_flat(x)
    outs_h, outs_l = [], []
    cuts = _slices(yh.size)
    for k, (lo, hi) in enumerate(cuts):
        oh, ol = _axpy_block(yh[lo:hi], yl[lo:hi], xh[lo:hi], xl[lo:hi],
                             ch, cl)
        if k + 1 < len(cuts):
            (yh, yl, xh, xl), oh, ol = jax.lax.optimization_barrier(
                ((yh, yl, xh, xl), oh, ol))
        outs_h.append(oh)
        outs_l.append(ol)
    Z, _, Yp, G = y.shape
    return jnp.stack([jnp.concatenate(outs_h).reshape(Z, Yp, G),
                      jnp.concatenate(outs_l).reshape(Z, Yp, G)], axis=1)


def pair_xpby(x: jnp.ndarray, y: jnp.ndarray, beta) -> jnp.ndarray:
    """x + beta * y (CG search-direction update p = z + beta p)."""
    return pair_axpy(x, y, beta)


def pair_from_f32(op, z: jnp.ndarray) -> jnp.ndarray:
    """f32 node grid -> windowed pair with zero lo plane (preconditioner
    output injection; ``op`` is a PallasWindowedOzaki for geometry).  The
    lane relayout delegates to the shared XWindowMap (MXU permutation
    matmul on hardware)."""
    w = op.xmap.win(op._pad_x(z), op.interpret)
    w = jnp.pad(w, ((0, 0), (0, op.Yp - op.Y), (0, 0)))
    return jnp.stack([w, jnp.zeros_like(w)], axis=1)


def pair_hi_node(op, a: jnp.ndarray) -> jnp.ndarray:
    """Windowed pair -> f32 node grid of the hi plane (preconditioner
    input extraction)."""
    return op.xmap.unwin(a[:, 0, : op.Y], op.interpret)[..., : op.X]
