"""Reusable Ozaki-scheme matmul: fp64-accurate ``y = x @ M`` on the MXU.

Both operands are decomposed into 7-bit-mantissa limbs so every bf16 x bf16
product is exact and the f32 MXU accumulation stays exact; limb pairs are
grouped by total scale into one matmul per scale group, recombined with
compensated f32-pair arithmetic.  Extracted from the dense-element Laplace
operator (ops/laplace_dense.py) so the DG and transfer paths can share it.

Inputs/outputs are f32 pairs (hi, lo) representing f64 values; callers
split/join with ops.df64.split_f64/join_f64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .df64 import df64_add, two_sum

_LIMB_BITS = 7
_N_LIMBS = 6
_MAX_M = 5


def split_limbs_f64(M: np.ndarray, n_limbs: int = _N_LIMBS):
    """Host-side exact limb split: M = sigma * sum 2^{-7k} L_k with L_k
    holding 7-bit-mantissa values exactly representable in bf16."""
    sigma = 2.0 ** np.ceil(np.log2(np.abs(M).max() + 1e-300))
    r = M / sigma
    limbs = []
    for k in range(n_limbs):
        scale = 2.0 ** (_LIMB_BITS * (k + 1))
        chopped = np.round(r * scale) / scale
        limbs.append((chopped * 2.0 ** (_LIMB_BITS * k)).astype(np.float32))
        r = r - chopped
    return sigma, limbs


class OzakiMatmul:
    """fp64-accurate ``(yh, yl) = (xh, xl) @ M`` for a constant M [n_in, n_out].

    The contraction length per scale group is n_limbs * n_in; f32
    accumulation stays exact while 2*7 + log2(6 * n_in) < 24."""

    def __init__(self, M: np.ndarray, n_limbs: int = _N_LIMBS,
                 max_m: int = _MAX_M):
        M = np.asarray(M, np.float64)
        self.n_in, self.n_out = M.shape
        assert 14 + np.log2(n_limbs * self.n_in) < 24, "f32 accumulation overflow"
        self.n_limbs = n_limbs
        self.max_m = max_m
        sigma, limbs = split_limbs_f64(M, n_limbs)
        self.sigma = sigma
        Kbig = np.zeros((n_limbs * self.n_in, (max_m + 1) * self.n_out),
                        np.float32)
        for l in range(n_limbs):
            for m in range(max_m + 1):
                k = m - l
                if 0 <= k < n_limbs:
                    Kbig[l * self.n_in : (l + 1) * self.n_in,
                         m * self.n_out : (m + 1) * self.n_out] = limbs[k]
        self.Kbig = jnp.asarray(Kbig, jnp.bfloat16)

    def _limb_split(self, uh, ul):
        s = jnp.max(jnp.abs(uh), axis=-1, keepdims=True)
        from .laplace_general_mxu import pow2_ceil_f32

        # exact power-of-2 scale (f32 exp2 is inexact on integer args —
        # CLAUDE.md exp2 note; migrated r5 from exp2(ceil(log2)))
        sigma = pow2_ceil_f32(jnp.maximum(s, 1e-30))
        sigma = jnp.where(s > 0, sigma, 1.0)
        rh = uh / sigma
        rl = ul / sigma
        limbs = []
        for k in range(self.n_limbs):
            scale = np.float32(2.0 ** (_LIMB_BITS * (k + 1)))
            inv = np.float32(2.0 ** (-_LIMB_BITS * (k + 1)))
            chopped = jnp.round(rh * scale) * inv
            rh = rh - chopped  # exact (aligned grids)
            rh, rl = two_sum(rh, rl)
            limbs.append(
                (chopped * np.float32(2.0 ** (_LIMB_BITS * k))).astype(jnp.bfloat16)
            )
        return sigma, limbs

    def __call__(self, uh: jnp.ndarray, ul: jnp.ndarray):
        """[..., n_in] f32 pair -> [..., n_out] f32 pair."""
        sigma, limbs = self._limb_split(uh, ul)
        packed = jnp.concatenate(limbs, axis=-1)
        Y = jnp.dot(packed, self.Kbig, preferred_element_type=jnp.float32)
        acc_h = acc_l = None
        n_out = self.n_out
        for m in range(self.max_m + 1):
            delta = np.float32(self.sigma * 2.0 ** (-_LIMB_BITS * m))
            term = Y[..., m * n_out : (m + 1) * n_out] * delta * sigma
            if acc_h is None:
                acc_h, acc_l = term, jnp.zeros_like(term)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, term, jnp.zeros_like(term))
        return acc_h, acc_l
