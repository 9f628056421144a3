"""MXU-native general-geometry Laplace operators (the TPU-fast curved path).

The reference's general path evaluates per-cell gradients by sum-factorized
1-D sweeps and applies a per-quad-point merged coefficient tensor
(/root/reference/common/laplace_operator.h:493-522).  The round-3 TPU build
carried that structure literally — df64 VPU broadcast sweeps — and measured
~1 s per dp matvec at 1.6M shell dofs: the compensated-pair arithmetic
amplifies every sweep flop ~20x and none of it touches the MXU.

TPU-first redesign: the entire gradient evaluation is ONE constant matrix
``G = [G_0; G_1; G_2]`` with ``G_d = kron_e(D_col·S if e==d else S)`` of
shape ``[dim*nq, N]`` shared by every cell, so

    y_cell = sum_d G_d^T ( C_cell ⊙ (G u_cell) )

is two batched shared-weight matmuls ``[cells, N] @ [N, dim*nq]`` and
``[cells, nq] @ [nq, N]`` (the MXU's favourite shape) sandwiching an
elementwise coefficient multiply.  Two precisions:

* ``GeneralLaplaceMXU``: f32 (smoother path), matmuls at
  ``Precision.HIGHEST`` (3-limb bf16 — f32 operands are otherwise
  quantized to bf16 on the MXU, CLAUDE.md hardware finding);
* ``GeneralLaplaceOzaki``: dp via the Ozaki scheme proven on the brick
  path (ops/laplace_dense.DenseLaplaceOzaki): 7-bit-mantissa limbs, exact
  bf16 MXU products, exact f32 group accumulation, compensated
  recombination; the middle coefficient multiply stays df64
  (ops/laplace_general_df64._quad_op).  The backward contraction is done
  per direction (three ``[cells, nq] @ [nq, N]`` Ozaki matmuls) so each
  group's f32 accumulation stays under the exactness bound
  ``(max_m+1)*K < 2^(24-2*limb_bits)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.mapped import GeneralGrid
from .df64 import df64_add, two_sum
from .laplace_dense import _LIMB_BITS, _MAX_M, _N_LIMBS, _split_limbs_f64
from .laplace_general import GeneralLaplace
from .laplace_general_df64 import GeneralLaplaceDF64


def pow2_ceil_f32(s: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two >= s, EXACTLY, via exponent-bit extraction.

    ``jnp.exp2(jnp.ceil(jnp.log2(s)))`` is NOT guaranteed exact:
    XLA:CPU's f32 exp2(21.0) returns 2097153.0 (2^21+1, measured
    2026-08-20) — a non-power-of-two sigma makes the Ozaki ``uh/sigma``
    division round and silently costs the whole scheme 24 bits on
    wide-dynamic-range rows.  Exponent-mask bit twiddling cannot miss.
    """
    s = s.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(s, jnp.uint32)
    p = jax.lax.bitcast_convert_type(
        bits & np.uint32(0x7F800000), jnp.float32)
    return jnp.where(s == p, p, p * np.float32(2.0))


def build_grad_matrices(basis, dim: int) -> list[np.ndarray]:
    """G_d = kron_e(D_col @ S if e == d else S): cell dofs -> d-gradient at
    the nq^dim Gauss points (f64).  kron order matches C-order flattening
    of the [n]*dim cell cube (axis 0 outermost)."""
    DS = np.asarray(basis.D_col @ basis.S, np.float64)
    S = np.asarray(basis.S, np.float64)
    out = []
    for d in range(dim):
        G = np.array([[1.0]])
        for e in range(dim):
            G = np.kron(G, DS if e == d else S)
        out.append(G)
    return out


class OzakiMatmul:
    """dp-accurate ``y = u @ M`` for a constant f64 matrix M [K, N] via
    exact bf16 limb products (the DenseLaplaceOzaki scheme, factored out
    for arbitrary constant operands).  Input and output are f32 pairs."""

    def __init__(self, M: np.ndarray, n_limbs: int = _N_LIMBS,
                 max_m: int = _MAX_M, limb_bits: int = _LIMB_BITS,
                 nnz_per_col: Optional[int] = None):
        """``nnz_per_col``: for BANDED M, the true number of nonzero
        contraction terms per output — exact-zero bf16 products do not
        round, so the f32-accumulation exactness bound scales with the
        band count, not the full contraction length K (used by the
        block-padded transfer's [Nf, Nc] interpolation bands)."""
        K, N = M.shape
        eff = K if nnz_per_col is None else min(K, nnz_per_col)
        if nnz_per_col is not None:
            counts = (M != 0).sum(axis=0)
            assert counts.max() <= nnz_per_col, (counts.max(), nnz_per_col)
        if (max_m + 1) * eff >= 2 ** (24 - 2 * limb_bits):
            raise ValueError(
                f"Ozaki exact-accumulation bound violated: ({max_m + 1})*{eff}"
                f" >= 2^{24 - 2 * limb_bits}")
        self.K, self.N = K, N
        self.n_limbs = n_limbs
        self.max_m = max_m
        self.limb_bits = limb_bits
        sigma, limbs = _split_limbs_f64(np.asarray(M, np.float64), n_limbs,
                                        limb_bits)
        self.sigma_M = sigma
        self.groups = [
            jnp.asarray(np.vstack([limbs[m - l] for l in range(m + 1)]),
                        jnp.bfloat16)
            for m in range(max_m + 1)
        ]

    def _limb_split_device(self, uh, ul):
        b = self.limb_bits
        s = jnp.max(jnp.abs(uh), axis=1, keepdims=True)
        sigma = pow2_ceil_f32(jnp.maximum(s, 1e-30))
        sigma = jnp.where(s > 0, sigma, 1.0)
        rh = uh / sigma
        rl = ul / sigma
        limbs = []
        for k in range(self.n_limbs):
            scale = np.float32(2.0 ** (b * (k + 1)))
            inv = np.float32(2.0 ** (-b * (k + 1)))
            chopped = jnp.round(rh * scale) * inv
            rh = rh - chopped  # exact (aligned grids)
            rh, rl = two_sum(rh, rl)
            limbs.append((chopped * np.float32(2.0 ** (b * k))).astype(jnp.bfloat16))
        return sigma, limbs

    def apply(self, uh: jnp.ndarray, ul: jnp.ndarray):
        """[rows, K] f32 pair -> [rows, N] f32 pair of u @ M."""
        sigma, limbs = self._limb_split_device(uh, ul)
        packed = jnp.concatenate(limbs, axis=1)
        acc_h = acc_l = None
        K = self.K
        for m in range(self.max_m + 1):
            Ym = jnp.dot(packed[:, : (m + 1) * K], self.groups[m],
                         preferred_element_type=jnp.float32)
            delta = np.float32(self.sigma_M * 2.0 ** (-self.limb_bits * m))
            term = Ym * delta * sigma
            if acc_h is None:
                acc_h, acc_l = term, jnp.zeros_like(term)
            else:
                acc_h, acc_l = df64_add(acc_h, acc_l, term,
                                        jnp.zeros_like(term))
        return acc_h, acc_l


class GeneralLaplaceMXU(GeneralLaplace):
    """f32 general-geometry A·u as two shared-weight MXU matmuls."""

    def __init__(self, grid: GeneralGrid, dtype=jnp.float32,
                 coef: Optional[np.ndarray] = None, coef_fn=None):
        super().__init__(grid, dtype, coef=coef, coef_fn=coef_fn)
        Gd = build_grad_matrices(grid.basis, self.dim)
        self.N = self.n ** self.dim
        # forward [N, dim*N]: u -> (g_0 | g_1 | g_2); backward is its
        # transpose [dim*N, N]
        Gf = np.hstack([G.T for G in Gd])
        self.Gf = jnp.asarray(Gf, self.dtype)
        self.Gb = jnp.asarray(Gf.T, self.dtype)

    def apply_cells(self, u: jnp.ndarray, C=None) -> jnp.ndarray:
        C = self.C if C is None else C
        nc, N, dim = self.grid.n_cells, self.N, self.dim
        w = self.gather(u).reshape(nc, N)
        g = jnp.dot(w, self.Gf, preferred_element_type=self.dtype,
                    precision=jax.lax.Precision.HIGHEST)
        g = g.reshape(nc, dim, N)
        Cq = C.reshape(nc, N, -1)
        from .laplace import sym_index

        t = []
        for a in range(dim):
            acc = None
            for b_ in range(dim):
                term = Cq[..., sym_index(dim, a, b_)] * g[:, b_, :]
                acc = term if acc is None else acc + term
            t.append(acc)
        t = jnp.stack(t, axis=1).reshape(nc, dim * N)
        y = jnp.dot(t, self.Gb, preferred_element_type=self.dtype,
                    precision=jax.lax.Precision.HIGHEST)
        return self.scatter_add(
            y.reshape((nc,) + (self.n,) * dim))


class GeneralLaplaceOzaki(GeneralLaplaceDF64):
    """dp general-geometry A·u via Ozaki bf16-limb MXU matmuls.

    Inherits the df64 coefficient handling, masking, f64 join-first
    scatter and the setup-only entry points (inverse_diagonal) from
    :class:`GeneralLaplaceDF64`; only the per-cell apply changes.
    """

    def __init__(self, grid: GeneralGrid, coef: Optional[np.ndarray] = None,
                 coef_fn=None):
        super().__init__(grid, coef=coef, coef_fn=coef_fn)
        Gd = build_grad_matrices(grid.basis, self.dim)
        self.N = self.n ** self.dim
        self._fwd = OzakiMatmul(np.hstack([G.T for G in Gd]))
        self._bwd = [OzakiMatmul(G) for G in Gd]

    def apply_cells_pair(self, xh, xl, Cp):
        nc, N, dim = self.grid.n_cells, self.N, self.dim
        uh = self._gather(xh).reshape(nc, N)
        ul = self._gather(xl).reshape(nc, N)
        gh, gl = self._fwd.apply(uh, ul)
        cell_shape = (nc,) + (self.n,) * dim
        g = [(gh[:, b * N:(b + 1) * N].reshape(cell_shape),
              gl[:, b * N:(b + 1) * N].reshape(cell_shape))
             for b in range(dim)]
        q = self._quad_op(g, Cp)
        acc = None
        for d in range(dim):
            th, tl = self._bwd[d].apply(q[d][0].reshape(nc, N),
                                        q[d][1].reshape(nc, N))
            if acc is None:
                acc = (th, tl)
            else:
                acc = df64_add(acc[0], acc[1], th, tl)
        return acc[0].reshape(cell_shape), acc[1].reshape(cell_shape)

    # -------------------------------------------------- setup/analysis
    # (the dp twins of GeneralLaplace.compute_rhs / l2_error, so TPU
    # solver setup never touches XLA's ~100x-slower emulated-f64 einsums
    # and never ships a second f64 coefficient array)
    def _Skron(self) -> np.ndarray:
        S = np.asarray(self.grid.basis.S, np.float64)
        M = np.array([[1.0]])
        for _ in range(self.dim):
            M = np.kron(M, S)
        return M                                 # [nq^dim, N]

    def compute_rhs_pair(self, fv: np.ndarray, u_bc) -> jnp.ndarray:
        """b = M f - A u_bc, zero at Dirichlet rows
        (/root/reference/common/laplace_operator.h:804-845); ``fv`` is
        f*JxW at the quad points, HOST-precomputed in f64."""
        from .df64 import split_f64

        nc, N = self.grid.n_cells, self.N
        if not hasattr(self, "_mass"):
            self._mass = OzakiMatmul(self._Skron())
        fv = np.asarray(fv, np.float64).reshape(nc, N)
        fh = jnp.asarray(fv.astype(np.float32))
        fl = jnp.asarray((fv - fv.astype(np.float32)).astype(np.float32))
        mh, ml = self._mass.apply(fh, fl)
        xh, xl = split_f64(u_bc)
        ah, al = self.apply_cells_pair(xh, xl, self.C)
        cell_shape = (nc,) + (self.n,) * self.dim
        yh, yl = df64_add(mh.reshape(cell_shape), ml.reshape(cell_shape),
                          -ah, -al)
        b = self._scatter_add_f64(yh, yl)
        return jnp.where(self.interior, b, 0.0)

    def l2_error(self, u: jnp.ndarray, exact_quad: jnp.ndarray,
                 jxw32: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Volume-weighted L2 error vs exact quad-point values
        (multigrid_solver.h:298-343).  Interpolation rides the Ozaki
        matmul; the (heavily cancelling) difference is taken in f64 and
        the positive-term quadrature sum in compensated f32."""
        from .df64 import join_f64, split_f64, sum_f64

        nc, N = self.grid.n_cells, self.N
        if not hasattr(self, "_interp"):
            self._interp = OzakiMatmul(self._Skron().T)
        if jxw32 is None:
            if not hasattr(self, "_jxw32"):
                self._jxw32 = jnp.asarray(
                    self.grid.jxw.reshape((nc,) + (self.n,) * self.dim),
                    jnp.float32)
            jxw32 = self._jxw32
        xh, xl = split_f64(u)
        qh, ql = self._interp.apply(self._gather(xh).reshape(nc, N),
                                    self._gather(xl).reshape(nc, N))
        cell_shape = (nc,) + (self.n,) * self.dim
        uq = join_f64(qh.reshape(cell_shape), ql.reshape(cell_shape))
        d = (uq - exact_quad).astype(jnp.float32)
        err = sum_f64((d * d * jxw32).reshape(-1))
        vol = sum_f64(jxw32.reshape(-1))
        return jnp.sqrt(err / vol)
