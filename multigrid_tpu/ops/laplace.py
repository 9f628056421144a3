"""Matrix-free continuous-FE_Q Laplace operator, XLA sum-factorization path.

TPU-native re-design of the reference operator
(/root/reference/common/laplace_operator.h:56-164):

* cell-batched evaluation becomes batched einsum contractions over the
  interleaved cell layout ``[N0, n, N1, n, N2, n]`` produced by
  :mod:`multigrid_tpu.ops.windows` — the (p+1)x(p+1) 1-D matrices hit the
  MXU with the full cell grid as batch, instead of the reference's even-odd
  SIMD kernels (/root/reference/common/matrix_vector_kernel.h:30-216);
* the *merged coefficient* trick is kept: the quadrature-point operation
  applies one symmetric tensor ``C = c * w_q * det(J) * J^{-1} J^{-T}``
  per point (or a single diagonal for affine geometry + constant
  coefficient, /root/reference/common/laplace_operator.h:357-432);
* Dirichlet constraints: inputs read as zero on constrained nodes, outputs
  written as identity rows ``dst[c] = src[c]``
  (/root/reference/common/laplace_operator.h:573-601).

The evaluation pipeline is basis->quad interpolation (d sweeps of S), then
collocation derivatives (d sweeps of D_col), the quad-point coefficient
apply, and the transpose sweeps — identical in flops to the reference's
collocation path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.brick import DofGrid
from .masks import bcast_and, interior_axes_jnp
from .windows import gather_cells, scatter_cells

_SYM2 = ((0, 0), (1, 1), (0, 1))
_SYM3 = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


def sym_components(dim: int):
    """Symmetric-tensor storage order, matching
    /root/reference/common/laplace_operator.h:382-386 (diag first)."""
    return _SYM2 if dim == 2 else _SYM3


def sym_index(dim: int, a: int, b: int) -> int:
    comps = sym_components(dim)
    key = (min(a, b), max(a, b))
    return comps.index(key)


def apply_1d(w: jnp.ndarray, mat: jnp.ndarray, axis: int,
             precision=None) -> jnp.ndarray:
    """Contract ``mat[out, in]`` against node-axis ``axis`` of ``w``.

    The batched small-matrix contraction that replaces
    ``apply_1d_matvec_kernel`` (/root/reference/common/matrix_vector_kernel.h:30-45).
    ``precision``: forwarded to einsum — f32 contractions at DEFAULT
    precision quantize operands to bf16 on the MXU (CLAUDE.md hardware
    finding); pass ``jax.lax.Precision.HIGHEST`` where f32 accuracy is
    load-bearing on TPU.
    """
    nd = w.ndim
    in_subs = list(range(nd))
    out_subs = list(range(nd))
    out_subs[axis] = nd
    return jnp.einsum(w, in_subs, mat, [nd, axis], out_subs,
                      precision=precision)


@dataclass(frozen=True)
class DiagCoef:
    """Affine geometry + constant scalar coefficient: merged tensor is the
    diagonal ``c * det(J) / h_d^2`` (one value per axis); the quadrature
    weight is applied separately, as in the reference affine fast path
    (/root/reference/common/laplace_operator.h:447-491)."""

    values: tuple[float, ...]


@dataclass
class SymCoef:
    """Full per-quad-point symmetric merged coefficient INCLUDING JxW and
    quadrature weight; array broadcastable to ``[N0,nq,...,N_{d-1},nq,nsym]``
    (/root/reference/common/laplace_operator.h:493-522)."""

    array: jnp.ndarray


Coef = Union[DiagCoef, SymCoef]


def make_diag_coef(grid: DofGrid, coefficient: float = 1.0) -> DiagCoef:
    jxw = grid.jxw_scalar
    return DiagCoef(tuple(coefficient * jxw / h**2 for h in grid.h))


class LaplaceOperator:
    """A·u for -div(c grad u) with FE_Q(p) on one structured-brick level."""

    def __init__(self, grid: DofGrid, dtype=jnp.float32, coef: Optional[Coef] = None):
        self.grid = grid
        self.dtype = dtype
        b = grid.basis
        self.n = b.n
        self.dim = grid.dim
        self.S = jnp.asarray(b.S, dtype)
        self.St = jnp.asarray(b.S.T, dtype)
        self.D = jnp.asarray(b.D_col, dtype)
        self.Dt = jnp.asarray(b.D_col.T, dtype)
        self.coef = coef if coef is not None else make_diag_coef(grid)
        self._interior_axes = interior_axes_jnp(grid)
        # quadrature-weight product, broadcastable to the interleaved layout
        qw = b.quad_weights
        w3 = np.ones([1] * (2 * self.dim))
        for d in range(self.dim):
            shape = [1] * (2 * self.dim)
            shape[2 * d + 1] = self.n
            w3 = w3 * qw.reshape(shape)
        self.w3d = jnp.asarray(w3, dtype)
        # per-axis 1-D scattered diagonal factors for the separable
        # inverse_diagonal (see there)
        if isinstance(self.coef, DiagCoef):
            mdiag, ldiag = np.diag(b.M), np.diag(b.L)
            p = grid.degree
            self._diag_lines = []
            for d in range(self.dim):
                row = []
                for e in range(self.dim):
                    vec = ldiag if e == d else mdiag
                    nc = grid.cells[e]
                    line = np.zeros(nc * p + 1)
                    for c in range(nc):
                        line[c * p : c * p + p + 1] += vec
                    row.append(jnp.asarray(line, dtype))
                self._diag_lines.append(row)

    @property
    def interior(self) -> jnp.ndarray:
        """Interior mask rebuilt from per-axis vectors at trace time (a
        materialized full-grid constant would be embedded as an O(N)
        literal in every jitted closure)."""
        return bcast_and(self._interior_axes)

    # ---------------------------------------------------------------- eval
    def _to_quad(self, w: jnp.ndarray) -> jnp.ndarray:
        for d in range(self.dim):
            w = apply_1d(w, self.S, 2 * d + 1)
        return w

    def _from_quad_t(self, w: jnp.ndarray) -> jnp.ndarray:
        for d in range(self.dim):
            w = apply_1d(w, self.St, 2 * d + 1)
        return w

    def _gradients(self, uq: jnp.ndarray) -> list[jnp.ndarray]:
        return [apply_1d(uq, self.D, 2 * d + 1) for d in range(self.dim)]

    def _quad_op(self, g: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
        """Merged-coefficient apply at quadrature points
        (/root/reference/common/laplace_operator.h:436-523)."""
        dim = self.dim
        if isinstance(self.coef, DiagCoef):
            return [g[d] * (self.coef.values[d] * self.w3d) for d in range(dim)]
        C = self.coef.array
        comps = sym_components(dim)
        out = []
        for a in range(dim):
            acc = None
            for b_ in range(dim):
                term = C[..., sym_index(dim, a, b_)] * g[b_]
                acc = term if acc is None else acc + term
            out.append(acc)
        return out

    def apply_cells(self, u: jnp.ndarray) -> jnp.ndarray:
        """Unconstrained operator: gather -> evaluate -> coefficient ->
        integrate -> scatter (no Dirichlet handling);
        cf. local_apply /root/reference/common/laplace_operator.h:527-558."""
        w = gather_cells(u, self.n)
        uq = self._to_quad(w)
        g = self._gradients(uq)
        gq = self._quad_op(g)
        acc = apply_1d(gq[0], self.Dt, 1)
        for d in range(1, self.dim):
            acc = acc + apply_1d(gq[d], self.Dt, 2 * d + 1)
        y = self._from_quad_t(acc)
        return scatter_cells(y, self.n)

    # --------------------------------------------------------------- vmult
    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """dst = A src with identity rows on Dirichlet nodes
        (/root/reference/common/laplace_operator.h:573-601)."""
        xm = jnp.where(self.interior, src, 0)
        y = self.apply_cells(xm)
        return jnp.where(self.interior, y, src)

    def vmult_residual(self, rhs: jnp.ndarray, lhs: jnp.ndarray) -> jnp.ndarray:
        """residual = rhs - A lhs (constrained rows rhs - lhs),
        /root/reference/common/laplace_operator.h:605-634."""
        xm = jnp.where(self.interior, lhs, 0)
        y = self.apply_cells(xm)
        return jnp.where(self.interior, rhs - y, rhs - lhs)

    # ----------------------------------------------------------------- rhs
    def compute_rhs(self, f_quad: jnp.ndarray, u_bc: jnp.ndarray) -> jnp.ndarray:
        """b = M f - A u_bc with zero at Dirichlet rows; the analogue of
        compute_residual (/root/reference/common/laplace_operator.h:804-845).

        ``f_quad``: right-hand side evaluated on the interleaved quad layout.
        ``u_bc``: node-grid vector holding boundary values (read unmasked,
        like the phi_nodirichlet path in the reference).
        """
        jxw = self.grid.jxw_scalar
        fv = self._from_quad_t(f_quad.astype(self.dtype) * (self.w3d * jxw))
        w = gather_cells(u_bc, self.n)
        uq = self._to_quad(w)
        g = self._gradients(uq)
        gq = self._quad_op(g)
        acc = apply_1d(gq[0], self.Dt, 1)
        for d in range(1, self.dim):
            acc = acc + apply_1d(gq[d], self.Dt, 2 * d + 1)
        y = fv - self._from_quad_t(acc)
        b = scatter_cells(y, self.n)
        return jnp.where(self.interior, b, 0)

    def _z_chunk(self, target_dofs: int = 2_000_000) -> int:
        """Largest z-cell-slab divisor keeping per-slab work <= target."""
        ncz = self.grid.cells[0]
        per_layer = self.grid.n_dofs // max(ncz, 1)
        want = max(1, target_dofs // max(per_layer, 1))
        for c in range(min(want, ncz), 0, -1):
            if ncz % c == 0:
                return c
        return 1

    def compute_rhs_chunked(self, f_quad: jnp.ndarray, u_bc: jnp.ndarray,
                            target_dofs: int = 4_000_000) -> jnp.ndarray:
        """z-slab-chunked :meth:`compute_rhs`: the monolithic dp assembly
        materializes full-size padded einsum intermediates that exceed HBM
        above ~20M dofs (XLA pads the minor (p+1)-wide axes to the (8,128)
        tile); slabs keep working sets on-chip.  Cell slabs overlap by one
        node plane, merged by the additive window scatter.

        The slab loop is UNROLLED, not a ``lax.map``: XLA:TPU compiles f64
        dot_generals inside scan/map bodies with a reduced-precision
        strategy (~2e-8 relative, measured), while the same einsums unrolled
        keep full fp64-emulation accuracy (2e-16).  rhs accuracy feeds the
        1e-9 outer CG directly, so correctness beats the map's smaller
        program here (setup-only path)."""
        from .windows import scatter_axis, window_axis

        assert isinstance(self.coef, DiagCoef), "chunked path: affine bricks"
        assert self.dim == 3
        p = self.grid.degree
        ncz = self.grid.cells[0]
        cz = self._z_chunk(target_dofs)
        S = ncz // cz
        if S <= 1:
            return self.compute_rhs(f_quad, u_bc)
        fq = f_quad.reshape((S, cz) + f_quad.shape[1:])
        ub = window_axis(u_bc, 0, cz * p + 1)  # [S, w, Y, X]

        def body(fq_s, ub_s):
            jxw = self.grid.jxw_scalar
            fv = self._from_quad_t(fq_s.astype(self.dtype) * (self.w3d * jxw))
            w = gather_cells(ub_s, self.n)
            uq = self._to_quad(w)
            g = self._gradients(uq)
            gq = self._quad_op(g)
            acc = apply_1d(gq[0], self.Dt, 1)
            for d in range(1, self.dim):
                acc = acc + apply_1d(gq[d], self.Dt, 2 * d + 1)
            y = fv - self._from_quad_t(acc)
            return scatter_cells(y, self.n)  # [w, Y, X]

        slabs = jnp.stack([body(fq[s], ub[s]) for s in range(S)])
        b = scatter_axis(slabs, 0)
        return jnp.where(self.interior, b, 0)

    def l2_error_chunked(self, u: jnp.ndarray, exact_quad: jnp.ndarray,
                         target_dofs: int = 2_000_000) -> jnp.ndarray:
        """z-slab-chunked :meth:`l2_error` (same HBM rationale)."""
        from .windows import window_axis

        assert self.dim == 3
        p = self.grid.degree
        ncz = self.grid.cells[0]
        cz = self._z_chunk(target_dofs)
        S = ncz // cz
        if S <= 1:
            return self.l2_error(u, exact_quad)
        eq = exact_quad.reshape((S, cz) + exact_quad.shape[1:])
        uw = window_axis(u, 0, cz * p + 1)
        jxw = self.w3d * self.grid.jxw_scalar
        use_df64 = u.dtype == jnp.float64
        if use_df64:
            from .df64 import sum_f64

        def body(u_s, eq_s):
            uq = self._to_quad(gather_cells(u_s, self.n))
            sq = (uq - eq_s) ** 2 * jxw
            return sum_f64(sq) if use_df64 else jnp.sum(sq)

        # unrolled like compute_rhs_chunked: f64 einsums inside lax.map
        # bodies lose accuracy on XLA:TPU (see there)
        errs = jnp.stack([body(uw[s], eq[s]) for s in range(S)])
        err = jnp.sum(errs)
        vol = float(np.prod(exact_quad.shape)) / self.w3d.size * float(
            np.asarray(self.w3d, np.float64).sum()
        ) * self.grid.jxw_scalar
        return jnp.sqrt(err / vol)

    # ------------------------------------------------------------ diagonal
    def inverse_diagonal(self) -> jnp.ndarray:
        """1/diag(A) with 1.0 on Dirichlet rows
        (/root/reference/common/laplace_operator.h:745-800)."""
        b = self.grid.basis
        if isinstance(self.coef, DiagCoef):
            # fully separable: node diagonal = sum_d c_d prod_e f_{d,e}[i_e]
            # where f_{d,e} is the 1-D window-scatter of (L_ii if e==d else
            # M_ii) along axis e.  Built in-graph from 1-D constants so
            # jitted closures embed only O(shape_d) literals.
            dim = self.dim
            diag = None
            for d in range(dim):
                term = None
                for e in range(dim):
                    shape = [1] * dim
                    shape[e] = self._diag_lines[d][e].shape[0]
                    f = self._diag_lines[d][e].reshape(shape)
                    term = f if term is None else term * f
                term = term * self.coef.values[d]
                diag = term if diag is None else diag + term
        else:
            # contraction of the full coefficient with per-axis factor tables
            dim = self.dim
            comps = sym_components(dim)
            C = self.coef.array
            diag = None
            for s, (a, bb) in enumerate(comps):
                # F^e[q,i] = T_a[q,i] * T_b[q,i] per axis (T = S or D_col@S=D)
                term = C[..., s] * (1.0 if a == bb else 2.0)
                for e in range(dim):
                    Ta = b.D if a == e else b.S
                    Tb = b.D if bb == e else b.S
                    F = jnp.asarray(Ta * Tb, self.dtype)  # (nq, n)
                    term = apply_1d(term, F.T, 2 * e + 1)
                diag = term if diag is None else diag + term
            diag = scatter_cells(diag, self.n)
        diag = jnp.where(self.interior, diag, 1.0)
        return 1.0 / diag

    # ------------------------------------------------------------ analysis
    def interpolate_to_quad(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._to_quad(gather_cells(u, self.n))

    def l2_error(self, u: jnp.ndarray, exact_quad: jnp.ndarray) -> jnp.ndarray:
        """Volume-weighted L2 error against exact values at quad points
        (/root/reference/common/multigrid_solver.h:298-343)."""
        jxw = self.w3d * self.grid.jxw_scalar
        uq = self.interpolate_to_quad(u)
        if uq.dtype == jnp.float64:
            # big f64 reductions are ~100x emulated on TPU (ops/df64)
            from .df64 import sum_f64

            err = sum_f64((uq - exact_quad) ** 2 * jxw)
            vol = float(np.prod(uq.shape)) / self.w3d.size * float(
                np.asarray(self.w3d, np.float64).sum()
            ) * self.grid.jxw_scalar
            return jnp.sqrt(err / vol)
        err = jnp.sum((uq - exact_quad) ** 2 * jxw)
        vol = jnp.sum(jnp.broadcast_to(jxw, uq.shape))
        return jnp.sqrt(err / vol)


def _contract_axis_host(t: np.ndarray, M: np.ndarray, axis: int) -> np.ndarray:
    """out[..., q@axis, ...] = sum_i M[q, i] t[..., i@axis, ...] (numpy)."""
    return np.moveaxis(np.tensordot(M, t, axes=(1, axis)), 0, axis)


def _scatter_pair_host(a: np.ndarray, p: int) -> np.ndarray:
    """Additively merge trailing ``[..., nc, n]`` cell windows (n = p+1,
    stride p) into dense nodes ``[..., nc*p+1]`` — numpy mirror of the
    device window scatter (ops/windows.py)."""
    nc, n = a.shape[-2], a.shape[-1]
    lead = a.shape[:-2]
    main = a[..., :p].reshape(lead + (nc * p,))
    tail = np.concatenate(
        [np.zeros(lead + (nc, p - 1), a.dtype), a[..., p:]], axis=-1
    ).reshape(lead + (nc * p,))
    pad = [(0, 0)] * len(lead)
    return (np.pad(main, pad + [(0, 1)]) + np.pad(tail, pad + [(1, 0)]))


def _scatter_cells_host(y: np.ndarray, p: int) -> np.ndarray:
    """Per-cell values ``[cz, cy, cx, nz, ny, nx]`` additively merged into a
    dense node block ``[cz*p+1, cy*p+1, cx*p+1]`` (numpy window scatter)."""
    t = y.transpose(0, 3, 1, 4, 2, 5)       # [cz, nz, cy, ny, cx, nx]
    t = _scatter_pair_host(t, p)            # [cz, nz, cy, ny, X]
    t = np.moveaxis(t, 4, 2)                # [cz, nz, X, cy, ny]
    t = _scatter_pair_host(t, p)            # [cz, nz, X, Y]
    t = t.transpose(0, 1, 3, 2)             # [cz, nz, Y, X]
    t = t.transpose(2, 3, 0, 1)             # [Y, X, cz, nz]
    return np.moveaxis(_scatter_pair_host(t, p), 2, 0)  # [Z, Y, X]


def compute_bc_slab_correction_host(grid: DofGrid, faces, coef=None):
    """``-A u_bc`` restricted to its support, as disjoint node slabs.

    The inhomogeneous-Dirichlet correction of the rhs only receives
    contributions from boundary-adjacent cells (u_bc lives on the boundary
    faces), so instead of running the dense volume assembly over a
    mostly-zero grid (the O(volume) zero-shuffling cost ~37 s single-core
    at the 135M flagship), this processes the six DISJOINT boundary cell
    blocks (2 z-layers, 2 y-strips, 2 x-pencils — O(surface) work) and
    accumulates into the six node slabs that tile the support: the exact
    slab decomposition `MultigridSolver._rhs_separable_device` ships over
    the device link.  Returns ``(slab_slices, slab_arrays)``; boundary rows
    are NOT zeroed (the device build masks them).
    Cf. /root/reference/common/laplace_operator.h:804-845 (compute_residual
    builds the same lift; deal.II only touches constrained cells too).
    """
    assert grid.dim == 3
    coef = coef if coef is not None else make_diag_coef(grid)
    from numpy.lib.stride_tricks import sliding_window_view

    from .laplace_dense import element_matrix

    p = grid.degree
    n = grid.basis.n
    N = n ** 3
    K_el = element_matrix(grid, coef)                  # [N, N]
    ncz, ncy, ncx = grid.cells
    assert min(ncz, ncy, ncx) >= 2, "slab decomposition needs >=2 cells/axis"
    Z, Y, X = grid.shape
    zi, yi = slice(n, Z - n), slice(n, Y - n)
    slab_slices = [
        (slice(0, n),), (slice(Z - n, Z),),
        (zi, slice(0, n)), (zi, slice(Y - n, Y)),
        (zi, yi, slice(0, n)), (zi, yi, slice(X - n, X)),
    ]
    slab_bounds = []
    for sl in slab_slices:
        sl = tuple(sl) + (slice(None),) * (3 - len(sl))
        slab_bounds.append([s.indices(e)[:2] for s, e in zip(sl, (Z, Y, X))])
    out = [np.zeros(tuple(b1 - b0 for b0, b1 in bb), np.float64)
           for bb in slab_bounds]

    blocks = [   # disjoint cell blocks covering every boundary-adjacent cell
        ((0, 1), (0, ncy), (0, ncx)),
        ((ncz - 1, ncz), (0, ncy), (0, ncx)),
        ((1, ncz - 1), (0, 1), (0, ncx)),
        ((1, ncz - 1), (ncy - 1, ncy), (0, ncx)),
        ((1, ncz - 1), (1, ncy - 1), (0, 1)),
        ((1, ncz - 1), (1, ncy - 1), (ncx - 1, ncx)),
    ]
    for blk in blocks:
        if any(c1 <= c0 for c0, c1 in blk):
            continue
        lo = tuple(c0 * p for c0, _ in blk)
        ext = tuple((c1 - c0) * p + 1 for c0, c1 in blk)
        u = np.zeros(ext, np.float64)
        i = 0
        for d in range(3):
            for side in (0, 1):
                g_idx = 0 if side == 0 else grid.shape[d] - 1
                if lo[d] <= g_idx < lo[d] + ext[d]:
                    sel = [slice(l, l + e) for l, e in zip(lo, ext)]
                    sel[d] = slice(0, 1)
                    usel = [slice(None)] * 3
                    usel[d] = slice(g_idx - lo[d], g_idx - lo[d] + 1)
                    u[tuple(usel)] = faces[i][tuple(sel)]
                i += 1
        if not np.any(u):
            continue
        w = sliding_window_view(u, n, axis=0)[::p]
        w = sliding_window_view(w, n, axis=1)[:, ::p]
        w = sliding_window_view(w, n, axis=2)[:, :, ::p]
        cells_shape = w.shape[:3]
        y2 = -(np.ascontiguousarray(w).reshape(-1, N) @ K_el.T)
        blockR = _scatter_cells_host(y2.reshape(cells_shape + (n, n, n)), p)
        for bb, arr in zip(slab_bounds, out):
            ov = [(max(l, b0), min(l + e, b1))
                  for l, e, (b0, b1) in zip(lo, ext, bb)]
            if any(o1 <= o0 for o0, o1 in ov):
                continue
            src = tuple(slice(o0 - l, o1 - l) for (o0, o1), l in zip(ov, lo))
            dst = tuple(slice(o0 - b0, o1 - b0)
                        for (o0, o1), (b0, _) in zip(ov, bb))
            arr[dst] += blockR[src]
    return slab_slices, out


def compute_rhs_host(grid: DofGrid, rhs_fn, u_bc_np: np.ndarray,
                     coef: Optional[DiagCoef] = None,
                     z_slab_cells: int = 4) -> np.ndarray:
    """Host (numpy, native fp64) rhs assembly ``b = M f - A u_bc`` with zero
    Dirichlet rows — the flagship-scale setup path.

    The on-device dp assembly must unroll its slab loop (f64 einsums inside
    lax.map bodies lose accuracy on XLA:TPU) and the unrolled fp64-emulation
    compile costs ~25 minutes at 135M dofs; rhs assembly is setup (untimed,
    cf. /root/reference/README.md:72 "rhs 8.98 s"), so it runs here in
    slabbed numpy where fp64 is native and exact
    (cf. compute_residual, /root/reference/common/laplace_operator.h:804-845).

    ``rhs_fn=None`` skips the mass term and returns only ``-A u_bc`` (the
    boundary-correction mode of the separable device assembly,
    solvers/multigrid.MultigridSolver._rhs_separable_device).
    """
    assert grid.dim == 3
    coef = coef if coef is not None else make_diag_coef(grid)
    b = grid.basis
    n, p = b.n, grid.degree
    S = np.asarray(b.S, np.float64)          # [q, i] node -> quad
    D = np.asarray(b.D_col, np.float64)      # [q, q'] collocation derivative
    qw = np.asarray(b.quad_weights, np.float64)
    w3 = qw[:, None, None] * qw[None, :, None] * qw[None, None, :]
    ncz, ncy, ncx = grid.cells
    jxw = grid.jxw_scalar
    qz, qy, qx = (np.asarray(grid.axis_quads[d], np.float64) for d in range(3))
    from numpy.lib.stride_tricks import sliding_window_view

    # both per-cell actions collapse to one [N, *] dgemm each: the mass
    # action M f = S3^T diag(w3 JxW) f_quad and the exact element stiffness
    # K u_cell (laplace_dense.element_matrix).  The axis-by-axis tensordot
    # sweeps this replaces ran ~20 tiny-K memory-bound passes per slab
    # (~200 s single-core at the 135M flagship); two K=125 dgemms take ~10 s.
    from .laplace_dense import element_matrix

    N = n ** 3
    S3 = np.kron(np.kron(S, S), S)                     # [Q, N] z-major
    W = S3.T * (w3.ravel() * jxw)[None, :]             # [N, Q]
    K_el = element_matrix(grid, coef)                  # [N, N]
    del D  # collocation derivative folded into K_el

    out = np.zeros(grid.shape, np.float64)
    u = np.asarray(u_bc_np, np.float64)
    ubc_zero = not np.any(u)
    for z0 in range(0, ncz, z_slab_cells):
        cz = min(z_slab_cells, ncz - z0)
        # --- M f: rhs at quad points, times w3*JxW, contracted to nodes
        if rhs_fn is not None:
            coords = [
                qz[z0 : z0 + cz].reshape(cz, 1, 1, n, 1, 1),
                qy.reshape(1, ncy, 1, 1, n, 1),
                qx.reshape(1, 1, ncx, 1, 1, n),
            ]
            fq = np.broadcast_to(np.asarray(rhs_fn(coords), np.float64),
                                 (cz, ncy, ncx, n, n, n))
            y2 = fq.reshape(cz * ncy * ncx, N) @ W.T
        else:
            y2 = np.zeros((cz * ncy * ncx, N))
        # --- minus A u_bc per cell, skipped when the boundary data is zero
        if not ubc_zero:
            rows = u[z0 * p : (z0 + cz) * p + 1]
            w = sliding_window_view(rows, n, axis=0)[::p]
            w = sliding_window_view(w, n, axis=1)[:, ::p]
            w = sliding_window_view(w, n, axis=2)[:, :, ::p]
            if rhs_fn is None:
                # correction-only mode: u_bc lives on the boundary, so
                # only boundary-adjacent cells contribute — dgemm that
                # subset (~4/nc of the cells) instead of the full slab
                sel = np.zeros((cz, ncy, ncx), bool)
                if z0 == 0:
                    sel[0] = True
                if z0 + cz == ncz:
                    sel[cz - 1] = True
                sel[:, 0, :] = sel[:, -1, :] = True
                sel[:, :, 0] = sel[:, :, -1] = True
                wsel = np.ascontiguousarray(w[sel]).reshape(-1, N)
                y2[sel.reshape(-1)] -= wsel @ K_el.T
            else:
                y2 -= np.ascontiguousarray(w).reshape(-1, N) @ K_el.T
        # --- scatter-add the slab (pairs [cz,nz], [ncy,ny], [ncx,nx])
        t = _scatter_cells_host(y2.reshape(cz, ncy, ncx, n, n, n), p)
        out[z0 * p : (z0 + cz) * p + 1] += t
    interior = ~np.asarray(grid.boundary_mask())
    return np.where(interior, out, 0.0)


def l2_error_host(grid: DofGrid, u_np: np.ndarray, exact_fn,
                  z_slab_cells: int = 4) -> float:
    """Host (numpy, true fp64) volume-weighted L2 error vs the analytic
    solution — the analysis path for flagship-size grids.

    On-device dp error evaluation needs the exact solution at ~2 q^dim
    values per dof resident in HBM plus tile-padded einsum temps; at the
    135M-dof flagship that crowds out the solve.  Error analysis is not a
    timed path, so it runs here in slabbed numpy instead
    (cf. compute_l2_error, /root/reference/common/multigrid_solver.h:298-343).
    ``u_np`` must carry its boundary values.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    assert grid.dim == 3
    b = grid.basis
    n, p = b.n, grid.degree
    St = np.asarray(b.S, np.float64).T          # contract node -> quad
    qw = np.asarray(b.quad_weights, np.float64)
    w3 = qw[:, None, None] * qw[None, :, None] * qw[None, None, :]
    ncz, ncy, ncx = grid.cells
    jxw = grid.jxw_scalar
    # per-axis quad coordinates [nc_d, q]
    qz, qy, qx = (np.asarray(grid.axis_quads[d], np.float64) for d in range(3))
    err = 0.0
    for z0 in range(0, ncz, z_slab_cells):
        cz = min(z_slab_cells, ncz - z0)
        rows = np.asarray(u_np[z0 * p : (z0 + cz) * p + 1], np.float64)
        # windows put the window dim LAST (stride slice on the windowed
        # axis): [cz, Y, X, n] -> quad via @ St
        t = sliding_window_view(rows, n, axis=0)[::p] @ St
        t = sliding_window_view(t, n, axis=1)[:, ::p] @ St   # [cz, ncy, X, qz, qy]
        t = sliding_window_view(t, n, axis=2)[:, :, ::p] @ St  # + [qx] last
        # window dims appended in sweep order: [cz, ncy, ncx, qz, qy, qx]
        coords = [
            qz[z0 : z0 + cz].reshape(cz, 1, 1, n, 1, 1),
            qy.reshape(1, ncy, 1, 1, n, 1),
            qx.reshape(1, 1, ncx, 1, 1, n),
        ]
        exact = np.asarray(exact_fn(coords), np.float64)
        d = t - exact
        err += float(np.sum(d * d * w3))
    vol = float(w3.sum()) * ncz * ncy * ncx * jxw
    return float(np.sqrt(err * jxw / vol))
