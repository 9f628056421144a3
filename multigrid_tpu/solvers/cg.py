"""Preconditioned conjugate gradients with deal.II ``SolverCG`` +
``ReductionControl`` semantics (/root/reference/common/multigrid_solver.h:483-493):
stop when ||r|| < max(abs_tol, rtol * ||r0||), report iteration count and the
final relative residual.  Implemented as a jittable ``lax.while_loop``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.df64 import dot_f64, norm_f64


def _dot(a, b):
    """f64 dots avoid XLA:TPU's ~100x-slow f64 reductions (ops/df64)."""
    if a.dtype == jnp.float64:
        return dot_f64(a, b)
    return jnp.vdot(a, b)


def _norm(a):
    if a.dtype == jnp.float64:
        return norm_f64(a)
    return jnp.linalg.norm(a)


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    initial_norm: jnp.ndarray
    final_norm: jnp.ndarray


def cg_solve(
    A: Callable,
    b: jnp.ndarray,
    precond: Callable,
    max_iterations: int = 1000,
    abs_tol: float = 1e-16,
    rtol: float = 1e-9,
    weight: Optional[jnp.ndarray] = None,
) -> CGResult:
    """``weight``: optional per-entry dedup weights for the inner products
    (1/multiplicity), making CG on a duplicated-representation vector
    (e.g. the block-padded general-path layout) arithmetically identical
    to CG on the underlying true dof space."""
    if weight is None:
        dot, norm = _dot, _norm
    else:
        def dot(a, bb):
            return _dot(a * weight.astype(a.dtype), bb)

        def norm(a):
            return jnp.sqrt(dot(a, a))

    norm0 = norm(b)
    tol = jnp.maximum(abs_tol, rtol * norm0)

    z = precond(b)
    state = (jnp.zeros_like(b), b, z, dot(b, z), jnp.array(0), norm0)

    def cond(s):
        _, _, _, _, it, res = s
        return (res > tol) & (it < max_iterations)

    def body(s):
        x, r, p, rz, it, _ = s
        q = A(p)
        alpha = rz / dot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        res = norm(r)
        z = precond(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, it + 1, res)

    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, state)
    return CGResult(x=x, iterations=it, initial_norm=norm0, final_norm=res)


def cg_solve_stepped_pair(
    op_win,
    b: jnp.ndarray,
    precond_f32: Optional[Callable] = None,
    max_iterations: int = 1000,
    abs_tol: float = 1e-16,
    rtol: float = 1e-9,
    _jit_cache: Optional[dict] = None,
    precond_win: Optional[Callable] = None,
) -> CGResult:
    """Pair-native host-stepped PCG: the flagship dp path when the fused
    windowed matvec is installed (ops/pallas_windowed).

    All CG vectors live persistently in the x-windowed f32 (hi, lo) pair
    format — the fused Mosaic kernel's native layout — so the hot loop has
    ZERO layout/precision conversions: matvec via ``vmult_windowed``,
    vector updates in compensated df64 (ops/pairvec), dp dots via exact
    pair products.  Only the preconditioner touches a node grid (its input
    is the f32 cast of the residual, exactly as cg_solve_stepped's V-cycle
    does via ``.astype(float32)``).  Mirrors the reference CG keeping its
    vectors in the operator's ghosted layout
    (/root/reference/common/multigrid_solver.h:483-534).

    ``op_win``: PallasWindowedOzaki.  ``b``: f64 node grid, boundary-zero
    (the rhs invariant; compute_rhs zeroes Dirichlet rows).
    ``precond_f32``: f32 node grid -> f32 node grid (one V-cycle).
    ``precond_win``: windowed f32 [Z, Yp, G] -> windowed f32 — the
    zero-relayout alternative when the V-cycle itself runs windowed
    (MultigridSolver._v_cycle_windowed_core): the residual pair's hi plane
    IS the f32 defect, so preconditioning touches no node grid at all.
    Returns x as an f64 node grid."""
    from ..ops import pairvec as pv
    from ..ops import pallas_pairvec as pvk

    assert (precond_f32 is None) != (precond_win is None)
    cache = _jit_cache if _jit_cache is not None else {}
    w = op_win.dup_weights()
    if pvk.use_pairvec_kernels(op_win.interpret):
        # single-HBM-pass Mosaic forms of the CG vector glue (the XLA
        # compensated forms are barrier-chopped and ~9x off bandwidth
        # speed-of-light at the flagship — kernel_profile18)
        def _axpy(y, x, alpha):
            return pvk.pair_axpy_kernel(y, x, alpha, op_win.interpret)

        def _dot(a, b):
            return pvk.pair_dot_kernel(a, b, w, op_win.interpret)
    else:
        def _axpy(y, x, alpha):
            return pv.pair_axpy(y, x, alpha)

        def _dot(a, b):
            return pv.pair_dot(a, b, w)
    if "step_mv" not in cache:
        # the iteration is TWO host-stepped programs, not one: the fused
        # matvec's fold temps and the V-cycle preconditioner's per-level
        # temps each run ~5-7 GB at the 135M flagship — in a single program
        # they coexist with the 4.1 GB of donated pair carries and overflow
        # the 16 GB chip (measured: 16.42G needed).  Split, each program
        # peaks while the other's temps are dead; the extra dispatch costs
        # ~ms against a ~0.5 s iteration.

        def _apply_pc(r):
            if precond_win is not None:
                zw = precond_win(r[:, 0])
                return jnp.stack([zw, jnp.zeros_like(zw)], axis=1)
            return pv.pair_from_f32(op_win, precond_f32(
                pv.pair_hi_node(op_win, r)))

        def step_mv(x, r, p, rz):
            q = op_win.vmult_windowed(p)
            alpha = rz / _dot(p, q)
            x = _axpy(x, p, alpha)
            r = _axpy(r, q, -alpha)
            res = pv.pair_norm_f32(r, w)
            return x, r, res

        cache["step_mv"] = jax.jit(step_mv, donate_argnums=(0, 1))

        def step_pc(r, p, rz):
            z = _apply_pc(r)
            rz_new = _dot(r, z)
            p = _axpy(z, p, rz_new / rz)
            return p, rz_new

        cache["step_pc"] = jax.jit(step_pc, donate_argnums=(1,))

        def init(bb):
            bw = op_win.to_windowed(bb)
            norm0 = pv.pair_norm_f32(bw, w)
            return bw, norm0

        cache["init"] = jax.jit(init)

        def init_pc(bw):
            z = _apply_pc(bw)
            rz = _dot(bw, z)
            return z, rz

        cache["init_pc"] = jax.jit(init_pc)
        cache["final"] = jax.jit(op_win.from_windowed)
    bw, norm0 = cache["init"](b)
    z, rz = cache["init_pc"](bw)
    tol = max(abs_tol, rtol * float(norm0))
    x = jnp.zeros_like(bw)
    r = bw
    p = z
    it = 0
    res = float(norm0)
    while res > tol and it < max_iterations:
        x, r, res_d = cache["step_mv"](x, r, p, rz)
        p, rz = cache["step_pc"](r, p, rz)
        res = float(res_d)
        it += 1
    return CGResult(x=cache["final"](x), iterations=jnp.asarray(it),
                    initial_norm=norm0, final_norm=jnp.asarray(res))


def cg_solve_stepped(
    A: Callable,
    b: jnp.ndarray,
    precond: Callable,
    max_iterations: int = 1000,
    abs_tol: float = 1e-16,
    rtol: float = 1e-9,
    _jit_cache: Optional[dict] = None,
) -> CGResult:
    """Host-stepped PCG with donated carries — the flagship-size variant.

    ``lax.while_loop`` double-buffers its carry (old + new x, r, p live
    simultaneously: +3 dp vectors = +3.2 GB at 135M dofs), which pushes the
    V-cycle-preconditioned CG past 16 GB HBM.  Stepping the iteration from
    the host with ``donate_argnums`` lets XLA reuse the carry buffers in
    place; the per-iteration dispatch + scalar sync costs ~ms against
    multi-second iterations at this size."""
    cache = _jit_cache if _jit_cache is not None else {}
    if "step" not in cache:
        # stopping-criterion norms in f32 (1e-7 relative is ample against a
        # 1e-9 RELATIVE threshold); the CG coefficients rz/pq stay dp-grade
        # via the chunked dot_f64
        def _snorm(v):
            return jnp.linalg.norm(v.astype(jnp.float32)).astype(v.dtype)

        def step(x, r, p, rz):
            q = A(p)
            alpha = rz / _dot(p, q)
            x = x + alpha * p
            r = r - alpha * q
            res = _snorm(r)
            z = precond(r)
            rz_new = _dot(r, z)
            p = z + (rz_new / rz) * p
            return x, r, p, rz_new, res

        cache["step"] = jax.jit(step, donate_argnums=(0, 1, 2))
        cache["norm0"] = jax.jit(_snorm)
        cache["init"] = jax.jit(precond)
    norm0 = cache["norm0"](b)
    z = cache["init"](b)
    tol = max(abs_tol, rtol * float(norm0))
    x = jnp.zeros_like(b)
    r = b + 0.0   # private copy: the step donates r
    p = z
    rz = _dot(r, z)
    it = 0
    res = float(norm0)
    while res > tol and it < max_iterations:
        x, r, p, rz, res_d = cache["step"](x, r, p, rz)
        res = float(res_d)
        it += 1
    return CGResult(x=x, iterations=jnp.asarray(it),
                    initial_norm=norm0, final_norm=jnp.asarray(res))
