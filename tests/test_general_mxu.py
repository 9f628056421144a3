"""MXU-native general-geometry operators (ops/laplace_general_mxu).

Accuracy oracle is the native-f64 GeneralLaplace (exact on CPU).  The
wide-dynamic-range OzakiMatmul case guards the exp2-inexactness class:
XLA:CPU's f32 exp2(21.0) = 2097153.0 (NOT a power of two) silently cost
the per-row scaling 24 bits until pow2_ceil_f32 replaced it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multigrid_tpu.mesh.mapped import GeneralGrid
from multigrid_tpu.mesh.shapes import hyper_shell
from multigrid_tpu.ops.df64 import split_f64
from multigrid_tpu.ops.laplace_general import GeneralLaplace
from multigrid_tpu.ops.laplace_general_mxu import (GeneralLaplaceMXU,
                                                   GeneralLaplaceOzaki,
                                                   OzakiMatmul,
                                                   build_grad_matrices,
                                                   pow2_ceil_f32)


def coef_fn(coords):
    prod = 1.0
    for e, c in enumerate(coords):
        prod = prod * np.cos(2 * np.pi * c + 0.1 * e) ** 2
    return 1.0 + 1.0e6 * prod


@pytest.fixture(scope="module")
def shell_ops():
    mesh = hyper_shell(0.5, 1.0, n_levels=2)
    out = []
    for lvl in (0, 1):
        g = GeneralGrid(mesh, lvl, 3)
        coef = g.merged_coefficient(coef_fn)
        out.append((g, coef,
                    GeneralLaplace(g, jnp.float64, coef=coef),
                    GeneralLaplaceMXU(g, jnp.float32, coef=coef),
                    GeneralLaplaceOzaki(g, coef=coef)))
    return out


def test_pow2_ceil_exact():
    vals = np.array([1187221.4, 1.0, 2.0, 3.0, 0.75, 2097152.0, 1e-20,
                     6.5e7, 1e30], np.float32)
    got = np.asarray(jax.jit(pow2_ceil_f32)(jnp.asarray(vals)), np.float64)
    for v, p in zip(vals.astype(np.float64), got):
        assert p >= v and p / 2 < v
        m, _ = np.frexp(p)
        assert m == 0.5, (v, p)  # exactly a power of two


def test_ozaki_matmul_wide_dynamic_range():
    mesh = hyper_shell(0.5, 1.0, n_levels=2)
    G = build_grad_matrices(GeneralGrid(mesh, 0, 3).basis, 3)[0]
    oz = OzakiMatmul(G)
    rng = np.random.default_rng(0)
    t = rng.standard_normal((100, 64)) * 10.0 ** rng.uniform(-6, 6, (100, 64))
    th, tl = split_f64(jnp.asarray(t))
    yh, yl = jax.jit(oz.apply)(th, tl)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    ref = t @ G
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-12


def test_ozaki_matmul_rejects_unsafe_contraction():
    with pytest.raises(ValueError):
        OzakiMatmul(np.eye(2048))


@pytest.mark.parametrize("lvl", [0, 1])
def test_vmult_matches_f64(shell_ops, lvl):
    g, coef, op64, mxu, oz = shell_ops[lvl]
    rng = np.random.default_rng(lvl)
    x = jnp.asarray(rng.standard_normal(g.n_dofs))
    y64 = np.asarray(op64.vmult(x))
    den = np.max(np.abs(y64))
    y_oz = np.asarray(jax.jit(oz.vmult)(x))
    assert np.max(np.abs(y_oz - y64)) / den < 1e-12
    # traced-pair coefficient (the solve-path pytree form)
    y_ozC = np.asarray(jax.jit(lambda xx, Cp: oz.vmult(xx, C=Cp))(x, oz.C))
    assert np.max(np.abs(y_ozC - y64)) / den < 1e-12
    y_sp = np.asarray(jax.jit(mxu.vmult)(x.astype(jnp.float32)))
    assert np.max(np.abs(y_sp - y64)) / den < 2e-6
    # f32 form must track the plain-f32 oracle closely, not just f64
    op32 = GeneralLaplace(g, jnp.float32, coef=coef)
    y_32 = np.asarray(jax.jit(op32.vmult)(x.astype(jnp.float32)))
    assert np.max(np.abs(y_sp - y_32)) / den < 2e-6


@pytest.mark.parametrize("lvl", [0, 1])
def test_vmult_residual_matches_f64(shell_ops, lvl):
    g, coef, op64, mxu, oz = shell_ops[lvl]
    rng = np.random.default_rng(10 + lvl)
    x = jnp.asarray(rng.standard_normal(g.n_dofs))
    r = jnp.asarray(rng.standard_normal(g.n_dofs))
    ref = np.asarray(op64.vmult_residual(r, x))
    den = np.max(np.abs(ref))
    got = np.asarray(jax.jit(
        lambda rr, xx, Cp: oz.vmult_residual(rr, xx, C=Cp))(r, x, oz.C))
    assert np.max(np.abs(ref - got)) / den < 1e-12


def test_solver_mxu_matches_plain():
    """GeneralMultigridSolver(use_mxu=True) reproduces use_mxu=False:
    same CG iteration count, solutions to dp tolerance."""
    from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

    def exact_fn(coords):
        return np.sin(2 * np.pi * (coords[0] + coords[1]))

    def rhs_fn(coords):
        return 8 * np.pi ** 2 * exact_fn(coords)

    mesh = hyper_shell(0.5, 1.0, n_levels=2)
    kw = dict(n_pre=3, n_post=3, n_cycles=1, dp_df64=True)
    a = GeneralMultigridSolver(mesh, 2, exact_fn, rhs_fn, coef_fn=coef_fn,
                               use_mxu=False, **kw)
    b = GeneralMultigridSolver(mesh, 2, exact_fn, rhs_fn, coef_fn=coef_fn,
                               use_mxu=True, **kw)
    sol_a = np.asarray(a.solve())
    sol_b = np.asarray(b.solve())
    den = np.max(np.abs(sol_a))
    # the two paths differ in f32 smoother rounding, so FMG solutions
    # agree only to V-cycle (f32) accuracy; CG below is the dp check
    assert np.max(np.abs(sol_a - sol_b)) / den < 1e-5
    xa, ita, _ = a.solve_cg()
    xb, itb, _ = b.solve_cg()
    assert ita == itb
    assert np.max(np.abs(np.asarray(xa) - np.asarray(xb))) / max(
        np.max(np.abs(np.asarray(xa))), 1e-30) < 1e-7
