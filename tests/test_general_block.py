"""Block-padded general-path stack (mesh/mapped.BlockLayout,
ops/laplace_block, ops/transfer_block) vs the flat-layout oracles.

The bp layout exists because the gather/segment-sum general operators
are SCATTER-BOUND on TPU (docs/tpu_r4/general_gate.log: 0.005 GDoF/s dp
at 1.6M shell dofs); correctness here is CPU, speed is gated on hardware
by experiments/debug_general.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from experiments.poisson_shell import coef_fn, exact_fn, rhs_fn
from multigrid_tpu.mesh.mapped import GeneralGrid
from multigrid_tpu.mesh.shapes import hyper_shell, hyper_shell_12
from multigrid_tpu.ops.laplace_block import BlockGeneralMXU, BlockGeneralOzaki
from multigrid_tpu.ops.laplace_general import GeneralLaplace
from multigrid_tpu.ops.transfer_block import BlockTransfer, BlockTransferPair
from multigrid_tpu.ops.transfer_general import GeneralTransfer


@pytest.fixture(scope="module", params=["shell6", "shell12"])
def mesh(request):
    fn = hyper_shell if request.param == "shell6" else hyper_shell_12
    return fn(0.5, 1.0, n_levels=2)


def test_layout_roundtrip_and_seam_sum(mesh):
    g = GeneralGrid(mesh, 1, 3)
    L = g.block_layout()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(g.n_dofs))
    x = L.expand(u)
    assert np.allclose(np.asarray(L.collapse(x)), np.asarray(u))
    # seam_sum of a consistent vector multiplies each copy by its valence
    y = L.seam_sum(x)
    assert np.allclose(np.asarray(y) * L.weights, np.asarray(x))


@pytest.mark.parametrize("lvl", [0, 1])
def test_block_ops_match_f64(mesh, lvl):
    g = GeneralGrid(mesh, lvl, 3)
    L = g.block_layout()
    coef = g.merged_coefficient(coef_fn)
    op64 = GeneralLaplace(g, jnp.float64, coef=coef)
    boz = BlockGeneralOzaki(g, coef=coef)
    bmx = BlockGeneralMXU(g, jnp.float32, coef=coef)
    rng = np.random.default_rng(lvl)
    u = jnp.asarray(rng.standard_normal(g.n_dofs))
    x = L.expand(u)
    y_ref = np.asarray(op64.vmult(u))
    den = np.abs(y_ref).max()
    y_bp = np.asarray(jax.jit(boz.vmult)(x))
    # copies of shared dofs must agree AND match the flat oracle
    assert np.abs(y_bp - y_ref[L.inverse]).max() / den < 1e-12
    yb32 = np.asarray(jax.jit(bmx.vmult)(x.astype(jnp.float32)))
    assert np.abs(yb32 - y_ref[L.inverse]).max() / den < 2e-6
    # residual form
    r = L.expand(jnp.asarray(rng.standard_normal(g.n_dofs)))
    res_ref = np.asarray(op64.vmult_residual(
        jnp.asarray(L.collapse(r)), u))
    res_bp = np.asarray(jax.jit(boz.vmult_residual)(r, x))
    assert np.abs(res_bp - res_ref[L.inverse]).max() / (
        np.abs(res_ref).max()) < 1e-12
    # diagonals (f32 + pair)
    d_ref = np.asarray(GeneralLaplace(g, jnp.float32,
                                      coef=coef).inverse_diagonal())
    d32 = np.asarray(jax.jit(bmx.inverse_diagonal)())
    assert np.abs(d32 - d_ref[L.inverse]).max() / np.abs(d_ref).max() < 1e-5
    dpair = np.asarray(jax.jit(boz.inverse_diagonal)())
    assert np.abs(dpair - d_ref[L.inverse]).max() / np.abs(d_ref).max() < 1e-5


def test_block_rhs_and_l2(mesh):
    g = GeneralGrid(mesh, 1, 3)
    L = g.block_layout()
    coef = g.merged_coefficient(coef_fn)
    op64 = GeneralLaplace(g, jnp.float64, coef=coef)
    boz = BlockGeneralOzaki(g, coef=coef)
    rng = np.random.default_rng(3)
    fq = np.ones(g.jxw.shape)
    ubc_flat = jnp.asarray(np.where(g.boundary, 1.25, 0.0))
    shape = (g.n_cells,) + (g.n,) * 3
    b_ref = np.asarray(op64.compute_rhs(jnp.asarray(fq.reshape(shape)),
                                        ubc_flat))
    b_bp = np.asarray(boz.compute_rhs_pair(fq * g.jxw, L.expand(ubc_flat)))
    assert np.abs(b_bp - b_ref[L.inverse]).max() / np.abs(b_ref).max() < 1e-12
    eq = np.cos(g.quad_coords[..., 0]).reshape(shape)
    u = jnp.asarray(rng.standard_normal(g.n_dofs))
    e_ref = float(op64.l2_error(u, jnp.asarray(eq)))
    e_bp = float(jax.jit(boz.l2_error)(L.expand(u), jnp.asarray(eq)))
    assert abs(e_ref - e_bp) / e_ref < 1e-6


@pytest.mark.parametrize("constrained", [True, False])
def test_block_transfers_match_flat(mesh, constrained):
    fine = GeneralGrid(mesh, 1, 3)
    coarse = GeneralGrid(mesh, 0, 3)
    Lf, Lc = fine.block_layout(), coarse.block_layout()
    t64 = GeneralTransfer(fine, coarse, jnp.float64, constrained)
    bt = BlockTransfer(fine, coarse, jnp.float64, constrained)
    btp = BlockTransferPair(fine, coarse, constrained)
    rng = np.random.default_rng(7)
    uc = jnp.asarray(rng.standard_normal(coarse.n_dofs))
    uf = jnp.asarray(rng.standard_normal(fine.n_dofs))
    p_ref = np.asarray(t64.prolongate(uc))
    den = np.abs(p_ref).max()
    for tr, tol in ((bt, 1e-13), (btp, 1e-12)):
        p = np.asarray(Lf.collapse(jnp.asarray(
            jax.jit(tr.prolongate)(Lc.expand(uc)))))
        assert np.abs(p - p_ref).max() / den < tol
    r_ref = np.asarray(t64.restrict(uf))
    rden = np.abs(r_ref).max()
    for tr, tol in ((bt, 1e-13), (btp, 1e-12)):
        r = np.asarray(Lc.collapse(jnp.asarray(
            jax.jit(tr.restrict)(Lf.expand(uf)))))
        assert np.abs(r - r_ref).max() / rden < tol


def test_block_solver_matches_flat():
    """Same CG iteration counts and L2 errors as the flat-layout solver
    (mixed precision; pure-double covered by the dedicated run below)."""
    from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

    mesh = hyper_shell(0.5, 1.0, n_levels=2)
    kw = dict(n_pre=3, n_post=3, n_cycles=1, dp_df64=True, use_mxu=True)
    a = GeneralMultigridSolver(mesh, 3, exact_fn, rhs_fn, coef_fn=coef_fn,
                               block_mode=False, **kw)
    b = GeneralMultigridSolver(mesh, 3, exact_fn, rhs_fn, coef_fn=coef_fn,
                               block_mode=True, **kw)
    ea = a.l2_error(a.maxlevel, a.solve())
    eb = b.l2_error(b.maxlevel, b.solve())
    assert abs(ea - eb) / ea < 1e-5
    xa, ita, reda = a.solve_cg()
    xb, itb, redb = b.solve_cg()
    assert ita == itb
    assert abs(reda - redb) < 0.02
    assert abs(a.l2_error(a.maxlevel, xa)
               - b.l2_error(b.maxlevel, xb)) / a.l2_error(a.maxlevel, xa) < 1e-6


def test_block_solver_pure_double():
    from multigrid_tpu.solvers.chebyshev import FOURTH_KIND
    from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

    mesh = hyper_shell(0.5, 1.0, n_levels=2)
    kw = dict(n_pre=3, n_post=3, n_cycles=1, dp_df64=True, use_mxu=True,
              pure_double=True, chebyshev_kind=FOURTH_KIND)
    a = GeneralMultigridSolver(mesh, 3, exact_fn, rhs_fn, coef_fn=coef_fn,
                               block_mode=False, **kw)
    b = GeneralMultigridSolver(mesh, 3, exact_fn, rhs_fn, coef_fn=coef_fn,
                               block_mode=True, **kw)
    xa, ita, _ = a.solve_cg()
    xb, itb, _ = b.solve_cg()
    assert ita == itb
    assert abs(a.l2_error(a.maxlevel, xa)
               - b.l2_error(b.maxlevel, xb)) / a.l2_error(a.maxlevel, xa) < 1e-6


def test_block_solver_padded_matches_unpadded():
    """bp_pad (shardability tail) must not change any iterate: pad
    positions are interior=False, weight-0, value-0 throughout."""
    from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver

    kw = dict(n_pre=3, n_post=3, n_cycles=1, dp_df64=True, use_mxu=True,
              block_mode=True)
    a = GeneralMultigridSolver(hyper_shell(0.5, 1.0, n_levels=2), 3,
                               exact_fn, rhs_fn, coef_fn=coef_fn,
                               bp_pad=1, **kw)
    b = GeneralMultigridSolver(hyper_shell(0.5, 1.0, n_levels=2), 3,
                               exact_fn, rhs_fn, coef_fn=coef_fn,
                               bp_pad=1024, **kw)
    assert b.layouts[1].M_pad % 1024 == 0 and b.layouts[1].M_pad > b.layouts[1].M
    xa, ita, _ = a.solve_cg()
    xb, itb, _ = b.solve_cg()
    assert ita == itb
    assert abs(a.l2_error(1, xa) - b.l2_error(1, xb)) < 1e-12
