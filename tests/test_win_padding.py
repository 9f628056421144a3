"""Zero-padded window geometry (cxp > cx) for the fused Mosaic kernels.

On hardware the kernels need the x-window count to be a multiple of the
128 lane tile; other grids run on a zero-padded geometry (pad cells carry
zeros end to end, the in-kernel node-id mask zeroes the one lane where a
real value leaks into the pad region).  These interpret-mode tests pin
the padded path against the unpadded oracles at small sizes; the
hardware bit-exactness companion is experiments/debug_dpwin.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace import LaplaceOperator, make_diag_coef
from multigrid_tpu.ops.laplace_dense import DenseLaplaceF32, DenseLaplaceOzaki
from multigrid_tpu.ops.pallas_windowed import PallasWindowedOzaki
from multigrid_tpu.ops.pallas_windowed_sp import (
    PallasWindowedSP, windowed_inv_diag_factory)


def make_grid(cells):
    mesh = BrickMesh(coarse_cells=cells, origin=(-0.9,) * 3,
                     lengths=(1.9, 1.3, 1.1), n_levels=1)
    return DofGrid(mesh, 0, 4)


@pytest.mark.parametrize("cells,pad_to", [((2, 3, 5), 8),
                                          ((3, 2, 6), 8),
                                          ((2, 4, 3), 8)])
def test_padded_dp_matches_ozaki(cells, pad_to):
    grid = make_grid(cells)
    ref = DenseLaplaceOzaki(grid)
    op = PallasWindowedOzaki(grid, interpret=True, pad_to=pad_to)
    assert op.cxp == pad_to and op.G == 5 * pad_to
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    x = jnp.where(jnp.asarray(~np.asarray(grid.boundary_mask())), x, 0.0)
    y_ref = np.asarray(ref.vmult(x))
    y = np.asarray(op.vmult(x))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=1e-13 * scale)


def test_padded_dp_roundtrip_general_input():
    """to/from_windowed on the padded geometry reconstructs ARBITRARY
    node grids (incl. nonzero boundaries) to df64 precision."""
    grid = make_grid((2, 3, 5))
    op = PallasWindowedOzaki(grid, interpret=True, pad_to=8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape))
    back = np.asarray(op.from_windowed(op.to_windowed(x)))
    np.testing.assert_allclose(back, np.asarray(x), rtol=0, atol=4e-15)


def test_padded_dp_output_pads_zero():
    """Kernel outputs must be identically zero on every pad slot (the
    node-id mask); otherwise pads pollute windowed dot products."""
    grid = make_grid((2, 3, 5))
    op = PallasWindowedOzaki(grid, interpret=True, pad_to=8)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(grid.shape))
    x = jnp.where(op.interior, x, 0.0)
    yw = np.asarray(op.vmult_windowed(op.to_windowed(x)))
    p, cxp, cx, X = op.p, op.cxp, op.cx, op.X
    lane = np.arange(op.G)
    node = p * (lane % cxp) + lane // cxp
    pads = node >= X - 1
    assert np.all(yw[:, :, :, pads] == 0.0)


@pytest.mark.parametrize("cells,pad_to,cy_chunk", [((2, 3, 5), 8, 3),
                                                   ((3, 4, 6), 8, 2)])
def test_padded_sp_matches_dense(cells, pad_to, cy_chunk):
    grid = make_grid(cells)
    ref = DenseLaplaceF32(grid)
    op = PallasWindowedSP(grid, cy_chunk=cy_chunk, interpret=True,
                          pad_to=pad_to)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(grid.shape),
                    jnp.float32)
    y_ref = np.asarray(ref.vmult(x))
    y = np.asarray(op.vmult(x))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=2e-6 * scale)


def test_padded_sp_fused_cheb_matches_generic():
    """FusedChebyshev on the padded geometry == the generic recurrence;
    pad slots stay zero through the iteration (finite padded diagonal)."""
    from multigrid_tpu.ops.pallas_windowed_sp import FusedChebyshev
    from multigrid_tpu.solvers.chebyshev import Chebyshev

    grid = make_grid((2, 4, 5))
    opw = PallasWindowedSP(grid, cy_chunk=2, interpret=True, pad_to=8)
    lap = LaplaceOperator(grid, jnp.float32, make_diag_coef(grid))
    opw.install_diag_factors(lap)
    inv = windowed_inv_diag_factory(opw, lap)
    assert np.all(np.isfinite(np.asarray(inv())))
    theta, delta, deg = 1.7, 1.3, 3
    gen = Chebyshev(vmult_op=opw.vmult_windowed,
                    precond=lambda r: inv() * r,
                    theta=theta, delta=delta, degree=deg,
                    max_eig=1.0, min_eig=0.1)
    fus = FusedChebyshev(opw, inv, theta, delta, deg, 1.0, 0.1)
    rng = np.random.default_rng(5)
    b = opw.to_windowed(jnp.where(
        opw.interior, jnp.asarray(rng.standard_normal(grid.shape),
                                  jnp.float32), 0))
    got = np.asarray(fus.vmult(b))
    want = np.asarray(gen.vmult(b))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-6 * scale)
    lane = np.arange(opw.G)
    node = opw.p * (lane % opw.cxp) + lane // opw.cxp
    assert np.all(got[:, :, node >= opw.X - 1] == 0.0)


def test_padded_pair_cg_matches_node_cg():
    """Pair-native stepped CG on the padded dp geometry reproduces the
    plain CG solution (windowed dots see only zero pads)."""
    from multigrid_tpu.solvers.cg import cg_solve, cg_solve_stepped_pair

    grid = make_grid((2, 3, 5))
    ref = DenseLaplaceOzaki(grid)
    op = PallasWindowedOzaki(grid, interpret=True, pad_to=8)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(grid.shape))
    b = jnp.where(jnp.asarray(~np.asarray(grid.boundary_mask())), b, 0.0)
    # node-SHAPED preconditioner: multiplies by a [Z, Y, X] array, so a
    # pair_hi_node/pair_from_f32 that leaks the padded X extent crashes
    inv_diag = jnp.asarray(LaplaceOperator(
        grid, jnp.float64, make_diag_coef(grid)).inverse_diagonal())
    res_ref = cg_solve(ref.vmult, b,
                       precond=lambda r: r * inv_diag.astype(r.dtype),
                       max_iterations=200, rtol=1e-10)
    res = cg_solve_stepped_pair(
        op, b, precond_f32=lambda r: r * inv_diag.astype(r.dtype),
        max_iterations=200, rtol=1e-10)
    assert abs(int(res.iterations) - int(res_ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_ref.x),
                               atol=1e-9 * float(jnp.abs(res_ref.x).max()))


def test_win_cx_ok_gating():
    from multigrid_tpu.solvers.multigrid import _win_cx_ok

    assert _win_cx_ok(128) and _win_cx_ok(256)
    assert _win_cx_ok(80) and _win_cx_ok(96) and _win_cx_ok(112)
    assert _win_cx_ok(64)        # pad ratio exactly 2.0 = the default cap
    assert not _win_cx_ok(40)    # 3.2x pad waste
    import os

    os.environ["MGT_WIN_PAD"] = "0"
    try:
        assert not _win_cx_ok(96)
        assert _win_cx_ok(128)
    finally:
        del os.environ["MGT_WIN_PAD"]
    os.environ["MGT_WIN_PAD"] = "1.6"
    try:
        assert _win_cx_ok(96) and not _win_cx_ok(64)
    finally:
        del os.environ["MGT_WIN_PAD"]


def test_pair_cg_pad_gate(monkeypatch):
    """MGT_PAIR_CG_PAD: the pair-native CG path is skipped when the
    window pad ratio exceeds the cap (hardware evidence: pad waste taxes
    every CG matvec/axpy/dot — docs/tpu_r3/ladder_mid_pad.log), and the
    node-grid CG fallback still solves correctly."""
    from experiments.poisson_cube import exact_fn, rhs_fn
    from multigrid_tpu.solvers import cg as cg_mod
    from multigrid_tpu.solvers.multigrid import MultigridSolver

    mesh = BrickMesh(coarse_cells=(2, 2, 3), origin=(0.0,) * 3,
                     lengths=(1.0,) * 3, n_levels=2)
    solver = MultigridSolver(mesh, degree=4, exact_fn=exact_fn,
                             rhs_fn=rhs_fn, n_pre=2, n_post=2,
                             dp_impl="pallas_windowed")
    w = solver.dp_ops[solver.maxlevel].win
    cx = solver.grids[solver.maxlevel].cells[2]
    # pretend we are on hardware with a padded geometry (interpret mode
    # is exempt from the gate; the gate reads only cxp and interpret)
    monkeypatch.setattr(w, "cxp", 8)
    assert w.cxp / cx > 1.25
    monkeypatch.setattr(w, "interpret", False)

    def _boom(*a, **k):
        raise AssertionError("pair CG path taken despite pad gate")

    monkeypatch.setattr(cg_mod, "cg_solve_stepped_pair", _boom)
    sol, its, red = solver.solve_cg(rtol=1e-9)
    err = float(solver.l2_error(solver.maxlevel, sol))
    assert its in (7, 8, 9) and err < 1e-2, (its, err)
    # cap override re-admits the pair path (sentinel must then trip)
    monkeypatch.setenv("MGT_PAIR_CG_PAD", "99")
    with pytest.raises(AssertionError, match="pair CG path"):
        solver.solve_cg(rtol=1e-9)
