"""Composed windowed-boundary V-cycle transfers (MGT_WIN_TRANSFER).

ops/transfer.WindowedMatmulTransfer folds the node<->x-window lane
relayout (a permutation matmul) into MatmulTransfer's banded x-axis
factor, so the windowed V-cycle body restricts/prolongates straight
from/to the fused kernel's persistent layout without a separate relayout
pass.  The composed factor entries are exactly a lane permutation of the
banded factor (placed in f64 on the host), so the unit tier pins the
composed ops against the separate-pass oracle to f32 summation-order
tolerance, on both unpadded (cxp == cx) and zero-padded window
geometries.  The solver tier checks the transcript anchors survive with
the knob on (cf. deal.II constrained MGTransferMatrixFree semantics,
/root/reference/common/multigrid_solver.h:208-222).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid, poisson_cube_mesh
from multigrid_tpu.ops.pallas_windowed_sp import PallasWindowedSP
from multigrid_tpu.ops.transfer import MatmulTransfer, WindowedMatmulTransfer


def two_level_grids(cells):
    mesh = BrickMesh(coarse_cells=cells, origin=(-0.9,) * 3,
                     lengths=(1.9, 1.3, 1.1), n_levels=2)
    return DofGrid(mesh, 0, 4), DofGrid(mesh, 1, 4)


@pytest.mark.parametrize("cells,pad_to", [((2, 3, 2), None),
                                          ((2, 3, 2), 8),
                                          ((3, 2, 3), 8)])
def test_composed_matches_separate(cells, pad_to):
    coarse, fine = two_level_grids(cells)
    base = MatmulTransfer(fine, coarse, jnp.float32, constrained=True)
    opw = PallasWindowedSP(fine, interpret=True, pad_to=pad_to)
    wt = WindowedMatmulTransfer(base, opw)
    rng = np.random.default_rng(0)

    # restrict: windowed fine residual -> coarse node grid.  The windowed
    # input must be a CONSISTENT windowed vector (duplicate slots equal,
    # pads zero), as every in-solver producer guarantees.
    t_node = jnp.asarray(rng.standard_normal(fine.shape), jnp.float32)
    t_w = opw.to_windowed(t_node)
    ref = np.asarray(base.restrict(opw.from_windowed(t_w)))
    got = np.asarray(wt.restrict_win(t_w))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-6 * scale)

    # prolongate: coarse node grid -> windowed fine
    c = jnp.asarray(rng.standard_normal(coarse.shape), jnp.float32)
    ref_w = np.asarray(opw.to_windowed(base.prolongate(c)))
    got_w = np.asarray(wt.prolongate_win(c))
    scale = np.abs(ref_w).max()
    np.testing.assert_allclose(got_w, ref_w, atol=2e-6 * scale)


def test_solver_anchors_with_win_transfer(monkeypatch):
    """Transcript anchors (cg_its = 8, reduction ~6.7e-2, L2 error) hold
    with the composed transfers on: /root/reference/README.md:136-159."""
    monkeypatch.setenv("MGT_MATMUL_TRANSFER", "1")
    monkeypatch.setenv("MGT_WIN_TRANSFER", "1")
    from experiments.poisson_cube import build_solver

    s = build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2,
                     sp_impl="pallas_windowed")
    assert s._win_transfers, "composed transfers not installed"
    sol, its, red = s.solve_cg()
    assert its == 8
    assert abs(red - 6.7e-2) < 0.15 * 6.7e-2
    err = s.l2_error(s.maxlevel, sol)
    assert abs(err - 3.822e-4) < 0.02 * 3.822e-4
    sol_fmg = s.solve()
    err_fmg = s.l2_error(s.maxlevel, sol_fmg)
    assert abs(err_fmg - 4.065e-4) < 0.02 * 4.065e-4


@pytest.mark.parametrize("cells,pad_to", [((2, 3, 2), None),
                                          ((3, 2, 3), 8)])
def test_pair_prolongate_matches_node_path(cells, pad_to):
    """OzakiWindowedProlongate vs the node-path oracle: unconstrained dp
    prolongate -> interior mask -> to_windowed.  The composed factors are
    exact host-f64 permutations of the banded ones, so agreement is to
    pair-rounding (the oracle rounds through one f64 join the composed
    path skips)."""
    import jax

    from multigrid_tpu.ops.pallas_windowed import PallasWindowedOzaki
    from multigrid_tpu.ops.transfer import (OzakiMatmulTransfer,
                                            OzakiWindowedProlongate)

    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    coarse, fine = two_level_grids(cells)
    win = PallasWindowedOzaki(fine, interpret=True, pad_to=pad_to)
    base = OzakiMatmulTransfer(fine, coarse, jnp.float64, constrained=False)
    pro = OzakiWindowedProlongate(fine, coarse, win)
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.standard_normal(coarse.shape))

    ref_w = win.to_windowed(jnp.where(win.interior, base.prolongate(c), 0))
    got_w = np.asarray(pro.prolongate_win(c))
    ref = np.asarray(ref_w[:, 0], np.float64) + np.asarray(ref_w[:, 1],
                                                           np.float64)
    got = got_w[:, 0].astype(np.float64) + got_w[:, 1].astype(np.float64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=1e-13 * scale)
    # duplicate-slot consistency + exact pad zeros (vmult_windowed input
    # invariants)
    node = win.from_windowed_pair(jnp.asarray(got_w[:, 0]),
                                  jnp.asarray(got_w[:, 1]))
    rt = win.to_windowed(node)
    np.testing.assert_allclose(np.asarray(rt[:, 0]) + np.asarray(rt[:, 1]),
                               got, atol=1e-13 * scale)


def test_pair_fmg_prolongate_end_to_end(monkeypatch):
    """MGT_PAIR_FMG_PRO: the FMG solution rides the dp windowed pair
    layout through prolongate -> residual -> correction add; L2 anchor
    and agreement with the node path must hold."""
    monkeypatch.setenv("MGT_MATMUL_TRANSFER", "1")
    monkeypatch.setenv("MGT_WIN_TRANSFER", "1")
    monkeypatch.setenv("MGT_PAIR_FMG", "1")
    monkeypatch.setenv("MGT_PAIR_FMG_PRO", "1")
    from experiments.poisson_cube import build_solver

    s = build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2,
                     sp_impl="pallas_windowed", dp_impl="pallas_windowed")
    sol = s.solve()
    assert s._pro_win, "pair prolongation not installed"
    err = s.l2_error(s.maxlevel, sol)
    assert abs(err - 4.065e-4) < 0.02 * 4.065e-4
    monkeypatch.setenv("MGT_PAIR_FMG_PRO", "0")
    s2 = build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2,
                      sp_impl="pallas_windowed", dp_impl="pallas_windowed")
    sol2 = s2.solve()
    assert not s2._pro_win
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol2),
                               rtol=0, atol=2e-6 * float(np.abs(sol2).max()))


def test_pair_fmg_residual_handoff(monkeypatch):
    """MGT_PAIR_FMG: the dp FMG residual is emitted straight into the
    fused smoother's windowed layout (residual_defect_win) and the
    V-cycle runs its zero-relayout core; the FMG L2 error must stay at
    the transcript anchor (/root/reference/README.md:136-159)."""
    monkeypatch.setenv("MGT_MATMUL_TRANSFER", "1")
    monkeypatch.setenv("MGT_WIN_TRANSFER", "1")
    monkeypatch.setenv("MGT_PAIR_FMG", "1")
    from experiments.poisson_cube import build_solver

    s = build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2,
                     sp_impl="pallas_windowed", dp_impl="pallas_windowed")
    assert s._build_rhs_win(), "pair-FMG rhs not installed"
    sol = s.solve()
    err = s.l2_error(s.maxlevel, sol)
    assert abs(err - 4.065e-4) < 0.02 * 4.065e-4
    # the defect handoff must agree with the node path to f32 rounding
    s2 = build_solver(poisson_cube_mesh(8), degree=4, n_cycles=2,
                      sp_impl="pallas_windowed", dp_impl="pallas_windowed")
    monkeypatch.setenv("MGT_PAIR_FMG", "0")
    s2._rhs_win = None
    sol2 = s2.solve()
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol2),
                               rtol=0, atol=2e-6 * float(np.abs(sol2).max()))
