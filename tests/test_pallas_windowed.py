"""Windowed-pair fused dp matvec (interpret mode) vs DenseLaplaceOzaki.

Both paths use the identical limb scheme, so interior values must agree to
df64 roundoff; the windowed layout roundtrip must be exact.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace_dense import DenseLaplaceOzaki
from multigrid_tpu.ops.pallas_windowed import PallasWindowedOzaki


def make_grid(cells):
    mesh = BrickMesh(coarse_cells=cells, origin=(-0.9,) * 3,
                     lengths=(1.9, 1.3, 1.1), n_levels=1)
    return DofGrid(mesh, 0, 4)


@pytest.mark.parametrize("cells,cy_chunk", [((3, 4, 4), 4),
                                            ((4, 8, 4), 4),   # nyc=2: carry
                                            ((2, 6, 8), 2)])  # nyc=3
def test_windowed_matches_ozaki(cells, cy_chunk):
    grid = make_grid(cells)
    ref = DenseLaplaceOzaki(grid)
    op = PallasWindowedOzaki(grid, cy_chunk=cy_chunk, interpret=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    y_ref = np.asarray(ref.vmult(x))
    y = np.asarray(op.vmult(x))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=1e-13 * scale)


def test_windowed_roundtrip():
    """f64 -> pair -> f64 reconstructs to df64 precision (~2^-49; the lo
    component is the f32-rounded f64 remainder, not exact)."""
    grid = make_grid((2, 3, 4))
    op = PallasWindowedOzaki(grid, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape))
    back = np.asarray(op.from_windowed(op.to_windowed(x)))
    np.testing.assert_allclose(back, np.asarray(x), rtol=0, atol=4e-15)


def test_pair_perm_conversions_match_reshape():
    """The MXU permutation-matmul pair relayout (hardware path) must be
    bit-identical to the reshape path (exact 3-limb bf16 split per f32
    component; see ops/pallas_windowed_sp.perm_mm)."""
    grid = make_grid((2, 3, 4))
    op = PallasWindowedOzaki(grid, interpret=True)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(grid.shape))
    w_ref = np.asarray(op.to_windowed(x))
    b_ref = np.asarray(op.from_windowed(jnp.asarray(w_ref)))
    op.interpret = False          # conversions only; the kernel stays off
    try:
        w_mm = np.asarray(op.to_windowed(x))
        b_mm = np.asarray(op.from_windowed(jnp.asarray(w_ref)))
    finally:
        op.interpret = True
    np.testing.assert_array_equal(w_mm, w_ref)
    np.testing.assert_array_equal(b_mm, b_ref)


def test_windowed_duplicate_consistency():
    """The kernel's j=p output block must duplicate j=0 shifted by a cell."""
    grid = make_grid((2, 4, 4))
    op = PallasWindowedOzaki(grid, cy_chunk=2, interpret=True)
    x = jnp.where(op.interior,
                  jnp.asarray(np.random.default_rng(2).standard_normal(
                      grid.shape)), 0)
    yw = np.asarray(op.vmult_windowed(op.to_windowed(x)))
    cx, p = op.cx, op.p
    j0 = yw[:, :, :, 0 * cx : 1 * cx]
    jp = yw[:, :, :, p * cx : (p + 1) * cx]
    np.testing.assert_allclose(jp[..., : cx - 1], j0[..., 1:], atol=0)


def test_pair_cg_matches_node_grid_cg():
    """Full solver with the windowed hybrid dp operator (interpret mode):
    the pair-native stepped CG must reproduce the node-grid CG's iteration
    count and solution to dp accuracy."""
    from experiments.poisson_cube import build_solver
    from multigrid_tpu.mesh.brick import poisson_cube_mesh

    mesh = poisson_cube_mesh(4)
    ref = build_solver(mesh, 4, dp_impl="ozaki")
    sol_ref, its_ref, red_ref = ref.solve_cg()
    s = build_solver(mesh, 4, dp_impl="pallas_windowed")
    assert getattr(s.dp_ops[s.maxlevel], "win", None) is not None
    sol, its, red = s.solve_cg()
    assert its == its_ref
    assert red == pytest.approx(red_ref, rel=1e-5)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref),
                               atol=1e-12)


def test_pairvec_axpy_dot():
    """df64 pair axpy/dot against numpy float64 references."""
    from multigrid_tpu.ops import pairvec as pv

    grid = make_grid((2, 3, 4))
    op = PallasWindowedOzaki(grid, interpret=True)
    rng = np.random.default_rng(7)
    a64 = np.where(np.asarray(op.interior),
                   rng.standard_normal(grid.shape), 0.0)
    b64 = np.where(np.asarray(op.interior),
                   rng.standard_normal(grid.shape), 0.0)
    aw = op.to_windowed(jnp.asarray(a64))
    bw = op.to_windowed(jnp.asarray(b64))
    w = op.dup_weights()
    alpha = 0.7234912384001122
    got = np.asarray(op.from_windowed(pv.pair_axpy(aw, bw, alpha)))
    # df64 accuracy class (~2^-46 of O(1) values), not native f64
    np.testing.assert_allclose(got, a64 + alpha * b64, rtol=0, atol=5e-14)
    d = float(pv.pair_dot(aw, bw, w))
    # same accuracy class as ops/df64.dot_f64 (which the node-grid CG
    # uses): ~1e-7 relative to sum(|a_i b_i|), from the chunked f32
    # partial sums
    assert d == pytest.approx(float((a64 * b64).sum()),
                              abs=1e-6 * float(np.abs(a64 * b64).sum()))
    from multigrid_tpu.ops.df64 import dot_f64
    d_ref = float(dot_f64(jnp.asarray(a64).reshape(-1),
                          jnp.asarray(b64).reshape(-1)))
    assert d == pytest.approx(d_ref,
                              abs=1e-6 * float(np.abs(a64 * b64).sum()))
    # hi/f32 node extraction + reinjection roundtrip
    z32 = np.asarray(pv.pair_hi_node(op, aw))
    np.testing.assert_allclose(z32, a64.astype(np.float32), rtol=0, atol=0)
    zw = pv.pair_from_f32(op, jnp.asarray(z32))
    np.testing.assert_allclose(np.asarray(op.from_windowed(zw)),
                               a64.astype(np.float32).astype(np.float64),
                               rtol=0, atol=0)


def test_windowed_dup_weights_dot():
    """Weighted windowed dot equals the node-grid dot for interior vectors."""
    grid = make_grid((2, 3, 4))
    op = PallasWindowedOzaki(grid, interpret=True)
    rng = np.random.default_rng(3)
    a = jnp.where(op.interior, jnp.asarray(rng.standard_normal(grid.shape)), 0)
    b = jnp.where(op.interior, jnp.asarray(rng.standard_normal(grid.shape)), 0)
    wa = op.to_windowed(a)
    wb = op.to_windowed(b)
    w = np.asarray(op.dup_weights())
    prod = ((np.asarray(wa[:, 0]).astype(np.float64) + np.asarray(wa[:, 1]))
            * (np.asarray(wb[:, 0]).astype(np.float64) + np.asarray(wb[:, 1])))
    got = (prod * w[None, None, :]).sum()
    want = float(jnp.vdot(a, b))
    assert got == pytest.approx(want, rel=1e-12)


