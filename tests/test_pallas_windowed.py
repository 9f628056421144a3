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
