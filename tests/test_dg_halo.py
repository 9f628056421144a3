"""Distributed DG operator with compressed trace ghost exchange vs the
single-device fused operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.parallel.dg_halo import HaloDGLaplace
from multigrid_tpu.parallel.sharding import make_mesh


@pytest.mark.parametrize("kind", ["gauss", "hermite"])
def test_dg_halo_matches(kind):
    assert len(jax.devices()) >= 8
    cells = (16, 4, 4)
    J = np.diag([1.0 / c for c in cells])
    grid = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=3, kind=kind)
    op = DGLaplace(grid, jnp.float64)
    mesh = make_mesh(8, ("z",))
    halo = HaloDGLaplace(op, mesh)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(grid.shape))
    y_ref = np.asarray(op.apply(x))
    vmult = halo.vmult_distributed()
    y = np.asarray(vmult(halo.distribute(x)))
    assert np.allclose(y, y_ref, atol=1e-11)


@pytest.mark.parametrize("kind", ["gauss", "hermite"])
def test_dg_halo_2d_matches(kind):
    """('z','y')-decomposed fused DG operator on the 4x2 device grid must
    match the single-device apply (two independent trace exchanges; DG
    has no corner coupling)."""
    from multigrid_tpu.parallel.dg_halo import HaloDGLaplace2D

    assert len(jax.devices()) >= 8
    cells = (8, 4, 4)
    J = np.diag([1.0 / c for c in cells])
    grid = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=3, kind=kind)
    op = DGLaplace(grid, jnp.float64)
    mesh = make_mesh(8, ("z", "y"))
    halo = HaloDGLaplace2D(op, mesh)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(grid.shape))
    y_ref = np.asarray(op.apply(x))
    vmult = halo.vmult_distributed()
    y = np.asarray(vmult(halo.distribute(x)))
    assert np.allclose(y, y_ref, atol=1e-11)
    # the compiled program must contain real neighbor collectives
    hlo = vmult.lower(halo.distribute(x)).compile().as_text()
    assert "collective-permute" in hlo
