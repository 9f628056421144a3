"""Two-axis ('z','y') explicit shard_map halo operator vs single-device.

The 2-D rank-grid analogue of the reference's MPI partitioner exchange
(/root/reference/common/laplace_operator.h:568-590): corner partial sums
must route through the fixed z-then-y compress order and the reversed
ghost order, so a 4x2 device grid with interior corners is the minimal
adversarial configuration.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.parallel.halo import HaloLaplace2D
from multigrid_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def setup():
    mesh_geo = BrickMesh(coarse_cells=(4, 4, 3), origin=(-0.9,) * 3,
                         lengths=(1.9,) * 3, n_levels=2)
    grid = DofGrid(mesh_geo, 1, 2)
    op = LaplaceOperator(grid, jnp.float64)
    dmesh = make_mesh(8, ("z", "y"))   # 4x2 grid -> interior corners
    assert dmesh.shape["z"] > 1 and dmesh.shape["y"] > 1
    return op, HaloLaplace2D(op, dmesh)


def test_halo2d_vmult_matches(setup):
    op, halo = setup
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.grid.shape))
    y_ref = np.asarray(op.vmult(x))
    vmult, masks = halo.vmult_distributed()
    yd = vmult(halo.distribute(x), masks)
    y = np.asarray(halo.collect(yd))
    np.testing.assert_allclose(y, y_ref, atol=1e-12)
    # ghosted consistency: duplicated planes agree after the exchange
    ydn = np.asarray(yd)
    ndz, ndy = halo.nd
    for dz in range(ndz):
        for dy in range(ndy):
            if dz > 0:
                np.testing.assert_allclose(
                    ydn[dz, dy][0], ydn[dz - 1, dy][-1], atol=1e-13)
            if dy > 0:
                np.testing.assert_allclose(
                    ydn[dz, dy][:, 0], ydn[dz, dy - 1][:, -1], atol=1e-13)


def test_halo2d_dot_matches(setup):
    op, halo = setup
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(op.grid.shape))
    b = jnp.asarray(rng.standard_normal(op.grid.shape))
    dot = halo.dot_distributed()
    got = float(np.asarray(dot(halo.distribute(a), halo.distribute(b)))[0, 0])
    assert got == pytest.approx(float(jnp.vdot(a, b)), rel=1e-12)


def test_halo2d_cg_end_to_end(setup):
    """CG iterations run entirely in the 2-D-distributed layout (halo vmult
    + ownership-masked dots) match the single-device CG."""
    op, halo = setup
    vmult, masks = halo.vmult_distributed()
    dot = halo.dot_distributed()
    b = jnp.asarray(np.random.default_rng(2).standard_normal(op.grid.shape))
    b = jnp.where(op.interior, b, 0)

    def dist_dot(a, c):
        return float(np.asarray(dot(a, c))[0, 0])

    bd = halo.distribute(b)
    x = jnp.zeros_like(bd)
    r = bd
    p = r
    rz = dist_dot(r, r)
    for _ in range(5):
        q = vmult(p, masks)
        alpha = rz / dist_dot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        rz2 = dist_dot(r, r)
        p = r + (rz2 / rz) * p
        rz = rz2
    x_dist = np.asarray(halo.collect(x))

    xs = jnp.zeros_like(b)
    r = b
    p = r
    rz = float(jnp.vdot(r, r))
    for _ in range(5):
        q = op.vmult(p)
        alpha = rz / float(jnp.vdot(p, q))
        xs = xs + alpha * p
        r = r - alpha * q
        rz2 = float(jnp.vdot(r, r))
        p = r + (rz2 / rz) * p
        rz = rz2
    np.testing.assert_allclose(x_dist, np.asarray(xs), atol=1e-10)
