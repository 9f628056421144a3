"""Explicit shard_map halo-exchange operator vs the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiments.poisson_cube import exact_fn, rhs_fn
from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.parallel.halo import HaloLaplace
from multigrid_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def setup():
    mesh_geo = BrickMesh(coarse_cells=(8, 3, 3), origin=(-0.9,) * 3,
                         lengths=(1.9,) * 3, n_levels=2)
    grid = DofGrid(mesh_geo, 1, 2)
    op = LaplaceOperator(grid, jnp.float64)
    dmesh = make_mesh(8, ("z",))
    return op, HaloLaplace(op, dmesh)


def test_halo_vmult_matches(setup):
    op, halo = setup
    x = jnp.asarray(np.random.default_rng(0).standard_normal(op.grid.shape))
    y_ref = np.asarray(op.vmult(x))
    vmult, masks = halo.vmult_distributed()
    xd = halo.distribute(x)
    yd = vmult(xd, masks)
    y = np.asarray(halo.collect(yd))
    assert np.allclose(y, y_ref, atol=1e-12)
    # ghosted consistency: duplicated planes agree after the exchange
    ydn = np.asarray(yd)
    for d in range(1, halo.nd):
        assert np.allclose(ydn[d][0], ydn[d - 1][-1], atol=1e-13)


def test_halo_dot_matches(setup):
    op, halo = setup
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(op.grid.shape))
    b = jnp.asarray(rng.standard_normal(op.grid.shape))
    dot = halo.dot_distributed()
    got = float(np.asarray(dot(halo.distribute(a), halo.distribute(b)))[0])
    assert got == pytest.approx(float(jnp.vdot(a, b)), rel=1e-12)


def test_halo_cg_end_to_end(setup):
    """Several CG iterations run entirely in the distributed layout (halo
    vmult + ownership-masked dots) match the single-device CG."""
    op, halo = setup
    vmult, masks = halo.vmult_distributed()
    dot = halo.dot_distributed()
    b = jnp.asarray(np.random.default_rng(2).standard_normal(op.grid.shape))
    b = jnp.where(op.interior, b, 0)

    def dist_dot(a, c):
        return jnp.asarray(dot(a, c))[0]

    # distributed CG (5 iterations)
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

    # reference CG
    x = jnp.zeros_like(b)
    r = b
    p = r
    rz = jnp.vdot(r, r)
    for _ in range(5):
        q = op.vmult(p)
        alpha = rz / jnp.vdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        rz2 = jnp.vdot(r, r)
        p = r + (rz2 / rz) * p
        rz = rz2
    assert np.allclose(x_dist, np.asarray(x), atol=1e-10)


def test_halo_comm_split_report(setup):
    """Comm-vs-cell-loop telemetry (laplace_operator_dg.h:766-768): both
    variants compile and the report is consistent."""
    op, halo = setup
    rep = halo.comm_split_report(n_rep=3)
    assert rep["total"] > 0 and rep["cell_loop"] > 0
    assert 0.0 <= rep["comm_fraction"] < 1.0
    # the zero-traffic variant must still compute the interior correctly
    x = jnp.asarray(np.random.default_rng(1).standard_normal(op.grid.shape))
    y_ref = np.asarray(op.vmult(x))
    vmult_nc, masks = halo.vmult_distributed(comm=False)
    y = np.asarray(halo.collect(vmult_nc(halo.distribute(x), masks)))
    # away from slab interfaces (2p+1 planes around each cut) values match
    p = op.grid.degree
    interior_rows = [
        z for z in range(op.grid.shape[0])
        if all(abs(z - c * halo.loc_cells * p) > p
               for c in range(halo.nd + 1))
    ]
    np.testing.assert_allclose(y[interior_rows], y_ref[interior_rows],
                               rtol=1e-10, atol=1e-12)
