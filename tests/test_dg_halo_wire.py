"""Hermite coefficient-form ghost wire vs the evaluated-trace wire.

The coefficient form ships the two face-controlling Hermite coefficient
planes (the reference's FE_DGQHermite packing,
/root/reference/common/laplace_operator_dg.h:1017-1039); the receiver
evaluates the traces, including the tangential gradient components, which
never cross the wire.  Both wires must agree exactly (polynomial algebra,
f64) and the distributed operator must match the single-device apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.parallel.dg_halo import HaloDGLaplace, HaloDGLaplace2D
from multigrid_tpu.parallel.sharding import make_mesh

# sheared map: tangential gradient components contribute to every gvec
SHEAR = ((0.25, 0.03, 0.0), (0.02, 0.31, 0.04), (0.0, 0.05, 0.21))


def _op(kind, degree=3, cells=(8, 4, 4), dtype=jnp.float64):
    grid = DGGrid(cells=cells, jacobian=SHEAR, degree=degree, kind=kind)
    return DGLaplace(grid, dtype)


@pytest.mark.parametrize("kind", ["hermite", "gauss", "gll"])
@pytest.mark.parametrize("d", [0, 1, 2])
def test_coeff_planes_reconstruct_traces(kind, d):
    op = _op(kind)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal(op.grid.shape))
    traces = op.boundary_traces(x, d=d)
    planes = op.boundary_coeff_planes(x, d=d)
    for s in (0, 1):
        tu, tg = op.traces_from_coeff_planes(planes[s], d)
        np.testing.assert_allclose(np.asarray(tu), np.asarray(traces[s][0]),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(tg), np.asarray(traces[s][1]),
                                   atol=1e-11)


def test_hermite_kind_pack_is_a_slice():
    """For the hermite element the payload is a raw coefficient slice."""
    op = _op("hermite")
    assert op._hermite_from_self is None
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(op.grid.shape))
    planes = op.boundary_coeff_planes(x, d=0)
    n = op.n
    np.testing.assert_array_equal(
        np.asarray(planes[0][0]), np.asarray(x[:1, ..., 0, :, :]))
    np.testing.assert_array_equal(
        np.asarray(planes[1][1]), np.asarray(x[-1:, ..., n - 2, :, :]))


def test_low_degree_rejected():
    op = _op("hermite", degree=2)
    x = jnp.zeros(op.grid.shape)
    with pytest.raises(AssertionError):
        op.boundary_coeff_planes(x, d=0)


@pytest.mark.parametrize("kind", ["hermite", "gauss"])
def test_dg_halo_hermite_wire_matches(kind):
    assert len(jax.devices()) >= 8
    op = _op(kind, cells=(16, 4, 4))
    mesh = make_mesh(8, ("z",))
    halo = HaloDGLaplace(op, mesh, wire="hermite")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(op.grid.shape))
    y_ref = np.asarray(op.apply(x))
    y = np.asarray(halo.vmult_distributed()(halo.distribute(x)))
    assert np.allclose(y, y_ref, atol=1e-11)


def test_dg_halo_2d_hermite_wire_matches():
    assert len(jax.devices()) >= 8
    op = _op("hermite", cells=(8, 4, 4))
    mesh = make_mesh(8, ("z", "y"))
    halo = HaloDGLaplace2D(op, mesh, wire="hermite")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(op.grid.shape))
    y_ref = np.asarray(op.apply(x))
    vmult = halo.vmult_distributed()
    y = np.asarray(vmult(halo.distribute(x)))
    assert np.allclose(y, y_ref, atol=1e-11)
    hlo = vmult.lower(halo.distribute(x)).compile().as_text()
    assert "collective-permute" in hlo
