"""Comm/compute overlap structure of the explicit halo operator.

The reference overlaps MPI face exchanges with interior cell compute via a
hand-built schedule (laplace_operator_dg.h:607-723).  Our TPU equivalent is
dependency structure: the compress ppermute's input cone contains only the
first z-cell layer's compute, so XLA's latency-hiding scheduler can run the
bulk apply while the permute is in flight.  These tests pin (a) that the
restructured schedule is bit-identical to the plain apply, and (b) the cone
fraction measured on the traced program (utils/overlap.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace import LaplaceOperator, make_diag_coef
from multigrid_tpu.parallel.halo import HaloLaplace
from multigrid_tpu.parallel.sharding import make_mesh
from multigrid_tpu.utils.overlap import collective_overlap_report


def _halo(n_coarse_z=8, n_levels=2):
    mesh = BrickMesh(coarse_cells=(n_coarse_z, 2, 2), origin=(0.0,) * 3,
                     lengths=(1.0,) * 3, n_levels=n_levels)
    g = DofGrid(mesh, n_levels - 1, 4)
    op = LaplaceOperator(g, jnp.float32, make_diag_coef(g))
    return HaloLaplace(op, make_mesh(8, ("z",))), op


def test_overlap_schedule_matches_vmult():
    """Distributed matvec with the layer-split schedule == single-device
    vmult to f32 roundoff (term-level math identical; sub-slab dot shapes
    vectorize reductions differently on CPU -> 1-ulp scatter)."""
    h, op = _halo()
    fn, masks = h.vmult_distributed()
    u = jnp.asarray(np.random.default_rng(0).standard_normal(
        (h.Z,) + op.grid.shape[1:]), jnp.float32)
    got = np.asarray(h.collect(fn(h.distribute(u), masks)))
    want = np.asarray(op.vmult(u))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=5e-7 * np.abs(want).max())


def test_compress_exchange_cone_excludes_bulk():
    """The first ppermute's dependency cone must contain only the first
    z-layer's FLOPs: with 4 local layers, 3/4 of the dots are
    overlappable."""
    h, op = _halo(n_coarse_z=16)
    assert h.loc_cells >= 4
    fn, masks = h.vmult_distributed()
    u = jnp.asarray(np.random.default_rng(1).standard_normal(
        (h.Z,) + op.grid.shape[1:]), jnp.float32)
    rep = collective_overlap_report(fn, h.distribute(u), masks)
    assert rep["flops_total"] > 0
    assert rep["overlappable_fraction"] >= 0.6, rep


def test_2d_halo_cone_excludes_bulk():
    """Three-box schedule on the ('z','y') halo operator: the z-compress
    permute's cone holds only the z-layer-0 box."""
    from multigrid_tpu.parallel.halo import HaloLaplace2D

    mesh = BrickMesh(coarse_cells=(8, 8, 2), origin=(0.0,) * 3,
                     lengths=(1.0,) * 3, n_levels=2)
    g = DofGrid(mesh, 1, 4)
    op = LaplaceOperator(g, jnp.float32, make_diag_coef(g))
    h = HaloLaplace2D(op, make_mesh(8, ("z", "y")))
    assert min(h.loc_cells) >= 2
    fn, masks = h.vmult_distributed()
    u = jnp.asarray(np.random.default_rng(2).standard_normal(g.shape),
                    jnp.float32)
    v = h.distribute(u)
    rep = collective_overlap_report(fn, v, masks)
    assert rep["overlappable_fraction"] >= 0.5, rep
    # and the distributed result still matches the single-device operator
    got = np.asarray(h.collect(fn(v, masks)))
    want = np.asarray(op.vmult(u))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=5e-7 * np.abs(want).max())
