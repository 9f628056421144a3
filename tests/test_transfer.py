"""Multigrid transfer: polynomial exactness and adjointness (tier a/b)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.transfer import Transfer


@pytest.mark.parametrize("cells,degree", [((2, 3), 2), ((1, 2, 2), 3), ((1, 1, 1), 4)])
def test_prolongation_exact_on_polynomials(cells, degree):
    mesh = BrickMesh(coarse_cells=cells, origin=(0.0,) * len(cells),
                     lengths=(1.0,) * len(cells), n_levels=2)
    coarse = DofGrid(mesh, 0, degree)
    fine = DofGrid(mesh, 1, degree)
    tr = Transfer(fine, coarse, jnp.float64, constrained=False)

    def poly(coords):
        out = 0.0
        for d, c in enumerate(coords):
            out = out + c ** min(degree, 2) + 0.3 * d * c
        return out

    uc = np.broadcast_to(poly(coarse.node_coords()), coarse.shape)
    uf_expect = np.broadcast_to(poly(fine.node_coords()), fine.shape)
    uf = np.asarray(tr.prolongate(jnp.asarray(uc)))
    assert np.allclose(uf, uf_expect, atol=1e-11)


@pytest.mark.parametrize("constrained", [False, True])
def test_restrict_is_adjoint(constrained):
    mesh = BrickMesh(coarse_cells=(2, 1, 2), origin=(0.0,) * 3,
                     lengths=(1.0,) * 3, n_levels=2)
    coarse = DofGrid(mesh, 0, 3)
    fine = DofGrid(mesh, 1, 3)
    tr = Transfer(fine, coarse, jnp.float64, constrained=constrained)
    rng = np.random.default_rng(7)
    uc = rng.normal(size=coarse.shape)
    vf = rng.normal(size=fine.shape)
    lhs = np.vdot(np.asarray(tr.prolongate(jnp.asarray(uc))), vf)
    rhs = np.vdot(uc, np.asarray(tr.restrict(jnp.asarray(vf))))
    assert lhs == pytest.approx(rhs, rel=1e-12)


@pytest.mark.parametrize("coarse_cells", [(2, 2, 2), (2, 3, 2)])
def test_chunked_transfer_matches_unchunked(coarse_cells):
    """The z-layer-chunked 3-D sweeps (HBM-lean path for large grids) must
    agree with the monolithic gather/scatter bit-for-bit in f32."""
    mesh = BrickMesh(coarse_cells=coarse_cells, origin=(0.0,) * 3,
                     lengths=(1.0,) * 3, n_levels=2)
    coarse = DofGrid(mesh, 0, 4)
    fine = DofGrid(mesh, 1, 4)
    rng = np.random.default_rng(3)
    uc = jnp.asarray(rng.normal(size=coarse.shape), jnp.float32)
    uf = jnp.asarray(rng.normal(size=fine.shape), jnp.float32)
    for constrained in (False, True):
        tr = Transfer(fine, coarse, jnp.float32, constrained=constrained)
        assert not tr._chunked()
        ref_p = np.asarray(tr.prolongate(uc))
        ref_r = np.asarray(tr.restrict(uf))
        tr._CHUNK_DOFS = 0   # force the chunked flavor
        assert tr._chunked()
        np.testing.assert_allclose(np.asarray(tr.prolongate(uc)), ref_p,
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(tr.restrict(uf)), ref_r,
                                   rtol=0, atol=2e-6)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("constrained", [False, True])
def test_matmul_transfer_matches_windowed(dim, constrained):
    """The per-axis banded-MXU-matmul flavor must reproduce the
    gather/sweep/scatter transfer (f32 reassociation tolerance) and stay
    an exact adjoint pair."""
    from multigrid_tpu.ops.transfer import MatmulTransfer

    cells = (2, 3, 2)[:dim]
    mesh = BrickMesh(coarse_cells=cells, origin=(0.0,) * dim,
                     lengths=(1.0,) * dim, n_levels=2)
    coarse = DofGrid(mesh, 0, 4)
    fine = DofGrid(mesh, 1, 4)
    rng = np.random.default_rng(11)
    uc = jnp.asarray(rng.normal(size=coarse.shape), jnp.float32)
    uf = jnp.asarray(rng.normal(size=fine.shape), jnp.float32)
    ref = Transfer(fine, coarse, jnp.float32, constrained=constrained)
    mm = MatmulTransfer(fine, coarse, jnp.float32, constrained=constrained)
    want_p = np.asarray(ref.prolongate(uc))
    want_r = np.asarray(ref.restrict(uf))
    np.testing.assert_allclose(np.asarray(mm.prolongate(uc)), want_p,
                               rtol=0, atol=3e-6 * np.abs(want_p).max())
    np.testing.assert_allclose(np.asarray(mm.restrict(uf)), want_r,
                               rtol=0, atol=3e-6 * np.abs(want_r).max())
    lhs = np.vdot(np.asarray(mm.prolongate(uc), np.float64), np.asarray(uf))
    rhs = np.vdot(np.asarray(uc), np.asarray(mm.restrict(uf), np.float64))
    assert lhs == pytest.approx(rhs, rel=1e-5)
