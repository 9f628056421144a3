"""Matrix-free FE_Q Laplace operator vs dense assembly (SURVEY.md §4 tier b)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_oracle import assemble_dense, assemble_rhs, constrain
from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.ops.laplace import LaplaceOperator, SymCoef, make_diag_coef, sym_components


def make_grid(cells, lengths=None, degree=3):
    dim = len(cells)
    lengths = lengths or tuple(1.0 for _ in cells)
    mesh = BrickMesh(coarse_cells=cells, origin=(-0.3,) * dim, lengths=lengths)
    return DofGrid(mesh, 0, degree)


@pytest.mark.parametrize(
    "cells,degree",
    [((3, 2), 1), ((2, 2), 4), ((2, 2, 2), 2), ((2, 1, 3), 3), ((1, 1, 1), 4)],
)
def test_vmult_matches_dense(cells, degree):
    grid = make_grid(cells, degree=degree)
    op = LaplaceOperator(grid, jnp.float64)
    A = constrain(assemble_dense(grid), ~grid.boundary_mask())
    rng = np.random.default_rng(4)
    for _ in range(3):
        x = rng.normal(size=grid.shape)
        y = np.asarray(op.vmult(jnp.asarray(x)))
        assert np.allclose(y.reshape(-1), A @ x.reshape(-1), atol=1e-10)


def test_vmult_anisotropic():
    grid = make_grid((2, 3), lengths=(2.0, 0.7), degree=3)
    op = LaplaceOperator(grid, jnp.float64, make_diag_coef(grid, 2.5))
    A = constrain(assemble_dense(grid, 2.5), ~grid.boundary_mask())
    rng = np.random.default_rng(5)
    x = rng.normal(size=grid.shape)
    y = np.asarray(op.vmult(jnp.asarray(x)))
    assert np.allclose(y.reshape(-1), A @ x.reshape(-1), atol=1e-10)


def test_sym_coef_matches_diag():
    """Full merged-tensor path equals the affine fast path when the tensor is
    the affine diagonal (cf. /root/reference/common/laplace_operator.h:374-432)."""
    grid = make_grid((2, 2, 2), degree=2)
    diag = make_diag_coef(grid, 1.0)
    nq = grid.degree + 1
    dim = grid.dim
    comps = sym_components(dim)
    shape = tuple(v for c in grid.cells for v in (c, nq)) + (len(comps),)
    C = np.zeros(shape)
    b = grid.basis
    w3 = np.ones([1] * (2 * dim))
    for d in range(dim):
        s = [1] * (2 * dim)
        s[2 * d + 1] = nq
        w3 = w3 * b.quad_weights.reshape(s)
    for d in range(dim):
        C[..., d] = diag.values[d] * w3
    op_diag = LaplaceOperator(grid, jnp.float64, diag)
    op_sym = LaplaceOperator(grid, jnp.float64, SymCoef(jnp.asarray(C)))
    x = np.random.default_rng(6).normal(size=grid.shape)
    y1 = np.asarray(op_diag.vmult(jnp.asarray(x)))
    y2 = np.asarray(op_sym.vmult(jnp.asarray(x)))
    assert np.allclose(y1, y2, atol=1e-11)


@pytest.mark.parametrize("cells,degree", [((2, 2), 3), ((2, 2, 2), 2)])
def test_inverse_diagonal(cells, degree):
    grid = make_grid(cells, degree=degree)
    op = LaplaceOperator(grid, jnp.float64)
    A = constrain(assemble_dense(grid), ~grid.boundary_mask())
    inv_diag = np.asarray(op.inverse_diagonal()).reshape(-1)
    assert np.allclose(1.0 / inv_diag, np.diag(A), atol=1e-10)


def test_rhs_and_error():
    grid = make_grid((2, 2), degree=3)
    op = LaplaceOperator(grid, jnp.float64)

    def f_fn(coords):
        return coords[0] + 2.0 * coords[1] ** 2

    def exact(coords):
        return np.sin(coords[0]) * coords[1]

    nodes = grid.node_coords()
    vals = np.broadcast_to(exact(nodes), grid.shape)
    u_bc = np.where(grid.boundary_mask(), vals, 0.0)
    quads = grid.quad_coords_interleaved()
    f_quad = jnp.asarray(np.broadcast_to(f_fn(quads), tuple(v for c in grid.cells for v in (c, 4))))
    b = np.asarray(op.compute_rhs(f_quad, jnp.asarray(u_bc)))
    b_ref = assemble_rhs(grid, f_fn, u_bc.reshape(-1))
    assert np.allclose(b.reshape(-1), b_ref, atol=1e-11)


def test_chunked_rhs_and_l2_error_match_monolithic():
    """z-slab-chunked setup/analysis paths (HBM-safe at the flagship size)
    agree with the monolithic assembly to rounding."""
    import jax
    import jax.numpy as jnp

    from experiments.poisson_cube import exact_fn, rhs_fn
    from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh

    mesh = poisson_cube_mesh(4)
    grid = DofGrid(mesh, mesh.max_level, 3)
    op = LaplaceOperator(grid, jnp.float64)
    quads = grid.quad_coords_interleaved()
    f_quad = jnp.asarray(np.asarray(rhs_fn(quads), np.float64))
    nodes = grid.node_coords()
    vals = np.broadcast_to(np.asarray(exact_fn(nodes), np.float64), grid.shape)
    u_bc = jnp.asarray(np.where(np.asarray(grid.boundary_mask()), vals, 0.0))

    b_ref = np.asarray(jax.jit(op.compute_rhs)(f_quad, u_bc))
    b_chk = np.asarray(
        jax.jit(lambda f, u: op.compute_rhs_chunked(f, u, target_dofs=500))(
            f_quad, u_bc)
    )
    np.testing.assert_allclose(b_chk, b_ref, rtol=1e-13, atol=1e-15)

    eq = jnp.asarray(np.asarray(exact_fn(quads), np.float64))
    u = jnp.asarray(vals)
    e_ref = float(jax.jit(op.l2_error)(u, eq))
    e_chk = float(
        jax.jit(lambda a, b: op.l2_error_chunked(a, b, target_dofs=500))(u, eq)
    )
    assert abs(e_chk - e_ref) <= 1e-12 * max(abs(e_ref), 1e-30), (e_chk, e_ref)


def test_l2_error_host_matches_device():
    """Host (numpy) flagship-size analysis path == device path."""
    import jax
    import jax.numpy as jnp

    from experiments.poisson_cube import exact_fn
    from multigrid_tpu.mesh.brick import DofGrid, poisson_cube_mesh
    from multigrid_tpu.ops.laplace import l2_error_host

    mesh = poisson_cube_mesh(5)
    grid = DofGrid(mesh, mesh.max_level, 3)
    op = LaplaceOperator(grid, jnp.float64)
    rng = np.random.default_rng(3)
    nodes = grid.node_coords()
    u = np.asarray(
        np.broadcast_to(np.asarray(exact_fn(nodes), np.float64), grid.shape)
    ) + 1e-6 * rng.standard_normal(grid.shape)
    quads = grid.quad_coords_interleaved()
    eq = jnp.asarray(np.asarray(exact_fn(quads), np.float64))
    e_dev = float(jax.jit(op.l2_error)(jnp.asarray(u), eq))
    e_host = l2_error_host(grid, u, exact_fn, z_slab_cells=2)
    # true-f64 arbiter on the interleaved layout: the host path must match
    # it exactly; the device path's compensated f32-pair reduction
    # (ops/df64.sum_f64) is ~1e-8-accurate by design
    uq = np.asarray(op.interpolate_to_quad(jnp.asarray(u)))
    w3 = np.asarray(op.w3d, np.float64)
    jxw = grid.jxw_scalar
    err = np.sum((uq - np.broadcast_to(np.asarray(eq), uq.shape)) ** 2 * w3) * jxw
    vol = np.prod(uq.shape) / w3.size * w3.sum() * jxw
    e_ref = float(np.sqrt(err / vol))
    assert abs(e_host - e_ref) <= 1e-12 * e_ref, (e_host, e_ref)
    assert abs(e_dev - e_ref) <= 1e-7 * e_ref, (e_dev, e_ref)
