

def test_compute_rhs_host_matches_device():
    """The dgemm host assembly must match the on-device dp assembly."""
    import numpy as np

    from experiments.poisson_cube import exact_fn, rhs_fn
    from multigrid_tpu.mesh.brick import poisson_cube_mesh, DofGrid
    from multigrid_tpu.ops.laplace import compute_rhs_host, make_diag_coef
    from multigrid_tpu.solvers.multigrid import MultigridSolver

    mesh = poisson_cube_mesh(4)
    s = MultigridSolver(mesh, 3, exact_fn, rhs_fn)
    g = s.grids[s.maxlevel]
    from multigrid_tpu.solvers.multigrid import _bc_faces_host, _dense_bc_host

    ubc_np = _dense_bc_host(g, _bc_faces_host(g, exact_fn))
    got = compute_rhs_host(g, rhs_fn, ubc_np, s.ops_dp[s.maxlevel].coef)
    import jax
    import jax.numpy as jnp

    quads = g.quad_coords_interleaved()
    f_quad = jnp.asarray(np.asarray(rhs_fn(quads), dtype=np.float64))
    dev = np.asarray(jax.jit(s.ops_dp[s.maxlevel].compute_rhs)(
        f_quad, jnp.asarray(ubc_np)))
    scale = np.abs(dev).max()
    np.testing.assert_allclose(got, dev, rtol=0, atol=1e-13 * scale)


def test_rhs_separable_device_matches_host():
    """The on-device separable assembly (outer-product M f + boundary
    correction slabs) must match the full host dgemm assembly bit-near;
    called directly (the solver gates it to >4M-dof levels where the
    device-link transfer dominates)."""
    import numpy as np
    import jax.numpy as jnp

    from experiments.poisson_cube import exact_fn, rhs_fn
    from multigrid_tpu.mesh.brick import poisson_cube_mesh
    from multigrid_tpu.ops.laplace import compute_rhs_host
    from multigrid_tpu.solvers.multigrid import (
        MultigridSolver, _bc_faces_host, _dense_bc_host)

    mesh = poisson_cube_mesh(8)
    s = MultigridSolver(mesh, 4, exact_fn, rhs_fn)
    for l in (s.maxlevel, s.maxlevel - 1):
        g = s.grids[l]
        faces = _bc_faces_host(g, exact_fn)
        got = np.asarray(s._rhs_separable_device(
            l, g, rhs_fn.separable_1d(g.dim), faces))
        ref = compute_rhs_host(g, rhs_fn, _dense_bc_host(g, faces),
                               s.ops_dp[l].coef)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-13 * scale)
