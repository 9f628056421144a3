

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
    ubc_np = np.asarray(s.u_bc[s.maxlevel])
    got = compute_rhs_host(g, rhs_fn, ubc_np, s.ops_dp[s.maxlevel].coef)
    import jax
    import jax.numpy as jnp

    quads = g.quad_coords_interleaved()
    f_quad = jnp.asarray(np.asarray(rhs_fn(quads), dtype=np.float64))
    dev = np.asarray(jax.jit(s.ops_dp[s.maxlevel].compute_rhs)(
        f_quad, jnp.asarray(ubc_np)))
    scale = np.abs(dev).max()
    np.testing.assert_allclose(got, dev, rtol=0, atol=1e-13 * scale)
