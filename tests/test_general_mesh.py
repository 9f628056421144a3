"""General (mapped multiblock) mesh path: cross-check vs the structured
operator on an identity map, transfer adjointness, and shell MMS."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.mesh.mapped import Block, GeneralGrid, MappedMesh
from multigrid_tpu.mesh.shapes import hyper_ball_2d, hyper_shell
from multigrid_tpu.ops.laplace import LaplaceOperator
from multigrid_tpu.ops.laplace_general import GeneralLaplace
from multigrid_tpu.ops.transfer_general import GeneralTransfer
from multigrid_tpu.solvers.multigrid_general import GeneralMultigridSolver


def brick_mapped(cells=(2, 3), lengths=(1.3, 0.8), origin=(-0.2, 0.1), n_levels=1):
    o = np.asarray(origin)
    L = np.asarray(lengths)

    def mapping(p):
        return o[None, :] + p * L[None, :]

    def boundary_fn(x):
        r = np.zeros(x.shape[0], bool)
        for d in range(x.shape[1]):
            r |= np.abs(x[:, d] - o[d]) < 1e-9
            r |= np.abs(x[:, d] - o[d] - L[d]) < 1e-9
        return r

    return MappedMesh(blocks=[Block(cells=cells, mapping=mapping)],
                      n_levels=n_levels, boundary_fn=boundary_fn)


@pytest.mark.parametrize("degree", [2, 4])
def test_general_matches_structured(degree):
    cells, lengths, origin = (2, 3), (1.3, 0.8), (-0.2, 0.1)
    mm = brick_mapped(cells, lengths, origin)
    gg = GeneralGrid(mm, 0, degree)
    gop = GeneralLaplace(gg, jnp.float64)

    bm = BrickMesh(coarse_cells=cells, origin=origin, lengths=lengths)
    sg = DofGrid(bm, 0, degree)
    sop = LaplaceOperator(sg, jnp.float64)

    # map structured node grid -> general dof numbering via coordinates
    coords = np.stack(np.meshgrid(*[a for a in sg.axis_nodes], indexing="ij"),
                      axis=-1).reshape(-1, 2)
    scale = np.abs(gg.node_coords).max() + 1.0
    key = lambda c: tuple(np.round(c / (1e-9 * scale)).astype(np.int64))
    lookup = {key(c): i for i, c in enumerate(gg.node_coords)}
    perm = np.array([lookup[key(c)] for c in coords])

    rng = np.random.default_rng(0)
    x = rng.standard_normal(sg.shape)
    xg = np.zeros(gg.n_dofs)
    xg[perm] = x.reshape(-1)
    y_s = np.asarray(sop.vmult(jnp.asarray(x))).reshape(-1)
    y_g = np.asarray(gop.vmult(jnp.asarray(xg)))[perm]
    assert np.allclose(y_s, y_g, atol=1e-10)
    d_s = np.asarray(sop.inverse_diagonal()).reshape(-1)
    d_g = np.asarray(gop.inverse_diagonal())[perm]
    assert np.allclose(d_s, d_g, atol=1e-10)


def test_general_transfer_adjoint_and_exact():
    mm = brick_mapped(n_levels=2)
    gc = GeneralGrid(mm, 0, 3)
    gf = GeneralGrid(mm, 1, 3)
    tr = GeneralTransfer(gf, gc, jnp.float64, constrained=False)
    rng = np.random.default_rng(1)
    uc = rng.standard_normal(gc.n_dofs)
    vf = rng.standard_normal(gf.n_dofs)
    lhs = np.vdot(np.asarray(tr.prolongate(jnp.asarray(uc))), vf)
    rhs = np.vdot(uc, np.asarray(tr.restrict(jnp.asarray(vf))))
    assert lhs == pytest.approx(rhs, rel=1e-12)
    # polynomial exactness
    poly = lambda c: c[:, 0] ** 2 + 0.5 * c[:, 1] ** 3 - c[:, 0] * c[:, 1]
    uc = poly(gc.node_coords)
    uf = np.asarray(tr.prolongate(jnp.asarray(uc)))
    assert np.allclose(uf, poly(gf.node_coords), atol=1e-11)


def exact_fn(coords):
    return np.sin(2 * np.pi * (coords[0] + coords[1]))


def rhs_fn(coords):
    return 2 * (2 * np.pi) ** 2 * exact_fn(coords)


def test_shell_solver_mms():
    """Constant-coefficient Poisson on the cubed-sphere shell: p+1 L2
    convergence and healthy CG iteration counts."""
    errs, its_all = [], []
    for n_levels in (1, 2):
        mesh = hyper_shell(0.5, 1.0, n_levels=n_levels, coarse_tangential=2)
        s = GeneralMultigridSolver(mesh, 2, exact_fn, rhs_fn, n_cycles=2)
        sol, its, red = s.solve_cg()
        errs.append(s.l2_error(s.maxlevel, sol))
        its_all.append(its)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.3, (errs, rate)
    assert its_all[-1] <= 14


def test_ball_mesh_geometry():
    mesh = hyper_ball_2d(1.0, n_levels=2)
    g = GeneralGrid(mesh, 1, 3)
    # area of the disc via the quadrature
    area = float(g.jxw.sum())
    assert area == pytest.approx(np.pi, rel=2e-3)
    # all jacobians invertible, boundary nodes on the circle
    assert g.detJ.min() > 0
    rb = np.linalg.norm(g.node_coords[g.boundary], axis=1)
    assert np.allclose(rb, 1.0, atol=1e-9)


def test_shell_12_block():
    from multigrid_tpu.mesh.shapes import hyper_shell_12

    mesh = hyper_shell_12(0.5, 1.0, n_levels=2)
    g = GeneralGrid(mesh, 1, 2)
    vol = float(g.jxw.sum())
    expect = 4.0 / 3.0 * np.pi * (1.0 - 0.125)
    assert abs(vol - expect) / expect < 1e-4
    assert g.detJ.min() > 0
    s = GeneralMultigridSolver(mesh, 2, exact_fn, rhs_fn, n_cycles=2)
    sol, its, red = s.solve_cg()
    assert its <= 10 and red < 0.2
