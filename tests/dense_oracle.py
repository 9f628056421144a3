"""Dense-assembly numpy oracles for tiny meshes (SURVEY.md §4 tier b).

Plays the role of the reference's independent face-based operator used for
cross-verification (/root/reference/matvec_dg/program.cc:206-207): a slow,
obviously-correct assembled matrix to check the matrix-free TPU kernels.
"""

import numpy as np

from multigrid_tpu.core.basis import make_basis
from multigrid_tpu.mesh.brick import DofGrid


def node_index_map(grid: DofGrid):
    """Global (flattened) node index for each cell-local dof:
    array [n_cells_total, (p+1)^dim]."""
    p = grid.degree
    n = p + 1
    dim = grid.dim
    cells = grid.cells
    shape = grid.shape
    maps = []
    for ci in np.ndindex(*cells):
        idx = np.zeros((n,) * dim, dtype=np.int64)
        for loc in np.ndindex(*(n,) * dim):
            g = tuple(ci[d] * p + loc[d] for d in range(dim))
            idx[loc] = np.ravel_multi_index(g, shape)
        maps.append(idx.reshape(-1))
    return np.asarray(maps)


def element_stiffness(grid: DofGrid, coefficient: float = 1.0):
    """Exact element stiffness for the affine brick cell (tensor product of
    1-D mass/stiffness), integrating with the same (p+1)-point Gauss rule as
    the matrix-free operator."""
    b = make_basis(grid.degree)
    h = grid.h
    dim = grid.dim
    detj = float(np.prod(h))
    K = None
    for d in range(dim):
        term = coefficient * detj / h[d] ** 2
        mat = np.array([[1.0]])
        for e in range(dim):
            f = b.L if e == d else b.M
            mat = np.kron(mat, f)
        K = term * mat if K is None else K + term * mat
    return K


def assemble_dense(grid: DofGrid, coefficient: float = 1.0):
    """Assembled global stiffness (no constraints)."""
    N = grid.n_dofs
    A = np.zeros((N, N))
    K = element_stiffness(grid, coefficient)
    for idx in node_index_map(grid):
        A[np.ix_(idx, idx)] += K
    return A


def constrain(A: np.ndarray, interior: np.ndarray):
    """Apply the reference's constraint convention: identity rows/cols on
    Dirichlet dofs (/root/reference/common/laplace_operator.h:573-601)."""
    m = interior.reshape(-1).astype(float)
    Ac = A * m[:, None] * m[None, :]
    Ac[np.diag_indices_from(Ac)] += 1.0 - m
    return Ac


def assemble_rhs(grid: DofGrid, f_fn, u_bc_flat: np.ndarray, coefficient: float = 1.0):
    """b = M f - A u_bc, zero at Dirichlet rows
    (cf. /root/reference/common/laplace_operator.h:804-845)."""
    b = make_basis(grid.degree)
    dim = grid.dim
    n = grid.degree + 1
    A = assemble_dense(grid, coefficient)
    N = grid.n_dofs
    rhs = -A @ u_bc_flat
    detj = grid.jxw_scalar
    # shape function values at quad points (tensor product)
    Sn = np.array([[1.0]])
    for _ in range(dim):
        Sn = np.kron(Sn, b.S)
    w = np.array([1.0])
    for _ in range(dim):
        w = np.kron(w, b.quad_weights)
    maps = node_index_map(grid)
    qs = grid.axis_quads
    for k, ci in enumerate(np.ndindex(*grid.cells)):
        coords = np.meshgrid(
            *[qs[d][ci[d]] for d in range(dim)], indexing="ij"
        )
        f = f_fn(coords).reshape(-1)
        rhs[maps[k]] += Sn.T @ (w * detj * f)
    interior = ~grid.boundary_mask().reshape(-1)
    return np.where(interior, rhs, 0.0)
