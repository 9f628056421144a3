"""Cross-verification of the two independent SIP-DG operators (the
reference's oracle pattern, /root/reference/matvec_dg/program.cc:206-207):
fused cell-centric (ops/dg.py) vs face-based (ops/dg_face.py) on random
input, all element types, with shear, in both dims."""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.ops.dg import DGGrid, DGLaplace
from multigrid_tpu.ops.dg_face import DGLaplaceFaceBased


@pytest.mark.parametrize("kind", ["hermite", "gll", "gauss"])
@pytest.mark.parametrize("dim", [2, 3])
def test_face_based_matches_fused(kind, dim):
    degree = 3
    cells = (3, 2, 4)[:dim]
    # sheared affine cell map (matvec_dg/program.cc:66-76 flavor)
    J = np.eye(dim) * 0.7
    J[0, 1] = 0.21
    grid = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=degree, kind=kind)
    fused = DGLaplace(grid, jnp.float64)
    face = DGLaplaceFaceBased(grid, jnp.float64)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=grid.shape))
    y1 = np.asarray(fused.vmult(u))
    y2 = np.asarray(face.vmult(u))
    scale = np.abs(y1).max()
    assert np.abs(y1 - y2).max() < 1e-12 * scale


def test_face_based_symmetric_and_positive():
    """Independent structural checks (not routed through the fused op):
    the SIP form is symmetric and positive definite for large-enough
    penalty; catches sign/trace errors that a cross-check alone could
    share if both operators inherited them from common helpers."""
    degree = 2
    cells = (2, 3)
    J = np.diag([0.5, 0.8])
    grid = DGGrid(cells=cells, jacobian=tuple(tuple(r) for r in J),
                  degree=degree, kind="gauss")
    face = DGLaplaceFaceBased(grid, jnp.float64)
    N = grid.n_dofs
    eye = np.eye(N).reshape((N,) + grid.shape)
    cols = np.stack([np.asarray(face.vmult(jnp.asarray(e))).reshape(-1)
                     for e in eye], axis=1)
    assert np.abs(cols - cols.T).max() < 1e-12 * np.abs(cols).max()
    eigs = np.linalg.eigvalsh(0.5 * (cols + cols.T))
    assert eigs.min() > 0
