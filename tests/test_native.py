"""Native mesh engine (C++ via ctypes) vs numpy fallback."""

import numpy as np

from multigrid_tpu.mesh import native


def test_native_builds_and_matches():
    lib = native.load()
    assert lib is not None, "native meshgen library failed to build"
    rng = np.random.default_rng(0)
    base = rng.normal(size=(500, 3))
    coords = np.concatenate([base, base[::3] + 1e-13, base[:50]], axis=0)
    n_u, inv = native.unique_nodes(coords, 1e-9)
    assert n_u == 500
    # same-id points have (nearly) identical coordinates
    rec = np.zeros((n_u, 3))
    rec[inv] = coords
    assert np.allclose(rec[inv], coords, atol=1e-9)


def test_block_cell_nodes_matches_numpy():
    lib = native.load()
    cells = (3, 2, 4)
    degree = 3
    out_native = native.block_cell_nodes(cells, degree)
    # numpy fallback path
    native_lib, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    try:
        out_np = native.block_cell_nodes(cells, degree)
    finally:
        native._lib = native_lib
        native._tried = tried
    assert np.array_equal(out_native, out_np)
