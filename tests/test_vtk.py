"""VTK rectilinear solution dumps (the reference's output_results
analogue, /root/reference/poisson_cube/program.cc:325-341)."""

import xml.etree.ElementTree as ET

import numpy as np

from multigrid_tpu.mesh.brick import BrickMesh, DofGrid
from multigrid_tpu.utils.vtk import SIZE_GUARD, write_solution, write_vtr


def _grid(cells=(2, 2, 2), degree=2):
    mesh = BrickMesh(coarse_cells=cells, origin=(-1.0,) * 3,
                     lengths=(2.0,) * 3, n_levels=1)
    return DofGrid(mesh, 0, degree)


def test_roundtrip_ascii(tmp_path):
    g = _grid()
    sol = np.random.default_rng(0).standard_normal(g.shape)
    path = str(tmp_path / "s.vtr")
    assert write_solution(path, g, sol,
                          exact_fn=lambda c: c[0] + c[1] + c[2])
    root = ET.parse(path).getroot()
    arrays = {a.get("Name"): a for a in root.iter("DataArray")}
    got = np.fromstring(arrays["solution"].text, sep=" ").reshape(g.shape)
    np.testing.assert_allclose(got, sol, rtol=1e-12)
    x = np.fromstring(arrays["x"].text, sep=" ")
    np.testing.assert_allclose(x, np.asarray(g.axis_nodes[2]))
    err = np.fromstring(arrays["error"].text, sep=" ").reshape(g.shape)
    coords = g.node_coords()
    exact = coords[0] + coords[1] + coords[2]
    np.testing.assert_allclose(err, sol - exact, rtol=0, atol=1e-12)


def test_size_guard(tmp_path):
    axes = [np.arange(n, dtype=float) for n in (50, 50, 50)]
    path = str(tmp_path / "big.vtr")
    assert not write_vtr(path, axes,
                         {"f": np.zeros((50, 50, 50))})
    assert write_vtr(path, axes, {"f": np.zeros((50, 50, 50))}, force=True)
    assert 50 * 50 * 50 > 32_768  # exercised the binary branch
    root = ET.parse(path).getroot()
    a = next(x for x in root.iter("DataArray") if x.get("Name") == "f")
    assert a.get("format") == "binary"


def test_2d_extrusion(tmp_path):
    axes = [np.linspace(0, 1, 5), np.linspace(0, 2, 9)]
    path = str(tmp_path / "flat.vtr")
    assert write_vtr(path, axes, {"u": np.ones((5, 9))})
    root = ET.parse(path).getroot()
    assert root.find("RectilinearGrid").get("WholeExtent") == "0 8 0 4 0 0"
