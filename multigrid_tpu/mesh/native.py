"""ctypes bindings for the native mesh/topology engine (native/meshgen.cpp).

Builds the shared library on first use (g++, no external deps) and falls
back to numpy implementations when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_repo_root(), "native", "meshgen.cpp")
        so = os.path.join(_repo_root(), "native", "libmeshgen.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.mg_unique_nodes.restype = ctypes.c_int64
            lib.mg_unique_nodes.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.mg_block_cell_nodes.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.mg_node_valence.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _quantize_labels(coords: np.ndarray, tol: float) -> np.ndarray:
    """Group labels from one rounded-coordinate hashing (native or numpy)."""
    lib = load()
    n, dim = coords.shape
    if lib is not None:
        inverse = np.empty(n, np.int64)
        lib.mg_unique_nodes(
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, dim, tol,
            inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return inverse
    keys = np.round(coords / tol).astype(np.int64)
    _, inverse = np.unique(keys, axis=0, return_inverse=True)
    return inverse


def unique_nodes(coords: np.ndarray, tol: float):
    """Returns (n_unique, inverse) for rounded-coordinate identification.

    Robust to half-quantum boundary straddles: two copies of the same
    physical node computed through different block mappings differ by
    ~1e-16*scale and can land on opposite sides of a rounding boundary.
    We therefore hash at two offset quantizations (round(x/tol) and
    round(x/tol + 1/2)) and merge the groupings by min-label propagation
    (connected components of the two partitions), so a pair missed by one
    grid is caught by the other; a simultaneous miss needs a coordinate
    sitting on both grids' boundaries, which cannot happen (they are
    tol/2 apart).
    """
    coords = np.ascontiguousarray(coords, np.float64)
    n = coords.shape[0]
    inv_a = _quantize_labels(coords, tol)
    inv_b = _quantize_labels(coords + 0.5 * tol, tol)
    lab = np.arange(n, dtype=np.int64)
    for _ in range(16):
        changed = False
        for inv in (inv_a, inv_b):
            gmin = np.full(int(inv.max()) + 1, n, np.int64)
            np.minimum.at(gmin, inv, lab)
            new = gmin[inv]
            if not np.array_equal(new, lab):
                changed = True
                lab = new
        if not changed:
            break
    uniq, inverse = np.unique(lab, return_inverse=True)
    return int(uniq.shape[0]), inverse


def block_cell_nodes(cells, degree: int) -> np.ndarray:
    lib = load()
    dim = len(cells)
    n = degree + 1
    n_cells = int(np.prod(cells))
    if lib is not None:
        cells_arr = np.asarray(cells, np.int64)
        out = np.empty((n_cells, n**dim), np.int64)
        lib.mg_block_cell_nodes(
            cells_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dim, degree,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out
    # numpy fallback
    shape = tuple(c * degree + 1 for c in cells)
    local = np.arange(int(np.prod(shape))).reshape(shape)
    from .mapped import _window_np

    idx = local
    for d in range(dim - 1, -1, -1):
        idx = _window_np(idx, d, n, degree)
    perm = tuple(range(0, 2 * dim, 2)) + tuple(range(1, 2 * dim, 2))
    return idx.transpose(perm).reshape(-1, n**dim)
