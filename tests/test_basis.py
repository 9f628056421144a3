"""Unit tests for 1-D quadrature and basis tables (SURVEY.md §4 tier a)."""

import numpy as np
import pytest

from multigrid_tpu.core.basis import make_basis
from multigrid_tpu.core.quadrature import (
    gauss,
    gauss_lobatto,
    lagrange_derivatives,
    lagrange_values,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_gauss_exactness(n):
    x, w = gauss(n)
    # exact for polynomials up to degree 2n-1 on [0,1]
    for k in range(2 * n):
        assert np.sum(w * x**k) == pytest.approx(1.0 / (k + 1), rel=1e-12)


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_gauss_lobatto(n):
    x, w = gauss_lobatto(n)
    assert x[0] == pytest.approx(0.0)
    assert x[-1] == pytest.approx(1.0)
    # exact up to degree 2n-3
    for k in range(2 * n - 2):
        assert np.sum(w * x**k) == pytest.approx(1.0 / (k + 1), rel=1e-12)


@pytest.mark.parametrize("p", [1, 2, 4, 7, 11])
def test_lagrange_interpolation(p):
    nodes, _ = gauss_lobatto(p + 1)
    pts = np.linspace(0, 1, 33)
    S = lagrange_values(nodes, pts)
    D = lagrange_derivatives(nodes, pts)
    # reproduce monomials exactly
    for k in range(p + 1):
        vals = S @ nodes**k
        ders = D @ nodes**k
        assert np.allclose(vals, pts**k, atol=1e-10)
        expect = k * pts ** (k - 1) if k > 0 else np.zeros_like(pts)
        assert np.allclose(ders, expect, atol=1e-9)
    # partition of unity / derivative row sums
    assert np.allclose(S.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(D.sum(axis=1), 0.0, atol=1e-9)


@pytest.mark.parametrize("p", [1, 2, 4, 6])
def test_basis_tables(p):
    b = make_basis(p)
    # collocation derivative consistency: D = D_col @ S
    assert np.allclose(b.D_col @ b.S, b.D, atol=1e-9)
    # 1-D stiffness of linears on [0,1]: [[1,-1],[-1,1]]
    if p == 1:
        assert np.allclose(b.L, [[1, -1], [-1, 1]], atol=1e-12)
        assert np.allclose(b.M, [[1 / 3, 1 / 6], [1 / 6, 1 / 3]], atol=1e-12)
    # embedding reproduces polynomials on both children
    fine_pts = np.concatenate([b.nodes * 0.5, 0.5 + b.nodes[1:] * 0.5])
    for k in range(p + 1):
        assert np.allclose(b.P @ b.nodes**k, fine_pts**k, atol=1e-10)
