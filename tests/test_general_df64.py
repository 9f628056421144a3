"""GeneralLaplaceDF64: dp general-geometry matvec on f32 pairs.

Accuracy reference is the native-f64 GeneralLaplace (exact on CPU).  The
traced-coefficient cases guard the excess-precision miscompile class (the
convert-elision that silently degraded the traced-C program to f32
accuracy — see two_prod_masked's docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multigrid_tpu.mesh.mapped import GeneralGrid
from multigrid_tpu.mesh.shapes import hyper_shell
from multigrid_tpu.ops.laplace_general import GeneralLaplace
from multigrid_tpu.ops.laplace_general_df64 import GeneralLaplaceDF64, two_prod_masked


def coef_fn(coords):
    prod = 1.0
    for e, c in enumerate(coords):
        prod = prod * np.cos(2 * np.pi * c + 0.1 * e) ** 2
    return 1.0 + 1.0e6 * prod


def test_two_prod_masked_exact_under_jit():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 1e3)
    b = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 1e3)
    p, e = jax.jit(two_prod_masked)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    err = exact - (np.asarray(p, np.float64) + np.asarray(e, np.float64))
    assert np.max(np.abs(err)) == 0.0


@pytest.fixture(scope="module")
def shell_ops():
    mesh = hyper_shell(0.5, 1.0, n_levels=2)
    out = []
    for lvl in (0, 1):
        g = GeneralGrid(mesh, lvl, 3)
        coef = g.merged_coefficient(coef_fn)
        out.append((g, coef, GeneralLaplace(g, jnp.float64, coef=coef),
                    GeneralLaplaceDF64(g, coef=coef)))
    return out


@pytest.mark.parametrize("lvl", [0, 1])
def test_vmult_matches_f64(shell_ops, lvl):
    g, coef, op64, opdf = shell_ops[lvl]
    rng = np.random.default_rng(lvl)
    x = jnp.asarray(rng.standard_normal(g.n_dofs))
    y64 = np.asarray(op64.vmult(x))
    den = np.max(np.abs(y64))
    for label, y in [
        ("stored", jax.jit(opdf.vmult)(x)),
        ("traced-pair", jax.jit(lambda xx, Cp: opdf.vmult(xx, C=Cp))(x, opdf.C)),
        ("traced-f64", jax.jit(lambda xx, C: opdf.vmult(xx, C=C))(
            x, jnp.asarray(np.asarray(coef, np.float64).reshape(opdf.C[0].shape)))),
    ]:
        rel = np.max(np.abs(y64 - np.asarray(y))) / den
        assert rel < 1e-12, (label, rel)


@pytest.mark.parametrize("lvl", [0, 1])
def test_vmult_residual_matches_f64(shell_ops, lvl):
    g, coef, op64, opdf = shell_ops[lvl]
    rng = np.random.default_rng(10 + lvl)
    x = jnp.asarray(rng.standard_normal(g.n_dofs))
    r = jnp.asarray(rng.standard_normal(g.n_dofs))
    ref = np.asarray(op64.vmult_residual(r, x))
    got = np.asarray(jax.jit(
        lambda rr, xx, Cp: opdf.vmult_residual(rr, xx, C=Cp))(r, x, opdf.C))
    den = np.max(np.abs(ref))
    assert np.max(np.abs(ref - got)) / den < 1e-12
