"""Fused operator-update entry points (API parity with the reference).

The reference hand-fuses vector updates and reductions into its operator
cell loops — ``vmult_with_cg_update``
(/root/reference/common/laplace_operator.h:638-719),
``vmult_with_chebyshev_update`` and the merged-ops action codes
(/root/reference/common/laplace_operator_dg.h:863-976) — because on CPUs a
separate vector sweep costs an extra memory pass.  Under jit, XLA performs
this fusion automatically: expressing the same composite as one traced
function yields one fused program, so these helpers are thin, documented
compositions rather than bespoke kernels.  They exist so solver code can be
written against the same interface as the reference's fast paths.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def vmult_with_cg_update(
    vmult: Callable,
    alpha,
    beta,
    r: jnp.ndarray,
    q: jnp.ndarray,
    p: jnp.ndarray,
    x: jnp.ndarray,
):
    """One fused CG round: vector updates folded around ``q = A p`` plus the
    four reductions the reference returns
    (laplace_operator.h:655-718): <q,p>, <r,r>, <q,r>, <q,q>.

    alpha == 0 marks the first iteration (p initialized from q).
    """
    first = alpha == 0.0
    x = jnp.where(first, x, x + alpha * p)
    p = jnp.where(first, q, beta * p + q)
    q = vmult(p)
    sums = jnp.stack(
        [jnp.vdot(q, p), jnp.vdot(r, r), jnp.vdot(q, r), jnp.vdot(q, q)]
    )
    return x, p, q, sums


def vmult_with_chebyshev_update(
    vmult: Callable,
    precond: Callable,
    rhs: jnp.ndarray,
    factor1,
    factor2,
    x: jnp.ndarray,
    x_old: jnp.ndarray,
):
    """Fused Chebyshev step
    ``x_new = factor2 P^{-1}(rhs - A x) + (1 + factor1) x - factor1 x_old``
    (the exact epilogue of laplace_operator_dg.h:1839-1860)."""
    r = rhs - vmult(x)
    x_new = factor2 * precond(r) + (1.0 + factor1) * x - factor1 * x_old
    return x_new, x
