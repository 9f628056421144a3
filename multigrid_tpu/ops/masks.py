"""Separable (outer-product) masks and weights for structured node grids.

Full-grid boolean masks and weight fields on the brick are outer products
of per-axis 1-D vectors.  Storing them materialized makes every jitted
closure embed an O(N) literal — at the 135M-dof flagship that overflows
the remote-compile payload (and wastes HBM).  These helpers keep only the
1-D factors as constants and rebuild the field INSIDE the traced program,
where XLA fuses the broadcast into the consuming elementwise op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def axis_reshape(a, d: int, dim: int):
    shape = [1] * dim
    shape[d] = a.shape[0]
    return a.reshape(shape)


def bcast_and(axes) -> jnp.ndarray:
    """Broadcasted logical AND of per-axis 1-D boolean arrays."""
    dim = len(axes)
    m = None
    for d, a in enumerate(axes):
        e = axis_reshape(a, d, dim)
        m = e if m is None else m & e
    return m


def bcast_prod(axes) -> jnp.ndarray:
    """Broadcasted product of per-axis 1-D arrays."""
    dim = len(axes)
    m = None
    for d, a in enumerate(axes):
        e = axis_reshape(a, d, dim)
        m = e if m is None else m * e
    return m


def interior_axes_jnp(grid):
    """Per-axis interior masks (all-faces Dirichlet brick) as jnp arrays."""
    out = []
    for sdim in grid.shape:
        m = np.ones(sdim, bool)
        m[0] = m[-1] = False
        out.append(jnp.asarray(m))
    return tuple(out)


class LazyMaskList:
    """List-like view: item ``l`` is the broadcasted AND of level ``l``'s
    per-axis masks (negated when ``invert``, e.g. boundary = NOT interior),
    rebuilt at each access so jit traces embed only the 1-D constants."""

    def __init__(self, axes_per_level, invert: bool = False):
        self._axes = list(axes_per_level)
        self._invert = invert

    def __len__(self):
        return len(self._axes)

    def __getitem__(self, level):
        m = bcast_and(self._axes[level])
        return ~m if self._invert else m
