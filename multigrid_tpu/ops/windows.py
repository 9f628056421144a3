"""Conflict-free cell-window gather/scatter on structured node grids.

TPU-native replacement for the reference's compressed dof gather/scatter
(/root/reference/common/vector_access_reduced.h:11-505).  There, SIMD lanes
are fed from an unstructured vector through 3^dim per-cell index groups; on a
structured grid we instead choose the layout ourselves (SURVEY.md section 7):
dof vectors are dense dim-D node grids, and localizing dofs to cells is a pure
reshape/slice/concat pattern along each axis.  The additive scatter is the
exact adjoint and needs NO atomic/scatter ops: overlapping window columns land
in disjoint slices, so XLA lowers everything to dense adds.  This removes the
serialization hazard called out as "hard part 1" in SURVEY.md.

Conventions
-----------
A 1-D axis of ``N`` cells with window size ``w`` and stride ``s = w - 1``
has ``N*s + 1`` nodes.  ``window_axis`` produces, along the given axis, the
pair of axes ``(N, w)`` in place of the node axis; ``scatter_axis`` is its
transpose (additive).
"""

from __future__ import annotations

import jax.numpy as jnp


def _split_axis(shape, axis):
    axis = axis % len(shape)
    return shape[:axis], shape[axis], shape[axis + 1 :]


def window_axis(x: jnp.ndarray, axis: int, window: int) -> jnp.ndarray:
    """Overlapping windows (stride = window-1) along ``axis``.

    [..., N*(w-1)+1, ...] -> [..., N, w, ...] with
    ``out[..., c, j, ...] = x[..., c*(w-1)+j, ...]``.
    """
    pre, nn, post = _split_axis(x.shape, axis)
    axis = len(pre)
    s = window - 1
    n_cells = (nn - 1) // s
    assert n_cells * s + 1 == nn, (nn, window)

    def slc(a, b):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(a, b)
        return x[tuple(idx)]

    main = slc(0, nn - 1).reshape(pre + (n_cells, s) + post)
    # nodes at positions (c+1)*s are the last column of windows; they are the
    # last column of x[1:] reshaped to (n_cells, s)
    last = slc(1, nn).reshape(pre + (n_cells, s) + post)
    idx = [slice(None)] * (x.ndim + 1)
    idx[axis + 1] = slice(s - 1, s)
    last_col = last[tuple(idx)]
    return jnp.concatenate([main, last_col], axis=axis + 1)


def scatter_axis(y: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Additive adjoint of :func:`window_axis`.

    [..., N, w, ...] -> [..., N*(w-1)+1, ...] with overlapping window entries
    summed (the transpose of the gather, cf. the additive scatter
    /root/reference/common/vector_access_reduced.h:255-505).
    """
    pre, n_cells, rest = _split_axis(y.shape, axis)
    axis = len(pre)
    window = y.shape[axis + 1]
    post = y.shape[axis + 2 :]
    s = window - 1
    nn = n_cells * s + 1

    def slc(a, b):
        idx = [slice(None)] * y.ndim
        idx[axis + 1] = slice(a, b)
        return y[tuple(idx)]

    main = slc(0, s).reshape(pre + (n_cells * s,) + post)
    lastcol = slc(s, s + 1)
    zeros = jnp.zeros(pre + (n_cells, s - 1) + post, dtype=y.dtype)
    tail = jnp.concatenate([zeros, lastcol], axis=axis + 1).reshape(
        pre + (n_cells * s,) + post
    )

    pad_tail = [(0, 0)] * main.ndim
    pad_tail[axis] = (0, 1)
    pad_head = [(0, 0)] * main.ndim
    pad_head[axis] = (1, 0)
    return jnp.pad(main, pad_tail) + jnp.pad(tail, pad_head)


def gather_cells(u: jnp.ndarray, window: int) -> jnp.ndarray:
    """Node grid -> interleaved cell-local layout.

    ``u[Z, Y, X]`` (any dim) -> ``w[Nc_0, w, Nc_1, w, ..., Nc_{d-1}, w]``.
    The interleaved layout keeps every windowing step a contiguous reshape
    (no transposes), the TPU analogue of deal.II MatrixFree's cell batching
    (SURVEY.md section 2.2, MatrixFree row).
    """
    dim = u.ndim
    out = u
    for d in range(dim - 1, -1, -1):
        # axis positions shift as earlier (slower) axes are still unsplit
        out = window_axis(out, d, window)
    return out


def scatter_cells(w: jnp.ndarray, window: int) -> jnp.ndarray:
    """Additive adjoint of :func:`gather_cells`."""
    dim = w.ndim // 2
    out = w
    for d in range(dim):
        out = scatter_axis(out, d)
    return out
