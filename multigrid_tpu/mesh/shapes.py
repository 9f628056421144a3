"""Curved multiblock domain builders (shell, ball).

Replaces ``GridGenerator::hyper_shell`` / ``hyper_ball`` + manifolds
(/root/reference/poisson_shell/program.cc:426-431,
/root/reference/minimal_surface/program.cc).  The shell is a 6-block
cubed sphere (the 6-cell deal.II coarse shell); radii are exact spheres at
every radial coordinate.
"""

from __future__ import annotations

import numpy as np

from .mapped import Block, MappedMesh


def _face_param(k: int, sign: float, dim: int = 3):
    """Mapping factory for the cubed-sphere face (axis k, sign)."""

    def mapping_factory(r_in, r_out):
        def mapping(p):
            # p[..., 0] = radial s, remaining = face params in [0, 1]
            s = p[:, 0]
            uv = 2.0 * p[:, 1:] - 1.0
            cube = np.empty((p.shape[0], dim), dtype=p.dtype)
            rest = [d for d in range(dim) if d != k]
            cube[:, k] = sign
            for j, d in enumerate(rest):
                cube[:, d] = uv[:, j]
            norm = np.sqrt((cube * cube).sum(axis=1))
            r = r_in + s * (r_out - r_in)
            return cube * (r / norm)[:, None]

        return mapping

    return mapping_factory


def hyper_shell(r_in: float = 0.5, r_out: float = 1.0, n_levels: int = 1,
                coarse_radial: int = 1, coarse_tangential: int = 1) -> MappedMesh:
    """6-block spherical shell (cubed sphere x radial extrusion)."""
    blocks = []
    for k in range(3):
        for sign in (-1.0, 1.0):
            mapping = _face_param(k, sign)(r_in, r_out)
            blocks.append(
                Block(cells=(coarse_radial, coarse_tangential, coarse_tangential),
                      mapping=mapping)
            )

    tol = 1e-6 * r_out

    def boundary_fn(x):
        r = np.sqrt((x * x).sum(axis=1))
        return (np.abs(r - r_in) < tol) | (np.abs(r - r_out) < tol)

    return MappedMesh(blocks=blocks, n_levels=n_levels, boundary_fn=boundary_fn)


def hyper_ball_2d(radius: float = 1.0, n_levels: int = 1) -> MappedMesh:
    """5-block disc: central square + 4 transfinite ring blocks (the 2-D
    ``hyper_ball`` layout used by minimal_surface)."""
    R = radius
    a = R * 0.5  # half-width of the central square (matches deal.II ratio ~)

    def center(p):
        return np.stack(
            [a * (2 * p[:, 0] - 1), a * (2 * p[:, 1] - 1)], axis=1
        )

    def ring_factory(quadrant):
        # quadrant 0..3: +x, +y, -x, -y; param: t along the edge, s radial
        phi0 = quadrant * np.pi / 2 - np.pi / 4

        def mapping(p):
            s = p[:, 0]  # 0 = inner square edge, 1 = circle
            t = p[:, 1]
            phi = phi0 + t * (np.pi / 2)
            outer = np.stack([R * np.cos(phi), R * np.sin(phi)], axis=1)
            # inner square edge from corner(phi0) to corner(phi0 + pi/2)
            c0 = np.array([np.cos(phi0), np.sin(phi0)]) * a * np.sqrt(2)
            c1 = np.array(
                [np.cos(phi0 + np.pi / 2), np.sin(phi0 + np.pi / 2)]
            ) * a * np.sqrt(2)
            inner = c0[None, :] * (1 - t)[:, None] + c1[None, :] * t[:, None]
            return inner * (1 - s)[:, None] + outer * s[:, None]

        return mapping

    blocks = [Block(cells=(1, 1), mapping=center, complex_step_ok=True)]
    for q in range(4):
        blocks.append(Block(cells=(1, 1), mapping=ring_factory(q)))

    tol = 1e-6 * R

    def boundary_fn(x):
        r = np.sqrt((x * x).sum(axis=1))
        return np.abs(r - R) < tol

    return MappedMesh(blocks=blocks, n_levels=n_levels, boundary_fn=boundary_fn)
