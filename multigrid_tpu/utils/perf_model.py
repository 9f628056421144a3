"""Matvec throughput models (DoFs/s, GFlop/s, GB/s).

The reference prints an arithmetic+bandwidth model with every DG benchmark
(/root/reference/common/laplace_operator_dg.h:1970-1986,
/root/reference/matvec_dg/program.cc:176-205, poisson_dg/program.cc:266-309).
The op counts here match THIS pipeline (batched dense/tensor contractions on
the MXU, no even-odd), so GFlop/s is honest for the TPU design rather than a
copy of the CPU model.
"""

from __future__ import annotations

import numpy as np


def dg_matvec_model(dim: int, degree: int, n_cells: int, kind: str,
                    itemsize: int, n_dofs: int, seconds: float) -> dict:
    """Throughput model for the fused SIP-DG operator (ops/dg.py)."""
    n = degree + 1
    N = n**dim
    sweeps = 2 * dim + (0 if kind == "gauss" else 2 * dim)
    ops_cell = sweeps * 2 * N * n + (2 * dim * dim + dim) * N
    ops_face = 2 * dim * ((dim + 1) * 2 * n ** (dim - 1) * n
                          + 10 * n ** (dim - 1))
    ops = n_cells * (ops_cell + ops_face)
    return dict(
        seconds=seconds,
        dofs_per_s=n_dofs / seconds,
        gflops=1e-9 * ops / seconds,
        gbs=1e-9 * n_dofs * itemsize * 3 / seconds,
        ops_per_dof=ops / n_dofs,
    )


def print_matvec_details(label: str, model: dict, n_dofs: int, file=None):
    """One reference-style matvec telemetry line
    (cf. print_matvec_details, poisson_dg/program.cc:266-309)."""
    print(f"{label:14s} n_dof {n_dofs:>11d}  {model['seconds']:.5f} s  "
          f"DoFs/s {model['dofs_per_s']:.4g}  GFlop/s {model['gflops']:.4g}  "
          f"GB/s {model['gbs']:.4g}  ops/dof {model['ops_per_dof']:.1f}",
          file=file)
