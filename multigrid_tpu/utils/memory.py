"""Device-memory telemetry.

TPU-native analogue of the reference's MemoryConsumption reporting
(/root/reference/poisson_cube/program.cc:273-279: MGTransfer / level vector /
operator memory per rank): per-level byte accounting of the solver's live
arrays plus the backend allocator's view (``device.memory_stats``, available
on TPU; CPU returns {}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def device_memory_stats() -> dict:
    """Allocator stats of the first addressable device (bytes).  Keys vary
    by backend; TPU reports bytes_in_use / peak_bytes_in_use / limit."""
    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return dict(stats)


def _nbytes(x) -> int:
    if hasattr(x, "nbytes"):
        return int(x.nbytes)
    return 0


def solver_memory_report(solver) -> dict:
    """Byte accounting per level for a MultigridSolver-like object
    (rhs + boundary vectors, operator constants, smoother diagonals)."""
    per_level = []
    for l in range(len(solver.grids)):
        row = dict(level=l, dofs=int(solver.grids[l].n_dofs))
        ubc = solver.u_bc[l]   # dense array (general solver) or face slabs
        ubc_bytes = (sum(_nbytes(f) for f in ubc) if isinstance(ubc, list)
                     else _nbytes(ubc))
        row["vectors"] = _nbytes(solver.rhs[l]) + ubc_bytes
        op = solver.sp_ops[l] if hasattr(solver, "sp_ops") else solver.ops[l]
        row["operator"] = sum(
            _nbytes(v) for v in vars(op).values() if hasattr(v, "nbytes")
        )
        per_level.append(row)
    total = sum(r["vectors"] + r["operator"] for r in per_level)
    return dict(levels=per_level, total_bytes=total,
                allocator=device_memory_stats())


def print_memory_report(solver, file=None) -> dict:
    rep = solver_memory_report(solver)
    mb = 1.0 / (1024 * 1024)
    print("Memory usage (MB):", file=file)
    for r in rep["levels"]:
        print(f"  level {r['level']:2d}  dofs {r['dofs']:>12d}  "
              f"vectors {r['vectors']*mb:8.1f}  operator {r['operator']*mb:8.1f}",
              file=file)
    alloc = rep["allocator"]
    if alloc:
        print(f"  device: in_use {alloc.get('bytes_in_use', 0)*mb:.1f} MB, "
              f"peak {alloc.get('peak_bytes_in_use', 0)*mb:.1f} MB, "
              f"limit {alloc.get('bytes_limit', 0)*mb:.1f} MB", file=file)
    return rep
