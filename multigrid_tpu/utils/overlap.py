"""Structural comm/compute-overlap evidence from jaxprs.

The reference hand-schedules its DG cell loop so MPI exchanges overlap
interior compute (/root/reference/common/laplace_operator_dg.h:607-723).
The TPU equivalent is DEPENDENCY STRUCTURE: XLA's latency-hiding scheduler
overlaps a collective with any compute outside the collective's dependency
cone.  This module measures that cone on the traced program — backend-
independent evidence that the overlap is available to the scheduler (real
multi-chip wall-time evidence remains a hardware item, docs/GAPS.md #2).
"""

from __future__ import annotations

import jax

try:  # jax >= 0.4.x moved core types under jax.extend
    from jax.extend import core as _core
except ImportError:  # pragma: no cover
    from jax import core as _core

_FLOP_PRIMS = ("dot_general", "conv_general_dilated")


def _flop_volume(eqn) -> float:
    """2*B*M*N*K for a dot_general (0 for other primitives): eqn COUNTS
    alone mislead — a sub-slab apply has the same sweep eqns as the bulk,
    just smaller."""
    if eqn.primitive.name != "dot_general":
        return 0.0
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    n_free = 1.0
    for i, d in enumerate(rhs.shape):
        if i not in tuple(rc) + tuple(rb):
            n_free *= d
    vol = 2.0 * n_free
    for d in lhs.shape:
        vol *= d
    return vol


def _subjaxprs(eqn):
    for v in eqn.params.values():
        if isinstance(v, _core.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, _core.Jaxpr):
            yield v
        elif isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, _core.ClosedJaxpr):
                    yield x.jaxpr
                elif isinstance(x, _core.Jaxpr):
                    yield x


def _find_jaxpr_with(jaxpr, prim_name: str):
    """Innermost jaxpr whose direct eqns contain ``prim_name``."""
    for eqn in jaxpr.eqns:
        for sub in _subjaxprs(eqn):
            found = _find_jaxpr_with(sub, prim_name)
            if found is not None:
                return found
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == prim_name:
            return jaxpr
    return None


def _count_flops_rec(jaxpr) -> float:
    n = sum(_flop_volume(e) for e in jaxpr.eqns)
    for eqn in jaxpr.eqns:
        for sub in _subjaxprs(eqn):
            n += _count_flops_rec(sub)
    return n


def collective_overlap_report(fn, *args, collective: str = "ppermute") -> dict:
    """Dependency-cone report for the FIRST ``collective`` in ``fn``'s
    jaxpr: how many FLOP ops (dot/conv) the collective must wait for,
    vs the total — the remainder is overlappable by the scheduler.

    Returns dict(flops_in_cone, flops_total, overlappable_fraction).
    """
    jaxpr = jax.make_jaxpr(fn)(*args).jaxpr
    body = _find_jaxpr_with(jaxpr, collective)
    if body is None:
        raise ValueError(f"no {collective} in the traced program")
    eqns = body.eqns
    first = next(i for i, e in enumerate(eqns)
                 if e.primitive.name == collective)
    needed = {v for v in eqns[first].invars
              if not isinstance(v, _core.Literal)}
    cone = set()
    for i in range(first - 1, -1, -1):
        e = eqns[i]
        if any(ov in needed for ov in e.outvars):
            cone.add(i)
            needed.update(v for v in e.invars
                          if not isinstance(v, _core.Literal))
    # flop volume inside cone eqns; nested jaxprs (scans etc.) fully
    n_cone = 0.0
    for i in cone:
        n_cone += _flop_volume(eqns[i])
        for s in _subjaxprs(eqns[i]):
            n_cone += _count_flops_rec(s)
    n_total = _count_flops_rec(body)
    return dict(
        flops_in_cone=n_cone,
        flops_total=n_total,
        overlappable_fraction=(1.0 - n_cone / n_total) if n_total else 0.0,
    )
