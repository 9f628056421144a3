"""Device-profiler integration (aux subsystem: tracing/profiling).

The reference instruments with hand timers + optional LIKWID hardware
counters (/root/reference/cmake/macro_pick_up_benchmark.cmake:10-16,
poisson_cube/program.cc:281-355).  The TPU-native equivalents:
:mod:`multigrid_tpu.utils.timing` for the per-level wall-time tables, and
this helper for full XLA device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/multigrid_tpu_trace"):
    """Trace all device activity in the block; prints the trace location."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        print(f"# device trace written to {logdir} "
              "(tensorboard --logdir or ui.perfetto.dev)")


def profile_fn(fn, *args, n_warmup: int = 1, n_runs: int = 5,
               logdir: str = "/tmp/multigrid_tpu_trace"):
    """Run ``fn`` under the device profiler after warmup; returns best
    wall time per run."""
    f = jax.jit(fn)
    for _ in range(n_warmup):
        jax.block_until_ready(f(*args))
    best = float("inf")
    with device_trace(logdir):
        for _ in range(n_runs):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
    return best
