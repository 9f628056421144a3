"""Per-level wall-time accounting, mirroring the reference's
``print_wall_times`` table (/root/reference/common/multigrid_solver.h:347-371):
columns smoother / mg_mv / mg_vec / restrict / prolongate / inhomBC per
level, plus coarse-solver totals.  Timings are host wall-clock around
synchronized device calls (the reference's Timer has the same semantics)."""

from __future__ import annotations

import time
from collections import defaultdict

import jax

COLUMNS = ("smoother", "mg_mv", "mg_vec", "restrict", "prolongate", "inhomBC")


class LevelTimings:
    def __init__(self):
        self.t = defaultdict(lambda: defaultdict(float))
        self.coarse_calls = 0
        self.coarse_time = 0.0

    def add(self, level: int, column: str, seconds: float):
        self.t[level][column] += seconds

    def timed(self, level: int, column: str, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.add(level, column, time.perf_counter() - t0)
        return out

    def coarse(self, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.coarse_time += time.perf_counter() - t0
        self.coarse_calls += 1
        return out

    def print_table(self):
        print(f"Coarse solver {self.coarse_calls} times: {self.coarse_time:.6g}")
        print("level  " + "".join(f"{c:<12}" for c in COLUMNS))
        for level in sorted(self.t):
            row = self.t[level]
            print(
                f"L{level:<5d}"
                + "".join(f"{row.get(c, 0.0):<12.4g}" for c in COLUMNS)
            )

    def reset(self):
        self.t.clear()
        self.coarse_calls = 0
        self.coarse_time = 0.0
