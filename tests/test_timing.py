"""Per-level timing table (print_wall_times analogue)."""

import numpy as np

from experiments.poisson_cube import build_solver
from multigrid_tpu.mesh.brick import poisson_cube_mesh
from multigrid_tpu.utils.timing import LevelTimings


def test_timed_vcycle(capsys):
    s = build_solver(poisson_cube_mesh(4), degree=2, n_cycles=1)
    tm = LevelTimings()
    d = s.rhs[s.maxlevel].astype(s.v_dtype)
    upd = s.v_cycle_timed(s.maxlevel, d, 1, tm)
    ref = s.v_cycle(s.maxlevel, d, 1)
    assert np.allclose(np.asarray(upd), np.asarray(ref), atol=1e-5)
    assert tm.coarse_calls == 1
    assert all(tm.t[l]["smoother"] > 0 for l in tm.t)
    tm.print_table()
    out = capsys.readouterr().out
    assert "Coarse solver" in out and "smoother" in out
