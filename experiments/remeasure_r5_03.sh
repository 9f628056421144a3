#!/bin/bash
# Round-5 sweep, part 3 — priority-ordered by EVIDENCE VALUE (the r4
# round-boundary lesson, VERDICT weak #8):
#   1. shell PURE-DOUBLE ladder (VERDICT #3: zero pd hardware rows exist)
#   2. canonical mid-ladder rows at shipped defaults (VERDICT #6)
#   3. FMG re-profile at r5 defaults (VERDICT #5)
#   4. setup attribution with the new transfers/masks ticks (VERDICT #4)
#   5. matvec_dg_cheby + solver_dg first TPU rows (VERDICT weak #7)
#   6. dp DG above p=4 via the df64 operator (VERDICT #8)
# Waits for part 2.
#   setsid nohup bash experiments/remeasure_r5_03.sh > /tmp/sweep_r5_03.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r5}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep_r5_03.pid
if [ -f /tmp/sweep_r5_02.pid ]; then
    while kill -0 "$(cat /tmp/sweep_r5_02.pid)" 2>/dev/null; do sleep 30; done
fi
wait_tunnel() {
    for _ in $(seq 1 180); do
        timeout 300 python -c "
import jax, jax.numpy as jnp
import numpy as np
y = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(np.asarray(y)[0, 0]) == 128.0" 2>/dev/null && return 0
        sleep 60
    done
    exit 1
}
phase() {
    local name=$1 tmo=$2; shift 2
    if [ -e "$OUT/$name.done" ]; then return 0; fi
    wait_tunnel
    echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    local rc=$?
    echo "=== $name exit=$rc $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    [ "$rc" -eq 0 ] && touch "$OUT/$name.done"
}
# 1. pure-double shell ladders: small first (guaranteed rows), then big
phase shell_pd_small 4800 python experiments/poisson_shell.py \
    4 2000000 1 3 3 --cycles 6 --pure-double
phase shell_pd_big 7200 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 8 --min-cycle 7 --pure-double
# 2. canonical mid-ladder rows at shipped defaults (pair kernels ON)
phase midrow_pvk 4200 python experiments/poisson_cube.py \
    4 30000000 60000000 2 2 2 square
# 3. FMG profile at r5 defaults
phase fmg_profile_r5 2700 python experiments/fmg_profile.py 128 5
# 4. setup attribution (new transfers/masks ticks)
MGT_SETUP_TIMING=1 phase bench_setup_r5 3600 python bench.py
# 5. first TPU rows for the two uncovered benchmark drivers
phase matvec_dg_cheby_tpu 3600 python experiments/matvec_dg_cheby.py \
    --degrees 3 4 5 --steps 15
phase solver_dg_tpu 3600 python experiments/solver_dg.py \
    --degrees 2 3 4 --steps 12
# 6. dp DG above the p<=4 Ozaki bound: df64 operator hardware verify row
phase matvec_dg_df64_p6 3600 python experiments/matvec_dg.py \
    --min-degree 6 --max-degree 6 --steps 12 --dtype float64 --impl df64
echo "sweep r5 part 3 complete $(date +%H:%M:%S)"
