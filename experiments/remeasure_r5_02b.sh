#!/bin/bash
# Round-5 sweep, part 2b: DG-kernel fault bisect + retry of the part-2
# pallas phases (part 2 died on the first kernel fault; the carry-store
# fix is in).  Parts 3/4 are SIGSTOPPED while this runs; this script
# CONTs them on exit so the queue continues unattended.
#   setsid nohup bash experiments/remeasure_r5_02b.sh > /tmp/sweep_r5_02b.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r5}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep_r5_02b.pid
resume() {
    for f in /tmp/sweep_r5_03.pid /tmp/sweep_r5_04.pid; do
        [ -f "$f" ] && kill -CONT "$(cat "$f")" 2>/dev/null
    done
}
trap resume EXIT
wait_tunnel() {
    for _ in $(seq 1 180); do
        timeout 300 python -c "
import jax, jax.numpy as jnp
import numpy as np
y = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(np.asarray(y)[0, 0]) == 128.0" 2>/dev/null && return 0
        sleep 45
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
# 1. staged bisect (small, fast) — tells us WHERE the kernel faults
phase dg_bisect 1800 python experiments/debug_pallas_dg.py 4 4
# 2. if the carry fix was it, these now measure the kernels
if [ -e "$OUT/dg_bisect.done" ]; then
    phase pallas_dg_small2 2400 python experiments/matvec_dg.py \
        --min-degree 4 --max-degree 4 --steps 9 --dtype float32 --impl pallas
    phase pallas_dg_sp 3600 python experiments/matvec_dg.py \
        --min-degree 4 --max-degree 6 --steps 15 --dtype float32 --impl pallas
    phase pallas_dg_dp 3600 python experiments/matvec_dg.py \
        --min-degree 3 --max-degree 4 --steps 15 --dtype float64 --impl pallas
    MGT_DG_PALLAS=1 phase poisson_dg_pallas 4200 python experiments/poisson_dg.py \
        4 10000000 15000000 1 3 3 square 1e-3
fi
echo "sweep r5 part 2b complete $(date +%H:%M:%S)"
