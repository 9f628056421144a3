#!/bin/bash
# Round-5 sweep, part 4: (1) block-path stage profile (drives the
# VERDICT #3 fused-kernel decision), (2) MGT_CHEB_ALIAS FMG speed A/B
# (hardware bit-exactness landed r4; the speed run never did), at the
# shipped r5 defaults.  Waits for part 3.
#   setsid nohup bash experiments/remeasure_r5_04.sh > /tmp/sweep_r5_04.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r5}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep_r5_04.pid
if [ -f /tmp/sweep_r5_03.pid ]; then
    while kill -0 "$(cat /tmp/sweep_r5_03.pid)" 2>/dev/null; do sleep 30; done
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
phase block_profile6 2400 python experiments/block_profile.py 6
phase block_profile8 3600 python experiments/block_profile.py 8
MGT_CHEB_ALIAS=1 phase bench_chebalias_r5 3600 python bench.py
phase bench_r5_default 3600 python bench.py
echo "sweep r5 part 4 complete $(date +%H:%M:%S)"
