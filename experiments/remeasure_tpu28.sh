#!/bin/bash
# Round-4 sweep, part 28: shell ladder completion with the crash-proofed
# driver (the per-level timing table is telemetry and no longer fatal —
# shell_blk cycle 10 lost its FMG/CG row to a remote-compile failure
# inside the table).
#   1. mixed ladder, cycle 10 only (the 12.7M headline row)
#   2. pure-double ladder, big cycles first (8..10), then backfill 0..7
# Waits for sweep part 27.
#   setsid nohup bash experiments/remeasure_tpu28.sh > /tmp/sweep28.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep28.pid

if [ -f /tmp/sweep27.pid ]; then
    while kill -0 "$(cat /tmp/sweep27.pid)" 2>/dev/null; do
        sleep 30
    done
fi

wait_tunnel() {
    for _ in $(seq 1 120); do
        timeout 180 python -c "
import jax, jax.numpy as jnp
import numpy as np
y = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(np.asarray(y)[0, 0]) == 128.0" 2>/dev/null \
            && return 0
        echo "tunnel down, retrying in 60s $(date +%H:%M:%S)"
        sleep 60
    done
    echo "tunnel stayed down 2 h; giving up at $(date +%H:%M:%S)"
    exit 1
}

phase() {  # phase <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    if [ -e "$OUT/$name.done" ]; then
        echo "=== $name already done, skipping"; return 0
    fi
    wait_tunnel
    echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" \
        | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    local rc=$?
    echo "=== $name exit=$rc $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    [ "$rc" -eq 0 ] && touch "$OUT/$name.done"
}

# 1. The 12.7M mixed row.
phase shell_blk_c10 7200 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 10

# 2. Pure-double: big rows first, then backfill.
phase shell_pd_big 10000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 8 --pure-double
phase shell_pd_small 7200 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 8 --pure-double

echo "sweep part 28 complete $(date +%H:%M:%S); logs in $OUT"
