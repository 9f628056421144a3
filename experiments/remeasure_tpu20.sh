#!/bin/bash
# Round-3 sweep, part 20 (chain after the part-19 bisect):
#   1. two more bisect configs for the mid-ladder analyze/CG regression
#      (MGT_DP_NODE_VIA_WIN=0: node-entry dp matvec back on chunked XLA —
#      the single knob common to BOTH broken paths; sp dense control)
#   2. sweep part 18 (fused-variant gates + A/Bs + kernel micro-profile)
#   3. shell df64 ladder resume from cycle 9
#   setsid nohup bash experiments/remeasure_tpu20.sh > /tmp/sweep20.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep20.pid

# wait for sweep 19 to finish (poll its pid)
if [ -f /tmp/sweep19.pid ]; then
    while kill -0 "$(cat /tmp/sweep19.pid)" 2>/dev/null; do sleep 30; done
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

phase() {
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

# F. node-entry dp matvec via chunked XLA (kernel still serves pair paths)
MGT_DP_NODE_VIA_WIN=0 phase mid33_noviawin 1800 \
    python experiments/debug_mid33.py 80

bash experiments/remeasure_tpu18.sh "$OUT"

phase shell_df64_r20 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 9

echo "sweep part 20 complete $(date +%H:%M:%S); logs in $OUT"
