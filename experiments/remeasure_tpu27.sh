#!/bin/bash
# Round-4 sweep, part 27: headline CG A/B + retries.
#   1. flagship cube row (FMG reps + best-of-N CG) with the pair-vector
#      kernels ON vs OFF — the VERDICT #2 "CG <= 2.5 s" evidence
#   2. mid-ladder rows with kernels ON and the pad gate raised
#      (VERDICT #6: does pair-CG now win at 33/57M?)
#   3. 13M block general gate retry (symmetry-gated, flat forms skipped)
# Waits for sweep part 26.
#   setsid nohup bash experiments/remeasure_tpu27.sh > /tmp/sweep27.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep27.pid

if [ -f /tmp/sweep26.pid ]; then
    while kill -0 "$(cat /tmp/sweep26.pid)" 2>/dev/null; do
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

# 1. Flagship cube row: pairvec kernels ON vs OFF (best-of-N CG).
MGT_PAIR_VEC_KERNEL=1 phase flagrow_pvk 5400 python experiments/poisson_cube.py \
    4 130000000 140000000 2 2 2 square
phase flagrow_ctl 5400 python experiments/poisson_cube.py \
    4 130000000 140000000 2 2 2 square

# 2. Mid-ladder rows, kernels ON + pad gate raised (pair-CG forced).
MGT_PAIR_VEC_KERNEL=1 MGT_PAIR_CG_PAD=99 phase midrow_pvk 7200 \
    python experiments/poisson_cube.py 4 30000000 60000000 2 2 2 square

# 3. 13M block general gate retry.
phase general_gate27_13m 4800 python experiments/debug_general.py 10

echo "sweep part 27 complete $(date +%H:%M:%S); logs in $OUT"
