#!/bin/bash
# Round-3 sweep, part 17: the RESULTS_R3 final tables, all on the
# committed defaults (5-limb dp transfers; pair FMG prolongation if the
# part-16 A/B won and was defaulted).  Replaces the part-15 tail that was
# cut when the defaults moved mid-sweep: mid-ladder + flagship rows,
# shell ladders past cycle 6, and the setup attribution.
#   setsid nohup bash experiments/remeasure_tpu17.sh > /tmp/sweep17.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep17.pid

wait_tunnel() {
    # a REAL device roundtrip: jax.devices() succeeds even when the data
    # plane is wedged (observed 2026-08-20: D2H transfer hung 30+ min
    # while device enumeration returned instantly)
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

# 1. Flagship row first (headline FMG + CG refresh on final defaults).
phase ladder_flagship17 5400 python experiments/poisson_cube.py \
    4 130000000 140000000 2 2 2 square

# 2. Mid-ladder rows 33/57/90M (the RESULTS_R3 table rows).
phase ladder_mid17 7200 python experiments/poisson_cube.py \
    4 30000000 100000000 2 2 2 square

# 3. Shell ladders (gap #1): resume the df64 ladder past cycle 6, then
#    the pure-double/fourth-kind arm.
phase shell_df64_r17 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6
phase shell_pd_r17 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6 --pure-double

# 4. Flagship setup attribution (eig-estimate compile-vs-run split).
MGT_SETUP_TIMING=1 phase bench_setuptiming17 2700 python bench.py

echo "sweep part 17 complete $(date +%H:%M:%S); logs in $OUT"
