#!/bin/bash
# Round-4 sweep, part 24: the general/curved path (VERDICT #1).
#   1. debug_general hardware gates + A/B timings (small->13M)
#   2. shell ladder to 13M, mixed precision (MGT_GENERAL_MXU defaults on)
#   3. shell ladder to 13M, pure-double/fourth-kind
# Waits for sweep part 23 to finish first (one chip, serialized).
#   setsid nohup bash experiments/remeasure_tpu24.sh > /tmp/sweep24.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep24.pid

# serialize behind sweep 23
if [ -f /tmp/sweep23.pid ]; then
    while kill -0 "$(cat /tmp/sweep23.pid)" 2>/dev/null; do
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

# 1. Operator gates + A/B timings (CLAUDE.md hardware rule for new forms).
phase general_gate 3600 python experiments/debug_general.py 2 4 6 8
phase general_gate13m 3600 python experiments/debug_general.py 10

# 1b. Pair-vector glue kernel gates to completion (round-3 advisor
#     medium findings: gate21c truncated before the size=40 dot and the
#     flagship timing tier) + flagship end-to-end A/B.
phase pairvec_gate 3600 python experiments/debug_pairvec.py 24 40 128
MGT_PAIR_VEC_KERNEL=1 phase flag128_pairvec 4800 \
    python experiments/debug_mid33.py 128

# 2. Shell ladder, mixed precision, to 13M (VERDICT #1 "done" criterion).
phase shell_mxu 14000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11

# 3. Shell ladder, pure-double / fourth-kind.
phase shell_mxu_pd 14000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --pure-double

echo "sweep part 24 complete $(date +%H:%M:%S); logs in $OUT"
