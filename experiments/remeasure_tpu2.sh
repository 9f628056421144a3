#!/bin/bash
# Continuation of the round-3 TPU re-measurement sweep (remeasure_tpu.sh):
# the phases cut short by the 2026-08-18 session drop, re-run on the tree
# that has the pipelined-FMG timing rows, the MatmulTransfer TPU default,
# and the shell CG best-of-3 fix.
#   bash experiments/remeasure_tpu2.sh [outdir]

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}

phase() {  # phase <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
}

timeout 300 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down; aborting"; exit 1; }

# 1. small-size ladder with rtt probe + pipelined rows (the 0.96x-at-4.17M
#    item: fmg_time includes one ~30 ms tunnel round trip per solve)
phase ladder_small2 3600 python experiments/poisson_cube.py 4 3000000 20000000 2 2 2 square

# 2. the flagship 135M ladder row (ladder_large2 reached its setup before
#    the drop; cycles 20-22 are complete in that log)
phase ladder_flagship 5400 python experiments/poisson_cube.py 4 100000000 140000000 2 2 2 square

# 3. shell ladder to >=10M dofs, steady-state CG timing (best-of-3)
phase shell2 10000 python experiments/poisson_shell.py 4 13000000 1 3 3 --cycles 11
phase shell_pd 10000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double

echo "sweep complete; logs in $OUT"
