#!/bin/bash
# Round-3 sweep, part 16: pair-native FMG prolongation A/B
# (MGT_PAIR_FMG_PRO, ops/transfer.OzakiWindowedProlongate) on top of the
# part-15 defaults, alone and combined with the reduced-limb dp transfer
# (MGT_DPMM_LIMBS=5, measured in part 15's bench_limbs5).  L2 is
# host-guarded by bench.py; default flips follow the measurements.
#   setsid nohup bash experiments/remeasure_tpu16.sh > /tmp/sweep16.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep16.pid

wait_tunnel() {
    for _ in $(seq 1 30); do
        timeout 180 python -c "import jax; assert jax.devices()" 2>/dev/null \
            && return 0
        echo "tunnel down, retrying in 60s $(date +%H:%M:%S)"
        sleep 60
    done
    echo "tunnel stayed down 30 min; giving up at $(date +%H:%M:%S)"
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

# Pair prolongation vs the committed defaults (which now include the
# 5-limb dp transfer: bench_limbs5 = 0.6596 s is the control).
MGT_PAIR_FMG_PRO=1 phase bench_pairpro 2700 python bench.py

echo "sweep part 16 complete $(date +%H:%M:%S); logs in $OUT"
