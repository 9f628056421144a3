#!/bin/bash
# Round-3 sweep, part 13: hardware gate for the 2.0x-pad default, the
# fmg_profile4 anomaly micro-probe, and the A/Bs for the two new windowed
# glue knobs (MGT_WIN_TRANSFER composed transfers, MGT_PAIR_FMG residual
# handoff).  Interjected between part 12's shell ladder phases; part 12
# is then relaunched (its $OUT/<name>.done markers skip finished phases).
#   setsid nohup bash experiments/remeasure_tpu13.sh > /tmp/sweep13.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep13.pid

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

# Bit-exactness gate incl. the new 2.0x-pad shapes (CLAUDE.md rule).
phase dpwin_gate3 2400 python experiments/debug_dpwin.py

# fmg_profile4 anomaly micro-probe (small-level dp residual, L7 dp
# transfer sides).
phase dpsmall 3600 python experiments/debug_dpsmall.py 128 5

# New-knob A/Bs at the flagship (bench.py guards L2 host-side).
MGT_WIN_TRANSFER=1 phase bench_wt 2700 python bench.py
MGT_WIN_TRANSFER=1 MGT_PAIR_FMG=1 phase bench_wtpair 2700 python bench.py

echo "sweep part 13 complete $(date +%H:%M:%S); logs in $OUT"
