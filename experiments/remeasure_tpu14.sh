#!/bin/bash
# Round-3 sweep, part 14: consolidation of the still-unmeasured phases of
# parts 12 and 13 (the prior session ended before they ran).  Ordering is
# value-at-risk: the hardware bit-exactness gate first (CLAUDE.md rule —
# the MGT_WIN_TRANSFER / MGT_PAIR_FMG / pad-2.0 defaults all touch the
# fused kernels' glue), then the flagship knob A/Bs those defaults depend
# on, then the fmg_profile4 anomaly micro-probe, then the mid-ladder
# padded-window A/B (updates RESULTS_R3's 33-90M rows), then the shell
# ladders (gap #1, pure record-keeping), setup attribution last.
#   setsid nohup bash experiments/remeasure_tpu14.sh > /tmp/sweep14.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep14.pid

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

# 1. Hardware bit-exactness gate incl. the 2.0x-pad shapes.
phase dpwin_gate3 2400 python experiments/debug_dpwin.py

# 2. Flagship A/Bs for the two new windowed-glue knobs (L2 host-guarded).
MGT_WIN_TRANSFER=1 phase bench_wt 2700 python bench.py
MGT_WIN_TRANSFER=1 MGT_PAIR_FMG=1 phase bench_wtpair 2700 python bench.py

# 3. fmg_profile4 anomaly micro-probe (small-level dp residual, L7 dp
#    transfer sides).
phase dpsmall 3600 python experiments/debug_dpsmall.py 128 5

# 4. Mid-ladder padded-window A/B (33-90M rows; padding on = default).
phase ladder_mid_pad 7200 python experiments/poisson_cube.py \
    4 30000000 100000000 2 2 2 square
MGT_WIN_PAD=0 phase ladder_mid_nopad 7200 python experiments/poisson_cube.py \
    4 30000000 100000000 2 2 2 square

# 5. Shell ladders (gap #1): resume the df64 ladder past cycle 6, then
#    the pure-double/fourth-kind arm.
phase shell_df64_resume2 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6
phase shell_pd_df64 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6 --pure-double

# 6. Flagship setup attribution (eig-estimate compile-vs-run split).
MGT_SETUP_TIMING=1 phase bench_setuptiming 2700 python bench.py

echo "sweep part 14 complete $(date +%H:%M:%S); logs in $OUT"
