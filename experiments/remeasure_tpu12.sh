#!/bin/bash
# Round-3 sweep, part 12: part 11 reordered after its bench A/B phases
# completed.  The two *diagnostic* phases (FMG decomposition, setup
# attribution) move ahead of the long measurement ladders: their output
# feeds code changes that still need hardware re-measurement this round,
# while the shell/mid-ladder runs are pure record-keeping.  Phases share
# part 11's $OUT/<name>.done markers, so nothing completed re-runs.
#   setsid nohup bash experiments/remeasure_tpu12.sh > /tmp/sweep12.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep12.pid

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

# Hardware bit-exactness gate first (CLAUDE.md rule: re-run after any
# change near the fused kernels — the nodewin/dpmm default flips route
# more of the solve through them).
phase dpwin_gate2 2400 python experiments/debug_dpwin.py

# Diagnostics next (feed this round's remaining optimization work).
phase fmg_profile4 4800 python experiments/fmg_profile.py 128 5
MGT_SETUP_TIMING=1 phase bench_setuptiming 2700 python bench.py

# Remaining bench A/Bs if part 11 was cut before them.
MGT_DP_NODE_VIA_WIN=1 phase bench_nodewin2 2700 python bench.py
MGT_DP_MM_TRANSFER=1 phase bench_dpmm 2700 python bench.py
MGT_DP_NODE_VIA_WIN=1 MGT_DP_MM_TRANSFER=1 phase bench_combo 2700 python bench.py

# The flagship ladder's 64^3-cell mid-levels fall back to the XLA node
# paths (pad ratio 2.0 > the 1.6 default) — admit them and measure.
MGT_WIN_PAD=2.0 MGT_DP_NODE_VIA_WIN=1 phase bench_pad2 2700 python bench.py

# Measurement ladders.
phase shell_df64_resume 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6
phase shell_pd_df64 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6 --pure-double
phase ladder_mid_pad 7200 python experiments/poisson_cube.py \
    4 30000000 100000000 2 2 2 square
MGT_WIN_PAD=0 phase ladder_mid_nopad 7200 python experiments/poisson_cube.py \
    4 30000000 100000000 2 2 2 square

echo "sweep part 12 complete $(date +%H:%M:%S); logs in $OUT"
