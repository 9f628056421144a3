#!/bin/bash
# Round-3 sweep, part 15: runs after part 14's mid-ladder A/B arms.  The
# part-14 tail (shells, setup attribution) was skip-marked and moved here
# BEHIND the profiling phases: the 2026-08-19 default flips
# (MGT_WIN_TRANSFER / MGT_PAIR_FMG, commit 26c3f1a) change the FMG
# program, so a fresh per-level decomposition and a default-path bench
# must land early enough to drive further optimization this round.
#   setsid nohup bash experiments/remeasure_tpu15.sh > /tmp/sweep15.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep15.pid

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

# 1. Flagship bench on the committed defaults (confirms the 0.7075 s
#    configuration as-committed; L2 host-guarded).
phase bench_default15 2700 python bench.py

# 2. Pad-cap control: MGT_WIN_PAD=1.6 rejects the 2.0x-padded 64-cell L6
#    (regenerates the lost bench_pad2.log evidence behind _win_cx_ok's
#    docstring, now on the new glue defaults).
MGT_WIN_PAD=1.6 phase bench_pad16ctl 2700 python bench.py

# 3. Fresh per-level FMG decomposition under the new defaults.
phase fmg_profile5 4800 python experiments/fmg_profile.py 128 5

# 3b. Reduced-limb dp transfer A/B (MGT_DPMM_LIMBS=5: 2^-35 per line,
#     contracted by the V-cycle to ~6e-13 in the FMG solution; the L7
#     prolongate's triangular passes drop 28 -> 15).  L2 host-guarded.
MGT_DPMM_LIMBS=5 phase bench_limbs5 2700 python bench.py

# 4. Mid-ladder on the committed defaults (the RESULTS_R3 table rows).
phase ladder_mid_def15 7200 python experiments/poisson_cube.py \
    4 30000000 100000000 2 2 2 square

# 4b. Flagship row on the committed defaults: refreshes the CG number
#     (the pair-CG preconditioner V-cycle rides the composed windowed
#     transfers too; the recorded 3.464 s predates them).
phase ladder_flagship15 5400 python experiments/poisson_cube.py \
    4 130000000 140000000 2 2 2 square

# 5. Shell ladders (gap #1): resume the df64 ladder past cycle 6, then
#    the pure-double/fourth-kind arm.
phase shell_df64_r15 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6
phase shell_pd_r15 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 6 --pure-double

# 6. Flagship setup attribution (eig-estimate compile-vs-run split).
MGT_SETUP_TIMING=1 phase bench_setuptiming15 2700 python bench.py

echo "sweep part 15 complete $(date +%H:%M:%S); logs in $OUT"
