#!/bin/bash
# Round-3 sweep, part 10: the two measurements parts 4-7 never reached
# (tunnel drops).  Run AFTER part 9 (which owns the FMG knob A/Bs and the
# shell df64 ladder).
#   1. Mid-ladder rows with the zero-padded windowed kernels engaged
#      (RESULTS_R3's 33-90M rows are XLA-fallback; padding is the default
#      since 539237f and hardware-bit-exact at cx 80/96/112 per
#      dpwin_gate.log, but no solve-level A/B exists yet).
#   2. Setup-time attribution: the warm 104.8 s flagship setup has a
#      30.2 s eig-estimate tick; MGT_SETUP_TIMING splits compile vs run
#      per level so the next fix targets the right side.
#   bash experiments/remeasure_tpu10.sh [outdir]

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

# 1. Padded-kernel mid-ladder (fused kernels engage at 80^3..112^3 cells;
#    compare against the XLA-fallback rows in RESULTS_R3's ladder table).
phase ladder_mid_pad 7200 python experiments/poisson_cube.py 4 30000000 100000000 2 2 2 square

# 2. Same rows with padding disabled = in-place A/B control (the recorded
#    rows predate the MatmulTransfer flip, so re-measure both arms).
MGT_WIN_PAD=0 phase ladder_mid_nopad 7200 python experiments/poisson_cube.py 4 30000000 100000000 2 2 2 square

# 3. Flagship setup attribution (eig-estimate compile-vs-run split).
MGT_SETUP_TIMING=1 phase bench_setuptiming 2700 python bench.py

echo "sweep part 10 complete; logs in $OUT"
