#!/bin/bash
# Round-3 sweep, part 4: the zero-padded window geometry on hardware.
#   bash experiments/remeasure_tpu4.sh [outdir]

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

# 1. bit-exactness of the padded kernels vs the XLA oracle (MANDATORY
#    gate before any padded benchmark claims — CLAUDE.md hardware lesson)
phase dpwin_padded 3600 python experiments/debug_dpwin.py

# 2. padded-kernel mid-ladder (fused kernels now engage at 80^3..112^3;
#    A/B against ladder_mid.log = same tree minus padding)
phase ladder_mid_pad 5400 python experiments/poisson_cube.py 4 30000000 100000000 2 2 2 square

# 3. node-grid dp entries via the fused kernel (FMG residuals ride the
#    kernel; conversions are exact since the perm_mm precision fix)
MGT_DP_NODE_VIA_WIN=1 MGT_SETUP_TIMING=1 phase bench_nodewin 3600 python bench.py

echo "sweep part 4 complete; logs in $OUT"
