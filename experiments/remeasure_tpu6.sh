#!/bin/bash
# Round-3 sweep, part 6: everything parts 4+5 queued but never ran.
# Order: mandatory bit-exactness gate, then the FMG decomposition probe
# (its findings feed same-session optimization), then the shell ladder
# (GAPS #1), then the padded mid-ladder A/B and node-via-win bench.
#   bash experiments/remeasure_tpu6.sh [outdir]

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

# 1. bit-exactness of the fused kernels (incl. padded geometry) vs the
#    XLA oracle — MANDATORY gate before any benchmark claims below.
phase dpwin_gate 2400 python experiments/debug_dpwin.py

# 2. FMG wall-time decomposition (per-level donated-carry jit chains).
phase fmg_profile2 3000 python experiments/fmg_profile.py 128 5

# 3. Shell ladder on the fixed tree (GAPS #1): mixed then pure-double.
phase shell3 9000 python experiments/poisson_shell.py 4 13000000 1 3 3 --cycles 11
phase shell_pd2 9000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double

# 4. Padded-window mid-ladder (fused kernels engage at 80^3..112^3).
phase ladder_mid_pad 5400 python experiments/poisson_cube.py 4 30000000 100000000 2 2 2 square

# 5. Node-grid dp entries via the fused kernel, setup timing split.
MGT_DP_NODE_VIA_WIN=1 MGT_SETUP_TIMING=1 phase bench_nodewin 3600 python bench.py

echo "sweep part 6 complete; logs in $OUT"
