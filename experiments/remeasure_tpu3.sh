#!/bin/bash
# Round-3 sweep, part 3: everything after the perm_mm precision fix
# (bit-exact window relayouts).  Mid-ladder re-run under the final tree,
# the shell ladder phases cut short earlier, the FMG decomposition
# probe, and a final instrumented bench.
#   bash experiments/remeasure_tpu3.sh [outdir]

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

# 1. mid-ladder rows 80/96/112 under the final tree (the earlier rows
#    predate the MatmulTransfer default and the exact relayouts)
phase ladder_mid 5400 python experiments/poisson_cube.py 4 30000000 100000000 2 2 2 square

# 2. shell ladder to >=10M dofs, steady-state CG timing
phase shell2 10000 python experiments/poisson_shell.py 4 13000000 1 3 3 --cycles 11
phase shell_pd 10000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double

# 3. FMG wall-time decomposition at the flagship
phase fmg_profile 3600 python experiments/fmg_profile.py 128 5

# 4. final instrumented bench (setup breakdown after all fixes)
MGT_SETUP_TIMING=1 phase bench_final 3600 python bench.py

echo "sweep complete; logs in $OUT"
