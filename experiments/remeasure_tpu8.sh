#!/bin/bash
# Round-3 sweep, part 8: shell ladder at scale on the df64 pair dp path
# (GeneralLaplaceDF64/GeneralTransferDF64; the native-f64 general path rode
# XLA's ~100x f64 emulation — 33 s CG at 1.6M dofs and a TPU worker crash
# at 3.2M in part 3).  Mixed and pure-double/fourth-kind phases, then the
# FMG decomposition probe that timed out in part 3.
#   bash experiments/remeasure_tpu8.sh [outdir]

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

phase shell_df64 12000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11
phase shell_pd_df64 12000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double
phase fmg_profile4 4800 python experiments/fmg_profile.py 128 5

echo "sweep complete; logs in $OUT"
