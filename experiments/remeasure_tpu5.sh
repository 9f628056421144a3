#!/bin/bash
# Round-3 sweep, part 5: shell ladder on the HTTP-413-fixed tree, and the
# FMG decomposition probe with operands-as-arguments.
#   bash experiments/remeasure_tpu5.sh [outdir]

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

phase fmg_profile2 3600 python experiments/fmg_profile.py 128 5
phase shell3 12000 python experiments/poisson_shell.py 4 13000000 1 3 3 --cycles 11
phase shell_pd2 12000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double

echo "sweep part 5 complete; logs in $OUT"
