#!/bin/bash
# Round-4 sweep, part 26: corrective + priority-ordered remainder.
# (Part 24's pairvec phases were silently skipped — the script was edited
# WHILE bash was executing it, shifting its read offset; part 25 was
# killed before start and its phases are folded in here.  Never edit a
# running sweep script.)
#   0. exp2 exactness probe (30 s)
#   1. general gates incl. the BLOCK-padded forms (the scatter-free
#      curved path), small cycles then 13M
#   2. pairvec kernel gates + flagship pair-CG A/B (VERDICT #2)
#   3. shell ladders to 13M, mixed + pure-double (VERDICT #1)
#   4. setup-time attribution bench + fresh FMG profile (VERDICT #4/#5)
#   5. DG hardware tier (VERDICT #3)
# Waits for sweep part 24 (one chip, serialized).
#   setsid nohup bash experiments/remeasure_tpu26.sh > /tmp/sweep26.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep26.pid

if [ -f /tmp/sweep24.pid ]; then
    while kill -0 "$(cat /tmp/sweep24.pid)" 2>/dev/null; do
        sleep 30
    done
fi

wait_tunnel() {
    for _ in $(seq 1 120); do
        timeout 180 python -c "
import jax, jax.numpy as jnp
import numpy as np
y = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(np.asarray(y)[0, 0]) == 128.0" 2>/dev/null \
            && return 0
        echo "tunnel down, retrying in 60s $(date +%H:%M:%S)"
        sleep 60
    done
    echo "tunnel stayed down 2 h; giving up at $(date +%H:%M:%S)"
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

# 0. exp2 exactness on TPU (all Ozaki limb splits depend on it).
phase exp2_probe 1200 python experiments/debug_exp2.py

# 1. General-path gates with the block-padded forms.
phase general_gate26 4800 python experiments/debug_general.py 2 4 6 8
phase general_gate26_13m 4800 python experiments/debug_general.py 10

# 2. Pairvec kernel gates to completion + flagship pair-CG A/B.
phase pairvec_gate 3600 python experiments/debug_pairvec.py 24 40 128
MGT_PAIR_VEC_KERNEL=1 phase flag128_pairvec 4800 \
    python experiments/debug_mid33.py 128

# 3. Shell ladders to 13M (block mode defaults on TPU).
phase shell_blk 14000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11
phase shell_blk_pd 14000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --pure-double

# 4. Setup attribution + fresh FMG decomposition.
MGT_SETUP_TIMING=1 phase bench_setup26 2700 python bench.py
phase fmg_profile26 4800 python experiments/fmg_profile.py 128 5

# 5. DG hardware tier.
phase matvec_dg_dp 7200 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 7 --steps 15 --impl ozaki
phase matvec_dg_sp 7200 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 7 --steps 15 --dtype float32
phase poisson_dg_tpu 10000 python experiments/poisson_dg.py \
    4 0 30000000 1 3 3 square 1e-3
phase poisson_dg_plain_tpu 7200 python experiments/poisson_dg_plain.py \
    3 0 4000000 3 1e-3 --dim 3

echo "sweep part 26 complete $(date +%H:%M:%S); logs in $OUT"
