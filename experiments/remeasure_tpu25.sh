#!/bin/bash
# Round-4 sweep, part 25: setup-time attribution (VERDICT #4) + the DG
# family hardware tier (VERDICT #3 — zero TPU numbers existed for DG).
#   1. bench.py with MGT_SETUP_TIMING=1 (new u_bc[0] sub-ticks)
#   2. matvec_dg dp (Ozaki MXU path) p=3..7, 3 element types, 32^3 cells
#   3. matvec_dg sp (fused f32)      p=3..7, 3 element types
#   4. poisson_dg end-to-end 3-D DG-over-CG ladder to ~27M dofs
#   5. poisson_dg_plain 3-D pure-DG h-MG, 3 element types
# Waits for sweep part 24 (one chip, serialized).
#   setsid nohup bash experiments/remeasure_tpu25.sh > /tmp/sweep25.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep25.pid

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

# 0. Is the TPU's f32 exp2 exact on integers?  (Every Ozaki limb split
#    depends on it; XLA:CPU's is NOT — see experiments/debug_exp2.py.)
phase exp2_probe 1200 python experiments/debug_exp2.py

# 1. Setup-time attribution with the new sub-ticks.
MGT_SETUP_TIMING=1 phase bench_setup25 2700 python bench.py

# 1b. Fresh FMG decomposition at the post-cy16 defaults (VERDICT #5:
#     find the remaining ~100 ms toward 0.55 s).
MGT_CY_CHUNK=16 phase fmg_profile25 4800 \
    python experiments/fmg_profile.py 128 5

# 2+3. DG matvec hardware tier (reference flagship kernel showcase,
#      /root/reference/matvec_dg/program.cc:176-207).
phase matvec_dg_dp 7200 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 7 --steps 15 --impl ozaki
phase matvec_dg_sp 7200 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 7 --steps 15 --dtype float32

# 4. End-to-end 3-D DG-over-CG solve ladder (>=10M dofs tier).
phase poisson_dg_tpu 10000 python experiments/poisson_dg.py \
    4 0 30000000 1 3 3 square 1e-3

# 5. Pure-DG h-MG, 3-D, all three element types.
phase poisson_dg_plain_tpu 7200 python experiments/poisson_dg_plain.py \
    3 0 4000000 3 1e-3 --dim 3

echo "sweep part 25 complete $(date +%H:%M:%S); logs in $OUT"
