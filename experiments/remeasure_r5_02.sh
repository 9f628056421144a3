#!/bin/bash
# Round-5 sweep, part 2: (1) the FULL hardware gate after the
# kernel-adjacent r5 changes (exp2 -> pow2_sigma in every limb scale,
# MGT_DP_RESID_FUSED deletion) — no default stays flipped without this
# passing (CLAUDE.md rule); (2) the new fused Mosaic DG kernels: matvec
# rows sp+dp at >=10M dofs vs the face-based oracle (VERDICT r5 #2
# acceptance), then the 13.8M DG-over-CG solve with MGT_DG_PALLAS=1.
# Waits for part 1.
#   setsid nohup bash experiments/remeasure_r5_02.sh > /tmp/sweep_r5_02.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r5}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep_r5_02.pid
if [ -f /tmp/sweep_r5_01.pid ]; then
    while kill -0 "$(cat /tmp/sweep_r5_01.pid)" 2>/dev/null; do sleep 30; done
fi
wait_tunnel() {
    for _ in $(seq 1 180); do
        timeout 300 python -c "
import jax, jax.numpy as jnp
import numpy as np
y = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(np.asarray(y)[0, 0]) == 128.0" 2>/dev/null && return 0
        sleep 60
    done
    exit 1
}
phase() {
    local name=$1 tmo=$2; shift 2
    if [ -e "$OUT/$name.done" ]; then return 0; fi
    wait_tunnel
    echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    local rc=$?
    echo "=== $name exit=$rc $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    [ "$rc" -eq 0 ] && touch "$OUT/$name.done"
}
# 1. full hardware gate (abort everything else if it fails)
if [ ! -e "$OUT/hw_gate_r5a.done" ]; then
    wait_tunnel
    echo "=== hw_gate_r5a $(date +%H:%M:%S)" | tee -a "$OUT/hw_gate_r5a.log"
    bash experiments/hw_gate.sh docs/hw_gate_r5a >>"$OUT/hw_gate_r5a.log" 2>&1
    rc=$?
    echo "=== hw_gate_r5a exit=$rc $(date +%H:%M:%S)" | tee -a "$OUT/hw_gate_r5a.log"
    if [ "$rc" -ne 0 ]; then
        echo "HW GATE FAILED — aborting sweep part 2" | tee -a "$OUT/hw_gate_r5a.log"
        exit "$rc"
    fi
    touch "$OUT/hw_gate_r5a.done"
fi
# 2. fused DG kernel: correctness + throughput at small then >=10M sizes
phase pallas_dg_small 2400 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 4 --steps 9 --dtype float32 --impl pallas
phase pallas_dg_sp 3600 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --dtype float32 --impl pallas
phase pallas_dg_dp 3600 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 4 --steps 15 --dtype float64 --impl pallas
# 3. DG-over-CG 13.8M solve on the kernels (target < 1 s, VERDICT #2)
MGT_DG_PALLAS=1 phase poisson_dg_pallas 4200 python experiments/poisson_dg.py \
    4 10000000 15000000 1 3 3 square 1e-3
echo "sweep r5 part 2 complete $(date +%H:%M:%S)"
