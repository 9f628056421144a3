#!/bin/bash
# Round-5 sweep, part 1: the DG f32 hardware RE-VERIFY (VERDICT r4 #1 —
# the Precision.HIGHEST patch 95f081d was never proven on hardware), in
# strict evidence-value order: sp re-verify, then dp confirm, then the
# tight-tolerance DG solver anchors (VERDICT #9).
#   setsid nohup bash experiments/remeasure_r5_01.sh > /tmp/sweep_r5_01.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r5}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep_r5_01.pid
wait_tunnel() {
    for _ in $(seq 1 120); do
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
# 1. THE re-verify: f32 fused-vs-face-based at p=4..6, all 3 element types.
phase matvec_dg_sp_fix 2400 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --dtype float32
# 2. dp confirm at p=3..4 (the Ozaki exact-accumulation bound) — regression vs r4.
phase matvec_dg_dp_confirm 2400 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 4 --steps 15 --dtype float64
# 3. Tight-tolerance DG solver anchors (VERDICT #9): DG-over-CG and DG-plain
#    hardware rows at rtol 1e-9 with its/rate/L2 recorded.
phase poisson_dg_tight 3600 python experiments/poisson_dg.py \
    4 1000000 3000000 1 3 3 square 1e-9
phase poisson_dg_plain_tight 3600 python experiments/poisson_dg_plain.py \
    3 200000 800000 3 1e-9 --dim 3
echo "sweep r5 part 1 complete $(date +%H:%M:%S)"
