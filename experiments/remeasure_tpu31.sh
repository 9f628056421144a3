#!/bin/bash
# Round-4 sweep, part 31: the final minutes — one big-row DG solve
# (size 48 = 13.8M DG dofs, >= the VERDICT #3 10M tier) instead of the
# compile-bound small ladder, the DG matvec tables, then the pure-double
# shell big rows until the round boundary cuts.
#   setsid nohup bash experiments/remeasure_tpu31.sh > /tmp/sweep31.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep31.pid
sleep 10

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
    exit 1
}

phase() {
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

phase matvec_dg_dp34 2400 python experiments/matvec_dg.py \
    --min-degree 3 --max-degree 4 --steps 15 --impl ozaki
phase poisson_dg_big 2400 python experiments/poisson_dg.py \
    4 13000000 15000000 1 3 3 square 1e-3
phase matvec_dg_sp46 2400 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --dtype float32
phase shell_pd_big 6000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 8 --pure-double
phase fmg_profile31 2700 python experiments/fmg_profile.py 128 5
echo "sweep part 31 complete $(date +%H:%M:%S)"
