#!/bin/bash
# Round-4 sweep, part 30: last-hour queue.  The DG Ozaki dp operator's
# exact-accumulation bound caps it at p<=4 in 3-D (7 limbs * 125 terms
# = 875 < 2^10; p=5 is 1512) — the dp table runs p=3..4 and the sp
# table carries the higher degrees.
#   setsid nohup bash experiments/remeasure_tpu30.sh > /tmp/sweep30.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep30.pid

while ps -o cmd= -C python 2>/dev/null | grep -q "poisson_dg.py"; do
    sleep 20
done

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
phase matvec_dg_sp46 2400 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --dtype float32
phase shell_pd_big 4800 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 8 --pure-double
phase fmg_profile30 2700 python experiments/fmg_profile.py 128 5
MGT_PAIR_CG_PAD=99 phase midrow_pvk 4200 \
    python experiments/poisson_cube.py 4 30000000 60000000 2 2 2 square
phase shell_pd_small 4800 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 8 --pure-double
echo "sweep part 30 complete $(date +%H:%M:%S)"
