#!/bin/bash
# Round-4 sweep, part 32: leftovers — sp DG matvec RE-VERIFY after the
# Precision.HIGHEST patch (it failed its own hardware verify at bf16
# class, matvec_dg_sp46.log), then profile/midrow/pd-small as budget
# allows.  Waits for part 31.
#   setsid nohup bash experiments/remeasure_tpu32.sh > /tmp/sweep32.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep32.pid
if [ -f /tmp/sweep31.pid ]; then
    while kill -0 "$(cat /tmp/sweep31.pid)" 2>/dev/null; do sleep 30; done
fi
wait_tunnel() {
    for _ in $(seq 1 120); do
        timeout 180 python -c "
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
phase matvec_dg_sp_fix 2400 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --dtype float32
MGT_PAIR_CG_PAD=99 phase midrow_pvk 4200 \
    python experiments/poisson_cube.py 4 30000000 60000000 2 2 2 square
phase fmg_profile32 2700 python experiments/fmg_profile.py 128 5
phase shell_pd_small 4800 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 8 --pure-double
echo "sweep part 32 complete $(date +%H:%M:%S)"
