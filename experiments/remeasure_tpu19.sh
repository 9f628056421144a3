#!/bin/bash
# Round-3 sweep, part 19: bisect the mid-ladder analyze/CG regression
# (ladder_mid17: analyze reduction 0.98 vs 0.14, cg_L2error 0.18 vs 4e-9
# at 33M/57M).  debug_mid33.py prints fmg L2 / analyze reduction /
# cg branch / cg L2 for one row; knob A/Bs isolate the culprit default.
#   setsid nohup bash experiments/remeasure_tpu19.sh > /tmp/sweep19.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep19.pid

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

# A. repro on committed defaults
phase mid33_defaults 1800 python experiments/debug_mid33.py 80
# B. dp transfer back to 7 limbs (92233ee default flip)
MGT_DPMM_LIMBS=7 phase mid33_limbs7 1800 python experiments/debug_mid33.py 80
# C. composed windowed V-cycle transfers off (26c3f1a default flip)
MGT_WIN_TRANSFER=0 phase mid33_nowt 1800 python experiments/debug_mid33.py 80
# D. pair CG forced on at the padded row (faaa98f gate bypass)
MGT_PAIR_CG_PAD=99 phase mid33_paircg 1800 python experiments/debug_mid33.py 80
# E. pair-native FMG prolongation off (0958643 default flip)
MGT_PAIR_FMG_PRO=0 phase mid33_nopro 1800 python experiments/debug_mid33.py 80

echo "sweep part 19 complete $(date +%H:%M:%S); logs in $OUT"
