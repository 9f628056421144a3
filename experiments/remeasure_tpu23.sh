#!/bin/bash
# Round-4 sweep, part 23: the code-independent remainder of the round-3
# queue (VERDICT #5 default flips), ordered value-first:
#   1. cy_chunk=16 kernel-grid gates, full default shape set
#      (CLAUDE.md kernel-change rule)
#   2. flagship bench A/B with cy_chunk=16
#   3. cheb-alias speed A/B
#   4. cy16 + chebalias combo
# Pairvec / general-operator phases follow in later parts once their
# code lands.  Launch:
#   setsid nohup bash experiments/remeasure_tpu23.sh > /tmp/sweep23.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep23.pid

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

# 1. cy_chunk=16 kernel-grid gates, FULL default shape set.
MGT_CY_CHUNK=16 phase dpwin_cy16 3600 python experiments/debug_dpwin.py
MGT_CY_CHUNK=16 phase spwin_cy16 3600 python experiments/debug_spwin.py

# 2. Flagship FMG A/B (bench.py guards L2).
MGT_CY_CHUNK=16 phase bench_cy16 2700 python bench.py

# 3. Aliased cheb pass A/B.
MGT_CHEB_ALIAS=1 phase bench_chebalias23 2700 python bench.py

# 4. Both together.
MGT_CY_CHUNK=16 MGT_CHEB_ALIAS=1 phase bench_cy16alias 2700 python bench.py

echo "sweep part 23 complete $(date +%H:%M:%S); logs in $OUT"
