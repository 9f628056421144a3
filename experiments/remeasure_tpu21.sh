#!/bin/bash
# Round-3 sweep, part 21: hardware gates + A/Bs for the pair-vector glue
# kernels (MGT_PAIR_VEC_KERNEL), the cy_chunk=16 kernel grid
# (MGT_CY_CHUNK) and the aliased cheb pass (MGT_CHEB_ALIAS), after the
# from_windowed fusion-miscompile fix (251506e).  Gates FIRST
# (CLAUDE.md kernel-change rule), flagship A/Bs after; default flips
# follow a manual read of the logs.
#   setsid nohup bash experiments/remeasure_tpu21.sh > /tmp/sweep21.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep21.pid

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

# 1. Correctness gates (small shapes) + op-level timings (128^3).
phase pairvec_gate21 3600 python experiments/debug_pairvec.py 24 40 128

# 2. cy_chunk=16 kernel-grid gates (both kernels, incl. padded shapes).
MGT_CY_CHUNK=16 phase dpwin_cy16 2400 \
    python experiments/debug_dpwin.py 4 4 128 16 16 128 8 8 80
MGT_CY_CHUNK=16 phase spwin_cy16 2400 \
    python experiments/debug_spwin.py 4 4 128 16 16 128 8 8 80

# 3. Flagship FMG A/Bs (bench.py guards L2).
MGT_CY_CHUNK=16 phase bench_cy16 2700 python bench.py
MGT_CHEB_ALIAS=1 phase bench_chebalias21 2700 python bench.py

# 4. Flagship end-to-end with the pair-vector kernels (pair-CG branch;
#    fmg L2 + analyze + cg L2 all checked by the probe).
MGT_PAIR_VEC_KERNEL=1 phase flag128_pairvec 4200 \
    python experiments/debug_mid33.py 128
# 5. All three knobs together.
MGT_PAIR_VEC_KERNEL=1 MGT_CY_CHUNK=16 MGT_CHEB_ALIAS=1 \
    phase flag128_allknobs 4200 python experiments/debug_mid33.py 128

echo "sweep part 21 complete $(date +%H:%M:%S); logs in $OUT"
