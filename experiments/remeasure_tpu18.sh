#!/bin/bash
# Round-3 sweep, part 18: hardware gates + A/Bs for the two new fused-pass
# variants (MGT_DP_RESID_FUSED: in-kernel dp residual epilogue;
# MGT_CHEB_ALIAS: in-place aliased cheb pass, no _finish pad), plus the
# windowed-kernel micro-profile (kernel_profile.py) that decomposes the
# L7 V-cycle body (GAPS #3).  Bit-exactness gates run FIRST (CLAUDE.md
# kernel-change rule); default flips follow the measurements.
#   setsid nohup bash experiments/remeasure_tpu18.sh > /tmp/sweep18.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep18.pid

wait_tunnel() {
    # a REAL device roundtrip: jax.devices() succeeds even when the data
    # plane is wedged (observed 2026-08-20)
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

# 1. Hardware bit-exactness gates for the new kernel variants.
phase dpwin_gate18 2400 python experiments/debug_dpwin.py
phase spwin_gate18 2400 python experiments/debug_spwin.py

# 2. Micro-profile: decompose the L7 V-cycle body + cy_chunk variants.
phase kernel_profile18 4800 python experiments/kernel_profile.py 128 10

# 3. Knob A/Bs at the flagship (L2 guarded by bench.py).
MGT_DP_RESID_FUSED=1 phase bench_residfused 2700 python bench.py
MGT_CHEB_ALIAS=1 phase bench_chebalias 2700 python bench.py
MGT_DP_RESID_FUSED=1 MGT_CHEB_ALIAS=1 phase bench_combo18 2700 \
    python bench.py

echo "sweep part 18 complete $(date +%H:%M:%S); logs in $OUT"
