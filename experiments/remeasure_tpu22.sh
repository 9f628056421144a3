#!/bin/bash
# Round-3 sweep, part 22: the remaining TPU queue after the pairvec
# scalar-bitcast fix (pair_axpy_kernel now pre-splits alpha in XLA —
# Mosaic's tpu.bitcast is vector-only).  Order is value-at-risk first:
#   1. kernel-grid gates (cy_chunk=16) — CLAUDE.md kernel-change rule
#   2. flagship bench A/B with cy_chunk=16
#   3. flagship end-to-end with the pair-vector glue kernels
#   4. cheb-alias A/B, all-knobs combo
#   5. shell ladder resumes (df64 from cycle 9, pure-double from 8) —
#      both were cut by tunnel crashes (shell_df64_r17 / shell_pd_r17)
# Default flips follow a manual read of the logs.
#   setsid nohup bash experiments/remeasure_tpu22.sh > /tmp/sweep22.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep22.pid

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

# 1. cy_chunk=16 kernel-grid gates (both fused kernels, padded shapes
#    included).
MGT_CY_CHUNK=16 phase dpwin_cy16 2400 \
    python experiments/debug_dpwin.py 4 4 128 16 16 128 8 8 80
MGT_CY_CHUNK=16 phase spwin_cy16 2400 \
    python experiments/debug_spwin.py 4 4 128 16 16 128 8 8 80

# 2. Flagship FMG A/B (bench.py guards L2).
MGT_CY_CHUNK=16 phase bench_cy16 2700 python bench.py

# 3. Flagship end-to-end with the pair-vector kernels (pair-CG branch;
#    fmg L2 + analyze + cg L2 all checked by the probe).
MGT_PAIR_VEC_KERNEL=1 phase flag128_pairvec 4200 \
    python experiments/debug_mid33.py 128

# 4. Aliased cheb pass A/B; then all three knobs together.
MGT_CHEB_ALIAS=1 phase bench_chebalias22 2700 python bench.py
MGT_PAIR_VEC_KERNEL=1 MGT_CY_CHUNK=16 MGT_CHEB_ALIAS=1 \
    phase flag128_allknobs 4200 python experiments/debug_mid33.py 128

# 5. Shell ladder resumes (GAPS #1): df64 pair path from cycle 9,
#    pure-double from cycle 8.
phase shell_df64_r22 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 9
phase shell_pd_r22 12000 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 8 --pure-double

echo "sweep part 22 complete $(date +%H:%M:%S); logs in $OUT"
