#!/bin/bash
# Round-3 sweep, part 9.  Ordered by value-at-risk (the tunnel has dropped
# mid-sweep three times): first the FMG knob A/Bs that could move the
# graded bench.py headline (parts 6/7 queued them but died in the shell
# phases before reaching them), then the shell ladder on the df64 pair dp
# path (the native-f64 attempt crashed the TPU worker at 3.2M dofs in
# part 6), then the FMG decomposition probe.
#   bash experiments/remeasure_tpu9.sh [outdir]

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}

phase() {  # phase <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
}

timeout 300 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down; aborting"; exit 1; }

# 1. FMG residuals via the fused dp kernel (exact since the perm_mm
#    precision fix; fmg_profile3 puts the XLA residual at 136 ms/L7 call
#    vs the kernel's 40 ms matvec).
MGT_DP_NODE_VIA_WIN=1 phase bench_nodewin 2700 python bench.py
# 2. dp Ozaki banded-matmul FMG solution prolongations.
MGT_DP_MM_TRANSFER=1 phase bench_dpmm 2700 python bench.py
# 3. Combined candidate default.
MGT_DP_NODE_VIA_WIN=1 MGT_DP_MM_TRANSFER=1 phase bench_combo 2700 python bench.py

# 4. Shell ladder at scale on the df64 pair dp path (mixed, then the
#    pure-double/fourth-kind reference specialization).
phase shell_df64 10800 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11
phase shell_pd_df64 10800 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double

# 5. FMG wall-time decomposition (part 8's phase 3; parts 2/3 got the
#    3 headline rows, the per-level tail is still unmeasured).
phase fmg_profile4 4800 python experiments/fmg_profile.py 128 5

echo "sweep part 9 complete; logs in $OUT"
