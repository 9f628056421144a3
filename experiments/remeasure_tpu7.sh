#!/bin/bash
# Round-3 sweep, part 7: FMG decomposition with the fixed scalar-carry
# probe (part 6's hung: stale executables exhausted HBM), and the
# 64-cell-level padded-window A/B on the flagship FMG.
#   bash experiments/remeasure_tpu7.sh [outdir]

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

# 1. FMG wall-time decomposition, fixed probe (per-piece cache clears).
phase fmg_profile3 3600 python experiments/fmg_profile.py 128 5

# 2. Flagship FMG with the 64^3 mid-levels admitted to the windowed
#    kernels at 2x pad waste (L2 guard in bench.py protects correctness).
MGT_WIN_PAD=2.0 phase bench_pad2 3600 python bench.py

# 3. dp Ozaki banded-matmul transfers for the FMG solution prolongations
#    (CPU-verified 1e-14 vs the df64 window path; L2 parity must hold).
MGT_DP_MM_TRANSFER=1 phase bench_dpmm 3600 python bench.py

# 4. node-grid dp entries via the fused kernel AND the mm transfers
#    (the combined best-known-knob candidate for the new default).
MGT_DP_NODE_VIA_WIN=1 MGT_DP_MM_TRANSFER=1 phase bench_combo 3600 python bench.py

echo "sweep part 7 complete; logs in $OUT"
