#!/bin/bash
# One-shot TPU re-measurement sweep (the round-3 backlog, docs/GAPS.md #1).
# Run unattended whenever the axon tunnel is up:
#   bash experiments/remeasure_tpu.sh [outdir]
# Each phase is independently time-bounded and appends to its own log, so a
# mid-sweep tunnel drop preserves everything measured so far.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r3}
mkdir -p "$OUT"
# prepend (not replace): the axon TPU plugin registers via a site hook on
# the inherited PYTHONPATH (/root/.axon_site); clobbering it kills the tunnel
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}

phase() {  # phase <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    echo "=== $name exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
}

# 0. device probe (fail fast if the tunnel is down)
timeout 300 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down; aborting"; exit 1; }

# 1. flagship bench (fused sp+dp kernels; falls back to XLA internally),
#    with setup-phase timing
MGT_SETUP_TIMING=1 phase bench 3600 python bench.py

# 2. full-solve ladder, small sizes first (the 0.96x FMG row at 4.17M):
#    doubling sizes 40..128 as in RESULTS_R2
phase ladder_small 3600 python experiments/poisson_cube.py 4 3000000 20000000 2 2 2 square
phase ladder_large 5400 python experiments/poisson_cube.py 4 30000000 140000000 2 2 2 square

# 3. sp/dp matvec A/B at the flagship: fused windowed kernels vs XLA
BENCH_METRIC=matvec phase mv_fused 1800 python bench.py
BENCH_METRIC=matvec BENCH_DP_IMPL=ozaki_chunked BENCH_SP_IMPL=dense_chunked \
    phase mv_xla 1800 python bench.py

# 3b. FMG knob A/Bs: node-grid dp entries via the fused kernel; banded
#     MXU-matmul transfers.  (Sub-128 cx now runs via the zero-padded
#     window geometry — MGT_WIN_PAD — instead of the removed
#     MGT_SP_WIN_ANY_CX / _CX64 knobs, whose sub-128 lane split Mosaic
#     cannot lower.)
MGT_DP_NODE_VIA_WIN=1 phase bench_dpwin 2400 python bench.py
# MatmulTransfer became the TPU default after the 2026-08-18 A/B
# (0.919 s vs 1.050 s flagship FMG); this measures the old flavor
MGT_MATMUL_TRANSFER=0 phase bench_wint 2400 python bench.py

# 4. shell ladder to >=10M dofs (mixed + the pure-double/fourth-kind
#    reference specialization); 11 cycles reach the 6-level 6-block shell
#    (~12.6M dofs; 5 levels = 1.6M measured) — the default 8 stop at ~200k
phase shell 9000 python experiments/poisson_shell.py 4 13000000 1 3 3 --cycles 11
phase shell_pd 9000 python experiments/poisson_shell.py 4 13000000 1 3 3 \
    --cycles 11 --pure-double

echo "sweep complete; logs in $OUT"
