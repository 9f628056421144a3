#!/bin/bash
# THE hardware bit-exactness gate (VERDICT r3 #8): every remeasure sweep
# must pass this before flipping any kernel-adjacent default, and any
# change near the fused kernels' layouts or precision must re-run it
# (CLAUDE.md kernel-change rule; findings 5/6/7 were all
# hardware-only miscompiles invisible to CPU/interpret tests).
#
# Covers, in order (cheapest first):
#   1. debug_dpwin   — fused dp windowed kernel vs the XLA Ozaki oracle,
#                      full default shape set incl. padded geometries
#   2. debug_spwin   — fused sp windowed kernel + Chebyshev epilogues
#   3. debug_pairvec — pair-vector CG glue kernels vs XLA forms + oracle
#   4. debug_general — MXU general-geometry forms vs the df64 oracles
#   5. debug_dg      — DG family: fused f32/dp vs the face-based oracle
#                      (matvec_dg/program.cc:206-207) + curved/var-coeff/
#                      JacobiTransformed f32-vs-f64 self checks (the r4
#                      sp46 failure class can never ship unverified again)
#   6. debug_mid33   — one mid-ladder end-to-end row (FMG L2 + analyze
#                      reduction + CG L2 verdict numbers)
#
# Usage: bash experiments/hw_gate.sh [outdir]   (default docs/hw_gate)
# Exits nonzero on the first failing tier; sweeps should abort on that.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/hw_gate}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
STAMP=$(date +%Y%m%d_%H%M%S)

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== hw_gate $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/$name.log"
    timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
    local rc=$?
    if [ "$rc" -ne 0 ]; then
        echo "=== hw_gate FAILED at $name (exit=$rc) — see $OUT/$name.log"
        tail -5 "$OUT/$name.log"
        exit "$rc"
    fi
    echo "=== hw_gate $name ok ($(date +%H:%M:%S))"
}

run dpwin 3600 python experiments/debug_dpwin.py
run spwin 3600 python experiments/debug_spwin.py
run pairvec 3600 python experiments/debug_pairvec.py 24 40
run general 3600 python experiments/debug_general.py 2 4
run dg 3600 python experiments/debug_dg.py 12
run mid33 4800 python experiments/debug_mid33.py 80

echo "=== hw_gate ALL TIERS OK ($STAMP)"
