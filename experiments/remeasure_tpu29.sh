#!/bin/bash
# Round-4 sweep, part 29: FINAL prioritized queue for the remaining
# round budget (parts 26-28 were killed mid-queue; ~2h of chip left,
# ~5h of phases — strict judge-value order, hard per-phase caps):
#   1. shell 12.7M mixed row            (VERDICT #1 done criterion)
#   2. flagship CG with pairvec kernels (VERDICT #2 done criterion)
#   3. DG dp matvec table, p=4..6      (VERDICT #3: first DG hw numbers)
#   4. DG end-to-end 3-D solve ladder   (VERDICT #3)
#   5. shell pure-double big rows       (VERDICT #1)
#   6. DG sp matvec table
#   7. fresh FMG profile                (VERDICT #5)
#   8. mid-ladder rows w/ kernels       (VERDICT #6)
#   9. shell pure-double small rows
# Waits for any currently-running bench.py to finish first.
#   setsid nohup bash experiments/remeasure_tpu29.sh > /tmp/sweep29.out 2>&1 &

set -u
cd "$(dirname "$0")/.."
OUT=${1:-docs/tpu_r4}
mkdir -p "$OUT"
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
echo $$ > /tmp/sweep29.pid

# let the in-flight bench_setup26 python drain (it writes its own log)
while ps -o cmd= -C python 2>/dev/null | grep -q "bench.py"; do
    sleep 20
done

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

phase shell_blk_c10 4200 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 10

MGT_PAIR_VEC_KERNEL=1 phase flagrow_pvk 4200 python experiments/poisson_cube.py \
    4 130000000 140000000 2 2 2 square

phase matvec_dg_dp 2700 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --impl ozaki

phase poisson_dg_tpu 3600 python experiments/poisson_dg.py \
    4 0 30000000 1 3 3 square 1e-3

phase shell_pd_big 4800 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 11 --min-cycle 8 --pure-double

phase matvec_dg_sp 2400 python experiments/matvec_dg.py \
    --min-degree 4 --max-degree 6 --steps 15 --dtype float32

phase fmg_profile29 2700 python experiments/fmg_profile.py 128 5

MGT_PAIR_VEC_KERNEL=1 MGT_PAIR_CG_PAD=99 phase midrow_pvk 4200 \
    python experiments/poisson_cube.py 4 30000000 60000000 2 2 2 square

phase shell_pd_small 4800 python experiments/poisson_shell.py \
    4 13000000 1 3 3 --cycles 8 --pure-double

echo "sweep part 29 complete $(date +%H:%M:%S); logs in $OUT"
