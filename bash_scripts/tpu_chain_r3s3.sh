#!/usr/bin/env bash
# Round-3 session-3 adjudication chain: probe the TPU tunnel until it is
# up (10-min interval, up to ~10 h), then run the queued measurements
# strictly serially (ONE chip). Safe to leave in the background:
#   nohup bash bash_scripts/tpu_chain_r3s3.sh > /tmp/chain_r3s3.log 2>&1 &
#
# Queue (NOTES.md round-3 session 3):
#   bench exact + sub4+track4 + vmap_bins A/B   (headline + VERDICT item 2)
#   mapsub4  (stripe cycle, lazy Adam, 40 it)   (fast-mode contract check)
#   mapsub1f (sub=1 forced, lazy)               (estimator regression gate)
#   mapsub4_it80 (lazy)                         (fallback ladder point)
#   track_coarse (de-fanned)                    (tracking throughput)
#   profile_density                             (VERDICT item 7)
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r3s3_${TS}"
mkdir -p "$OUT"
echo "== chain r3s3 -> $OUT (pid $$)"

probe() {
    timeout 90 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024))
(x @ x).block_until_ready()
EOF
}

n=0
until probe; do
    n=$((n + 1))
    echo "== probe $n failed ($(date +%H:%M:%S)); tunnel down, sleeping 600s"
    if [ "$n" -ge 60 ]; then echo "== giving up after $n probes"; exit 1; fi
    sleep 600
done
echo "== tunnel UP at $(date +%H:%M:%S); starting battery"

run() { # run <name> <timeout_s> <cmd...>
    local name="$1" to="$2"; shift 2
    echo "== [$name] $* ($(date +%H:%M:%S))" | tee -a "$OUT/log.txt"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.txt" | tail -3
    local rc=${PIPESTATUS[0]}
    echo "== [$name] exit $rc" | tee -a "$OUT/log.txt"
}

quality_run() { # quality_run <name> <config> <sequence>
    local name="$1" cfg="$2" seq="$3"
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 4000 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
        --end-at 30
    cp "experiments/Synthetic/${seq}/eval/eval_summary.json" \
       "$OUT/${name}_eval_summary.json" 2>/dev/null || true
    cp "experiments/Synthetic/${seq}/runtime_stats.json" \
       "$OUT/${name}_runtime_stats.json" 2>/dev/null || true
}

A=isogs_slam_tpu/configs/synthetic/ablations

# 1. headline + fast mode + vmap_bins A/B (VERDICT item 2)
run bench_exact 1500 python bench.py
BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4 1500 python bench.py
BENCH_VMAP_BINS=1 run bench_exact_vb 1500 python bench.py
BENCH_VMAP_BINS=1 BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4_vb 1500 python bench.py

# 2. fast-mode contract check with lazy Adam (primary question)
quality_run mapsub4_lazy "$A/full_res_mapsub4.py" \
    synthetic_room_fullres_mapsub_0

# 3. estimator + lazy regression gate at sub=1 (expect ~= exact 1.26)
quality_run mapsub1f_lazy "$A/full_res_mapsub1_forced.py" \
    synthetic_room_fullres_mapsub1f_0

# 4. fallback ladder point: sub4 + 80 iters with lazy Adam
quality_run mapsub4_it80_lazy "$A/full_res_mapsub4_it80.py" \
    synthetic_room_fullres_mapsub4it80_0

# 5. tracking throughput schedule, de-fanned (VERDICT item 4)
quality_run track_coarse "$A/full_res_track_coarse.py" \
    synthetic_room_fullres_trackcoarse_0

# 6. mesh density steady state (VERDICT item 7)
run profile_density 2400 python -m isogs_slam_tpu.tools.profile_density \
    --n 500000 --voxel 0.02 --out "$OUT/density_profile.json"

echo "== chain done ($(date +%H:%M:%S)); results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
grep -H 'Final Average ATE\|Average PSNR' "$OUT"/*_eval_summary.json \
    2>/dev/null || true
