#!/usr/bin/env bash
# Session-5 targeted TPU sequence (post gather-flip + gn_iters=0):
# quality headline, GT-pose PSNR split, fast-mode quality contract,
# fast-stack bench. Strictly serial — ONE tunneled chip.
set -u
TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_s5_${TS}"
mkdir -p "$OUT"
echo "== tpu_session5 -> $OUT"

run() { # run <name> <timeout_s> <cmd...>
    local name="$1" to="$2"; shift 2
    echo "== [$name] $*" | tee -a "$OUT/log.txt"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.txt" | tail -3
    local rc=${PIPESTATUS[0]}
    echo "== [$name] exit $rc" | tee -a "$OUT/log.txt"
}

# 1. headline quality: pyramid + lr_decay, GN off (expect ~1.2 cm ATE)
rm -rf experiments/Synthetic/synthetic_room_fullres_0
run full_res 3500 python -m isogs_slam_tpu.scripts.splatam \
    isogs_slam_tpu/configs/synthetic/full_res.py --end-at 30
cp experiments/Synthetic/synthetic_room_fullres_0/eval/eval_summary.json \
   "$OUT/full_res_eval_summary.json" 2>/dev/null || true
cp experiments/Synthetic/synthetic_room_fullres_0/runtime_stats.json \
   "$OUT/full_res_runtime_stats.json" 2>/dev/null || true

# 2. GT-pose mapping quality: splits "tracked PSNR ~19.9" into
# (a) map-quality regression vs (b) pose-error-limited rendering
run full_res_gt 3500 python -m isogs_slam_tpu.scripts.splatam \
    isogs_slam_tpu/configs/synthetic/full_res.py --end-at 30 \
    --set tracking.use_gt_poses=True --set run_name=abl_gtpose
cp experiments/Synthetic/abl_gtpose/eval/eval_summary.json \
   "$OUT/full_res_gt_eval_summary.json" 2>/dev/null || true

# 3. fast-mode quality contract (tile_subsample=4 both + tight rects)
rm -rf experiments/Synthetic/synthetic_room_fullres_fast_0
run full_res_fast 3500 python -m isogs_slam_tpu.scripts.splatam \
    isogs_slam_tpu/configs/synthetic/full_res_fast.py --end-at 30
cp experiments/Synthetic/synthetic_room_fullres_fast_0/eval/eval_summary.json \
   "$OUT/full_res_fast_eval_summary.json" 2>/dev/null || true

# 4. fast-stack bench with the row-gather default
BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4t4 900 python bench.py
BENCH_TILE_CULL=1 BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_cull_sub4t4 900 python bench.py
BENCH_TIGHT_RECT=1 BENCH_TILE_CULL=1 BENCH_TILE_SUBSAMPLE=4 \
    BENCH_TRACK_TILE_SUBSAMPLE=4 run bench_full_stack 900 python bench.py
BENCH_TILE_SUBSAMPLE=8 BENCH_TRACK_TILE_SUBSAMPLE=8 \
    run bench_sub8t8 900 python bench.py

echo "== done; results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
