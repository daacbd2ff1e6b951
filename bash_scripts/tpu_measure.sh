#!/usr/bin/env bash
# Round-2 TPU measurement sequence — run when the tunnel is up.
# ONE tunneled chip: runs everything strictly serially. Outputs land in
# experiments/tpu_measure_<ts>/ so numbers survive the session.
#
# Usage: bash bash_scripts/tpu_measure.sh [quick|full|quality]
#   quick:   bench exact + fast modes (~15 min incl. compiles)
#   full:    quick + profile_map + full_res 30-frame quality run (~1 h)
#   quality: the quality-ablation battery ONLY — full_res + gn3
#            (eigencut), mapping-subsample-only, tracking-subsample-only
#            (~1.5 h; adjudicates NOTES.md open quality questions)
set -u
MODE="${1:-quick}"
TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_measure_${TS}"
mkdir -p "$OUT"
echo "== tpu_measure $MODE -> $OUT"

run() { # run <name> <timeout_s> <cmd...>
    local name="$1" to="$2"; shift 2
    echo "== [$name] $*" | tee -a "$OUT/log.txt"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.txt" | tail -3
    local rc=${PIPESTATUS[0]}   # the command's status, not tail's
    echo "== [$name] exit $rc" | tee -a "$OUT/log.txt"
}

quality_run() { # quality_run <name> <config> — full_res-style 30-frame run
    local name="$1" cfg="$2" seq="$3"
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 3500 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
        --end-at 30
    cp "experiments/Synthetic/${seq}/eval/eval_summary.json" \
       "$OUT/${name}_eval_summary.json" 2>/dev/null || true
    cp "experiments/Synthetic/${seq}/runtime_stats.json" \
       "$OUT/${name}_runtime_stats.json" 2>/dev/null || true
}

if [ "$MODE" = "quality" ]; then
    # GN ablations retired 2026-08-19: every GN variant (eigencut,
    # combined-photometric, 2 mm trust region) drifts super-linearly on
    # sequences (13-26 cm; gauge drift). Battery = exact + the cycling
    # fast modes.
    A=isogs_slam_tpu/configs/synthetic/ablations
    quality_run full_res isogs_slam_tpu/configs/synthetic/full_res.py \
        synthetic_room_fullres_0
    quality_run mapsub4 "$A/full_res_mapsub4.py" \
        synthetic_room_fullres_mapsub_0
    quality_run mapsub2 "$A/full_res_mapsub2.py" \
        synthetic_room_fullres_mapsub2_0
    echo "== done; results in $OUT"
    grep -H '"Final Average ATE\|"Average PSNR' \
        "$OUT"/*_eval_summary.json 2>/dev/null || true
    exit 0
fi

# 0. window-gather A/B — DECIDED 2026-08-18: slice-window gathers lower
# to a serial dynamic-slice while loop on TPU (0.40-0.68 FPS vs 0.78-0.79
# row-gather); row gathers are now the default (ops/gather.py). The wg
# variant stays here as a one-line future-compiler re-check.
run bench_exact 1200 python bench.py
ISOGS_WINDOW_GATHER=1 run bench_exact_wg 1200 python bench.py

# 2. fast modes (opt-in): mapping tile subset, then tracking subset too
BENCH_TILE_SUBSAMPLE=4 run bench_sub4 900 python bench.py
BENCH_TILE_SUBSAMPLE=8 run bench_sub8 900 python bench.py
BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4 900 python bench.py

# 2b. vmapped per-slot phase binning A/B (mapping.vmap_bins)
BENCH_VMAP_BINS=1 run bench_exact_vb 900 python bench.py
BENCH_VMAP_BINS=1 BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4_vb 900 python bench.py

# 2c. output-preserving slot cull, alone and stacked on the fast mode
BENCH_TILE_CULL=1 run bench_cull 900 python bench.py
BENCH_TILE_CULL=1 BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_cull_sub4 900 python bench.py

# 2d. opacity-aware exact-ellipse binning rects (output-preserving),
# alone and in the full stack. MEASURED 2026-08-18: at bench scale the
# tight rects do NOT shrink isect demand (util 1.011 with or without —
# the bench scene is isotropic high-opacity after densify), so the
# cap-1.5 modes truncated 40% of isects (util 1.68, numbers tainted)
# and were removed; capacity stays at the config default.
BENCH_TIGHT_RECT=1 run bench_tight 900 python bench.py
BENCH_TIGHT_RECT=1 BENCH_TILE_CULL=1 \
    BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_full_stack 900 python bench.py

if [ "$MODE" = "full" ]; then
    # 3. mapping fixed-cost profile
    run profile_map 1200 python -m isogs_slam_tpu.tools.profile_map
    run profile_map_sub4 900 python -m isogs_slam_tpu.tools.profile_map \
        --tile-sub 4

    # 4. full-res quality validation (pyramid + GN + lr_decay)
    rm -rf experiments/Synthetic/synthetic_room_fullres_0
    run full_res 3500 python -m isogs_slam_tpu.scripts.splatam \
        isogs_slam_tpu/configs/synthetic/full_res.py --end-at 30
    cp experiments/Synthetic/synthetic_room_fullres_0/eval/eval_summary.json \
       "$OUT/full_res_eval_summary.json" 2>/dev/null || true
    cp experiments/Synthetic/synthetic_room_fullres_0/runtime_stats.json \
       "$OUT/full_res_runtime_stats.json" 2>/dev/null || true
fi

echo "== done; results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
