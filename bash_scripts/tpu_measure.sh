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

# DECIDED A/Bs, removed from the sequence (re-check only on new toolchains):
#   window gathers (ISOGS_WINDOW_GATHER=1): serial dynamic-slice loop,
#     0.40-0.68 vs 0.78-0.79 FPS row-gather (2026-08-18).
#   tile_cull / tight_rect (BENCH_TILE_CULL=1 / BENCH_TIGHT_RECT=1):
#     1.37 vs 1.50 FPS plain sub4 — compaction cost unpaid on the
#     isotropic post-densify bench scene (2026-08-18).

# 1. exact reference semantics — honest re-measure with the demand-driven
# isect cap (re-warm at final cap landed in b92aeb7; the first attempt's
# 0.11 FPS was a recompile-in-measured-loop artifact).
run bench_exact 1200 python bench.py

# 2. fast modes (opt-in): epoch-cycled mapping tile subset, then tracking
# subset too
BENCH_TILE_SUBSAMPLE=4 run bench_sub4 900 python bench.py
BENCH_TILE_SUBSAMPLE=8 run bench_sub8 900 python bench.py
BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4 900 python bench.py

# 2b. vmapped per-slot phase binning A/B (mapping.vmap_bins)
BENCH_VMAP_BINS=1 run bench_exact_vb 900 python bench.py
BENCH_VMAP_BINS=1 BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4_vb 900 python bench.py

if [ "$MODE" = "full" ]; then
    # 3. mapping fixed-cost profile
    run profile_map 1200 python -m isogs_slam_tpu.tools.profile_map
    run profile_map_sub4 900 python -m isogs_slam_tpu.tools.profile_map \
        --tile-sub 4

    # 4. quality battery: exact full_res + the cycling fast modes
    # (mapsub2 is the session-8 discriminator for the residual 2.8-vs-1.2
    # ATE gap: flat across variance levels => systematic, not variance)
    A=isogs_slam_tpu/configs/synthetic/ablations
    quality_run full_res isogs_slam_tpu/configs/synthetic/full_res.py \
        synthetic_room_fullres_0
    quality_run mapsub2 "$A/full_res_mapsub2.py" \
        synthetic_room_fullres_mapsub2_0
    quality_run mapsub4 "$A/full_res_mapsub4.py" \
        synthetic_room_fullres_mapsub_0
fi

echo "== done; results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
