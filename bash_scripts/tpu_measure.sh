#!/usr/bin/env bash
# Round-3 TPU measurement sequence — run when the tunnel is up.
# ONE tunneled chip: runs everything strictly serially. Outputs land in
# experiments/tpu_measure_<ts>/ so numbers survive the session.
#
# Usage: bash bash_scripts/tpu_measure.sh [quick|full|quality]
#   quick:   bench exact + fast modes + vmap_bins A/B (~20 min)
#   full:    quick + profile_map + density steady-state + the quality
#            battery (~2 h)
#   quality: the quality-ablation battery ONLY (~2 h):
#            full_res exact, mapsub1_forced (stripe-estimator regression
#            gate — must land at the exact ~1.22 cm), mapsub4 (stripe
#            contract check: ATE <= 1.35 cm, PSNR within 0.5 dB), fan3
#            (sub-cm tracking attack), track_coarse (tracking throughput)
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

quality_battery() {
    A=isogs_slam_tpu/configs/synthetic/ablations
    quality_run full_res isogs_slam_tpu/configs/synthetic/full_res.py \
        synthetic_room_fullres_0
    # stripe-estimator regression gate: the subset loss path at sub=1 is
    # now loss-equivalent to the exact path; expect ATE ~= full_res's
    # (the old per-tile valid-window estimator measured 2.14 vs 1.22)
    quality_run mapsub1f "$A/full_res_mapsub1_forced.py" \
        synthetic_room_fullres_mapsub1f_0
    # fast-mapping contract check at sub4 stripes (cycled)
    quality_run mapsub4 "$A/full_res_mapsub4.py" \
        synthetic_room_fullres_mapsub_0
    # round-3 sub-cm tracking attack: forward-only perturbation fan
    quality_run fan3 "$A/full_res_fan3.py" \
        synthetic_room_fullres_fan3_0
    # tracking throughput: most iterations at the coarse pyramid level
    quality_run track_coarse "$A/full_res_track_coarse.py" \
        synthetic_room_fullres_trackcoarse_0
    echo "== quality battery done"
    grep -H '"Final Average ATE\|"Average PSNR' \
        "$OUT"/*_eval_summary.json 2>/dev/null || true
}

if [ "$MODE" = "quality" ]; then
    quality_battery
    echo "== done; results in $OUT"
    exit 0
fi

# DECIDED A/Bs, removed from the sequence (re-check only on new toolchains):
#   window gathers (ISOGS_WINDOW_GATHER=1): serial dynamic-slice loop,
#     0.40-0.68 vs 0.78-0.79 FPS row-gather (2026-08-18).
#   tile_cull / tight_rect (BENCH_TILE_CULL=1 / BENCH_TIGHT_RECT=1):
#     1.37 vs 1.50 FPS plain sub4 — compaction cost unpaid on the
#     isotropic post-densify bench scene (2026-08-18).

# 1. exact reference semantics (demand-driven isect cap, re-warm at final
# cap — the honest protocol from b92aeb7)
run bench_exact 1200 python bench.py

# 2. fast modes (opt-in): stripe-cycled mapping subset, then tracking
# subset too
BENCH_TILE_SUBSAMPLE=4 run bench_sub4 1500 python bench.py
BENCH_TILE_SUBSAMPLE=8 run bench_sub8 1500 python bench.py
BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4 1500 python bench.py

# 2b. vmapped per-slot phase binning A/B (mapping.vmap_bins)
BENCH_VMAP_BINS=1 run bench_exact_vb 1500 python bench.py
BENCH_VMAP_BINS=1 BENCH_TILE_SUBSAMPLE=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_track4_vb 1500 python bench.py

if [ "$MODE" = "full" ]; then
    # 3. mapping fixed-cost profile
    run profile_map 1200 python -m isogs_slam_tpu.tools.profile_map
    run profile_map_sub4 900 python -m isogs_slam_tpu.tools.profile_map \
        --tile-sub 4

    # 4. mesh density steady state (VERDICT item 7): 500k flakes, 253^3
    run profile_density 1800 python -m \
        isogs_slam_tpu.tools.profile_density --n 500000 --voxel 0.02 \
        --out "$OUT/density_profile.json"

    # 5. quality battery
    quality_battery
fi

echo "== done; results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
