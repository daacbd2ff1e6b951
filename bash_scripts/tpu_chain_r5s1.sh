#!/usr/bin/env bash
# Round-5 session-1 chain (strictly serial, ONE chip).
#   nohup bash bash_scripts/tpu_chain_r5s1.sh > /tmp/chain_r5s1.log 2>&1 &
#
# VERDICT r4 ordering: long100 FIRST (it was queued and deadline-lost in
# chains r4s2 AND r4s3 — every round-4 contract verdict stays
# PROVISIONAL until it runs). Then the two round-5 adjudications:
#   0. realdata      — Replica room0 if data is on disk (self-skips)
#   1. long100sn     — 100-frame silnorm control: drift shape at length
#   2. long100fast   — 100-frame fastlegal: THE tiebreaker for the
#                      fastlegal/tsub4/kcap/msub4 PROVISIONAL verdicts
#   3. contracts     — re-run the adjudicator with the long100 evidence
#   4. msub8sn x3    — map sub8 + exact tail (the live single-chip lever;
#                      old 1.78 FPS sub8 number predates stripe+silnorm)
#   5. mech probe    — the +1.9 dB fast-PSNR mechanism, matched compute:
#                      stripeonly (sub4, tail 0) x2, exacteq (exact @ 26
#                      iters = fast map wall-clock) x2, exact4 x1
#   6. long100 seed1 — one more seed of each long run if time allows
#   7. bench x2      — excursion-proof bench.py (median of 3 passes +
#                      latency probes in detail), exact + sub8 fast env
# Controls: silnorm_s{0,1,2} @30f (artifacts/r4s1). Decision rule:
# NOTES round-4 (medians over >= 3 seeds; real iff |delta| > 0.022 cm
# ATE / 0.6 dB PSNR; long100 drift shape breaks PROVISIONAL ties).
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r5s1_${TS}"
ART="artifacts/r5s1"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-25200}   # 7 h hard deadline: chip free for the
                                    # driver's round-end bench
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r5s1 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

remaining() { echo $(( CHAIN_MAX_S - ($(date +%s) - T0) )); }

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
    if [ "$n" -ge 10 ] || [ "$(remaining)" -lt 3600 ]; then
        echo "== giving up (probes=$n remaining=$(remaining)s)"; exit 1
    fi
    sleep 600
done
echo "== tunnel UP at $(date +%H:%M:%S); starting"

commit_art() { # commit_art <msg>
    git add -A "$ART" 2>/dev/null
    git commit -q -m "$1" -- "$ART" 2>/dev/null \
        && echo "== committed: $1" || true
}

run() { # run <name> <timeout_s> <cmd...> ; sets RUN_RC
    local name="$1" to="$2"; shift 2
    local rem; rem=$(remaining)
    if [ "$rem" -lt 900 ]; then
        echo "== [$name] SKIPPED (deadline: ${rem}s left)" | tee -a "$OUT/log.txt"
        echo -e "$name\tskipped\t0\tdeadline" >> "$STATUS"
        RUN_RC=125
        return
    fi
    [ "$to" -gt "$rem" ] && to=$rem
    echo "== [$name] $* ($(date +%H:%M:%S), timeout ${to}s)" | tee -a "$OUT/log.txt"
    local s; s=$(date +%s)
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.txt" | tail -3
    RUN_RC=${PIPESTATUS[0]}
    echo "== [$name] exit $RUN_RC" | tee -a "$OUT/log.txt"
    echo -e "$name\t$RUN_RC\t$(( $(date +%s) - s ))\t-" >> "$STATUS"
}

quality_run() { # quality_run <name> <timeout> <config> <sequence> <end_at> [extra --set]
    local name="$1" to="$2" cfg="$3" seq="$4" end="$5"; shift 5
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" "$to" python -m isogs_slam_tpu.scripts.splatam "$cfg" \
        --end-at "$end" "$@"
    [ "$RUN_RC" = 125 ] && return
    local ok=1
    for f in eval/eval_summary.json runtime_stats.json; do
        local src="experiments/Synthetic/${seq}/${f}"
        if [ -s "$src" ]; then
            cp "$src" "$ART/${name}_$(basename "$f")"
        else
            ok=0
        fi
    done
    # drift-shape evidence: the [progress] ATE-so-far series (the whole
    # point of the long100 runs) + the online-eval txt arrays
    grep "\[progress\]" "$OUT/$name.txt" > "$ART/${name}_progress.txt" \
        2>/dev/null || true
    if [ -d "experiments/Synthetic/${seq}/eval_online" ]; then
        mkdir -p "$ART/${name}_online"
        find "experiments/Synthetic/${seq}/eval_online" -maxdepth 1 \
            -name '*.txt' -exec cp {} "$ART/${name}_online/" \; 2>/dev/null
    fi
    if [ "$ok" = 1 ]; then
        commit_art "Measurement artifacts: ${name} quality run (r5s1 chain)"
    else
        echo "== [$name] FAILED (rc=$RUN_RC, missing summaries) — no artifact"
        commit_art "Measurement status: ${name} run FAILED rc=$RUN_RC (r5s1 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations

# 0. real-data contingency (self-skips while no dataset on disk)
run realdata 7200 bash bash_scripts/replica_room0_if_present.sh 200

# 1+2. THE TIEBREAKER — 100-frame drift-shape runs, control then fast.
#      (r4s3 budgeted 4000s for 30 frames; 100 frames with growth => 9000)
quality_run long100sn_s0 9000 "$A/full_res_silnorm.py" abl_long100sn_s0 100 \
    --set data.num_frames=110 --set run_name=abl_long100sn_s0
quality_run long100fast_s0 9000 "$A/full_res_fastlegal.py" \
    abl_long100fast_s0 100 \
    --set data.num_frames=110 --set run_name=abl_long100fast_s0

# 3. re-run the adjudicator WITH the long100 evidence (tools/contracts.py
#    --tiebreak upgrades PROVISIONAL verdicts from the drift-shape pair)
run contracts_mid 300 python -m isogs_slam_tpu.tools.contracts \
    --control silnorm \
    --tiebreak long100sn:long100fast \
    artifacts/r5s1 artifacts/r4s4 artifacts/r4s3 artifacts/r4s1
cp "$OUT/contracts_mid.txt" "$ART/contracts.txt" 2>/dev/null || true
commit_art "Measurement artifacts: r5s1 contracts after long100 tiebreaker"

# 4. map-sub8 + exact tail under silnorm (single-chip throughput lever)
quality_run msub8sn_s0 4000 "$A/full_res_mapsub8_pol4.py" abl_msub8sn_s0 30 \
    --set run_name=abl_msub8sn_s0
quality_run msub8sn_s1 4000 "$A/full_res_mapsub8_pol4.py" abl_msub8sn_s1 30 \
    --set seed=1 --set run_name=abl_msub8sn_s1
quality_run msub8sn_s2 4000 "$A/full_res_mapsub8_pol4.py" abl_msub8sn_s2 30 \
    --set seed=2 --set run_name=abl_msub8sn_s2

# 5. the +1.9 dB fast-PSNR mechanism probe (matched compute):
#    stripeonly = sub4 cycle, NO tail -> does the tail carry the gain?
#    exacteq    = exact @ 26 iters = the fast map leg's wall-clock
#                 (0.525/0.820 * 40; r4s1 bench detail) -> is the gain
#                 just "fewer iterations" (less keyframe overfit)?
#    exact4     = exact @ 4 iters (the tail alone) -> lower anchor
quality_run stripeonly_s0 4000 "$A/full_res_mapsub4.py" abl_stripeonly_s0 30 \
    --set run_name=abl_stripeonly_s0
quality_run stripeonly_s1 4000 "$A/full_res_mapsub4.py" abl_stripeonly_s1 30 \
    --set seed=1 --set run_name=abl_stripeonly_s1
quality_run exacteq_s0 4000 "$A/full_res_silnorm.py" abl_exacteq_s0 30 \
    --set mapping.num_iters=26 --set run_name=abl_exacteq_s0
quality_run exacteq_s1 4000 "$A/full_res_silnorm.py" abl_exacteq_s1 30 \
    --set mapping.num_iters=26 --set seed=1 --set run_name=abl_exacteq_s1
quality_run exact4_s0 4000 "$A/full_res_silnorm.py" abl_exact4_s0 30 \
    --set mapping.num_iters=4 --set run_name=abl_exact4_s0

# 6. one more seed of each long run (tiebreaker robustness) if time allows
quality_run long100sn_s1 9000 "$A/full_res_silnorm.py" abl_long100sn_s1 100 \
    --set data.num_frames=110 --set seed=1 --set run_name=abl_long100sn_s1
quality_run long100fast_s1 9000 "$A/full_res_fastlegal.py" \
    abl_long100fast_s1 100 \
    --set data.num_frames=110 --set seed=1 --set run_name=abl_long100fast_s1

# 7. benches with the excursion-proof bench.py (median-of-3 + probes)
run bench_legal 3600 python bench.py
if grep -q '"metric"' "$OUT/bench_legal.txt" 2>/dev/null; then
    grep '"metric"' "$OUT/bench_legal.txt" > "$ART/bench_legal.json"
    commit_art "Measurement artifacts: excursion-proof bench (r5s1)"
else
    commit_art "Measurement status: bench_legal FAILED rc=$RUN_RC (r5s1 chain)"
fi
# fast env at sub8 (prices the msub8 lever measured above; only a claim
# if its quality verdict passed)
run bench_sub8 3600 env BENCH_TILE_SUBSAMPLE=8 BENCH_MAP_POLISH=4 \
    BENCH_TRACK_TILE_SUBSAMPLE=4 BENCH_ALSO_FAST=0 python bench.py
if grep -q '"metric"' "$OUT/bench_sub8.txt" 2>/dev/null; then
    grep '"metric"' "$OUT/bench_sub8.txt" > "$ART/bench_sub8.json"
    commit_art "Measurement artifacts: bench at map sub8 + tail (r5s1)"
else
    commit_art "Measurement status: bench_sub8 FAILED rc=$RUN_RC (r5s1 chain)"
fi

echo "== chain done ($(date +%H:%M:%S)); results in $OUT and $ART"
python -m isogs_slam_tpu.tools.seed_stats "$ART" artifacts/r4s4 \
    artifacts/r4s3 artifacts/r4s1 | tee "$ART/seed_stats.txt" || true
python -m isogs_slam_tpu.tools.contracts --control silnorm \
    --tiebreak long100sn:long100fast \
    artifacts/r5s1 artifacts/r4s4 artifacts/r4s3 artifacts/r4s1 \
    | tee "$ART/contracts.txt" || true
commit_art "Measurement artifacts: r5s1 final contracts + seed stats + status"
