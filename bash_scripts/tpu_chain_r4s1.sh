#!/usr/bin/env bash
# Round-4 session-1 chain (strictly serial, ONE chip).
#   nohup bash bash_scripts/tpu_chain_r4s1.sh > /tmp/chain_r4s1.log 2>&1 &
#
# Adjudicates the round-3 regularizer quality cliff (VERDICT item 1) +
# completes the polyak verdict (item 3) and re-captures the bench
# headline as a COMMITTED raw artifact (item 3 of "What's missing").
#
# Round-boundary hygiene (VERDICT "next round" item 2 + ADVICE):
#   * CHAIN-LEVEL DEADLINE: no step starts after CHAIN_MAX_S from chain
#     start, and every step's timeout is clamped to the remaining
#     window, so the chip is free well before the driver's round-end
#     bench regardless of tunnel stalls.
#   * every run's exit code + duration lands in status.tsv (committed),
#     so gaps are distinguishable from successes;
#   * artifacts are committed ONLY when non-empty (test -s); failed
#     runs commit the status file with a FAILED message instead.
#
# Priority rationale:
#   bench_exact     — the round-3 bench debt: a committed raw headline
#   silnorm x3      — the mechanism-fix candidate for the cliff
#                     (tracking.sil_norm_render; biggest leverage)
#   noreg x2 seeds  — confirm the 0.149 cm single-seed finding
#   flatonly x3     — blame: the flat term's share (iso=0, sil 0.99)
#   isoonly x3      — blame: the iso term's share (flat=0, sil 0.5)
#   polyak s0,s2    — complete the 3-seed polyak verdict (s1 = 1.41)
#   noregsil05      — deconfound the sil_thres 0.5-vs-0.99 factor
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r4s1_${TS}"
ART="artifacts/r4s1"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-21600}   # 6 h hard deadline
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r4s1 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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

quality_run() { # quality_run <name> <config> <sequence> [extra --set args]
    local name="$1" cfg="$2" seq="$3"; shift 3
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 4000 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
        --end-at 30 "$@"
    [ "$RUN_RC" = 125 ] && return   # deadline skip: no artifacts, no commit
    local ok=1
    for f in eval/eval_summary.json runtime_stats.json; do
        local src="experiments/Synthetic/${seq}/${f}"
        if [ -s "$src" ]; then
            cp "$src" "$ART/${name}_$(basename "$f")"
        else
            ok=0
        fi
    done
    if [ "$ok" = 1 ]; then
        commit_art "Measurement artifacts: ${name} quality run (r4s1 chain)"
    else
        echo "== [$name] FAILED (rc=$RUN_RC, missing summaries) — no artifact"
        commit_art "Measurement status: ${name} run FAILED rc=$RUN_RC (r4s1 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations

# 1. the bench headline as a COMMITTED raw artifact (round-3 debt)
run bench_exact 3000 python bench.py
if grep -q '"metric"' "$OUT/bench_exact.txt" 2>/dev/null; then
    grep '"metric"' "$OUT/bench_exact.txt" > "$ART/bench_exact.json"
    commit_art "Measurement artifacts: bench exact headline (r4s1)"
else
    echo "== bench_exact produced no metric line — NOT committing an artifact"
    commit_art "Measurement status: bench_exact FAILED rc=$RUN_RC (r4s1 chain)"
fi

# 2. mechanism fix candidate x3 seeds
quality_run silnorm_s0 "$A/full_res_silnorm.py" synthetic_room_fullres_silnorm_0
quality_run silnorm_s1 "$A/full_res_silnorm.py" abl_silnorm_s1 \
    --set seed=1 --set run_name=abl_silnorm_s1
quality_run silnorm_s2 "$A/full_res_silnorm.py" abl_silnorm_s2 \
    --set seed=2 --set run_name=abl_silnorm_s2

# 3. noreg confirmation seeds (s0 = 0.149, r3s6)
quality_run noreg_s1 "$A/full_res_noreg.py" abl_noreg_s1 \
    --set seed=1 --set run_name=abl_noreg_s1
quality_run noreg_s2 "$A/full_res_noreg.py" abl_noreg_s2 \
    --set seed=2 --set run_name=abl_noreg_s2

# 4. blame: flat-only
quality_run flatonly_s0 "$A/full_res_flatonly.py" synthetic_room_fullres_flatonly_0
quality_run flatonly_s1 "$A/full_res_flatonly.py" abl_flatonly_s1 \
    --set seed=1 --set run_name=abl_flatonly_s1
quality_run flatonly_s2 "$A/full_res_flatonly.py" abl_flatonly_s2 \
    --set seed=2 --set run_name=abl_flatonly_s2

# 5. blame: iso-only
quality_run isoonly_s0 "$A/full_res_isoonly.py" synthetic_room_fullres_isoonly_0
quality_run isoonly_s1 "$A/full_res_isoonly.py" abl_isoonly_s1 \
    --set seed=1 --set run_name=abl_isoonly_s1
quality_run isoonly_s2 "$A/full_res_isoonly.py" abl_isoonly_s2 \
    --set seed=2 --set run_name=abl_isoonly_s2

# 6. complete the polyak 3-seed verdict (s1 = 1.41, r3s6)
quality_run polyak_s0 "$A/full_res_polyak.py" synthetic_room_fullres_polyak_0
quality_run polyak_s2 "$A/full_res_polyak.py" abl_polyak_s2 \
    --set seed=2 --set run_name=abl_polyak_s2

# 7. deconfound the tracking threshold factor
quality_run noregsil05_s0 "$A/full_res_noreg_sil05.py" \
    synthetic_room_fullres_noregsil05_0

echo "== chain done ($(date +%H:%M:%S)); results in $OUT and $ART"
python -m isogs_slam_tpu.tools.seed_stats "$ART" artifacts/r3s6 \
    | tee "$ART/seed_stats.txt" || true
commit_art "Measurement artifacts: r4s1 multi-seed stats + status"
