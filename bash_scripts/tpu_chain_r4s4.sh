#!/usr/bin/env bash
# Round-4 session-3 FOLLOW-UP chain (strictly serial, ONE chip).
#   Launch AFTER tpu_chain_r4s3.sh exits:
#   nohup bash bash_scripts/tpu_chain_r4s4.sh > /tmp/chain_r4s4.log 2>&1 &
#
# r4s3 adjudicated the individual levers (early-stop LOST and was
# removed from the candidate; track-sub4 / kcap / map-sub4+tail verdicts
# in artifacts/r4s3). This chain measures the COMBINED fast-legal
# candidate — quality x3 seeds + its bench throughput — so the round
# ends with a contract-backed fast-mode headline (VERDICT item 6).
#   fastlegal x3 — combined candidate quality vs the silnorm control
#   bench_legal  — bench.py with the matching env (track sub4 via the
#                  fast leg; BENCH_MAX_PER_TILE prices the kcap verdict)
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r4s4_${TS}"
ART="artifacts/r4s4"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-5400}    # 1.5 h: this chain starts late in the
                                    # session; the driver bench needs the chip
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r4s4 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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
    echo "== probe $n failed ($(date +%H:%M:%S)); tunnel down, sleeping 300s"
    if [ "$n" -ge 4 ]; then
        echo "== giving up (probes=$n)"; exit 1
    fi
    sleep 300
done
echo "== tunnel UP at $(date +%H:%M:%S); starting"

commit_art() {
    git add -A "$ART" 2>/dev/null
    git commit -q -m "$1" -- "$ART" 2>/dev/null \
        && echo "== committed: $1" || true
}

run() {
    local name="$1" to="$2"; shift 2
    local rem; rem=$(remaining)
    if [ "$rem" -lt 600 ]; then
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

quality_run() {
    local name="$1" cfg="$2" seq="$3" end="$4"; shift 4
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 3000 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
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
    if [ "$ok" = 1 ]; then
        commit_art "Measurement artifacts: ${name} quality run (r4s4 chain)"
    else
        echo "== [$name] FAILED (rc=$RUN_RC, missing summaries) — no artifact"
        commit_art "Measurement status: ${name} run FAILED rc=$RUN_RC (r4s4 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations

quality_run fastlegal_s0 "$A/full_res_fastlegal.py" \
    synthetic_room_fullres_fastlegal_0 30
quality_run fastlegal_s1 "$A/full_res_fastlegal.py" abl_fastlegal_s1 30 \
    --set seed=1 --set run_name=abl_fastlegal_s1
quality_run fastlegal_s2 "$A/full_res_fastlegal.py" abl_fastlegal_s2 30 \
    --set seed=2 --set run_name=abl_fastlegal_s2

# bench 1: default env — exact headline comparable to r4s1's 0.9426,
# fast_mode detail = the now-contract-passing legal configuration
run bench_legal 2400 python bench.py
if grep -q '"metric"' "$OUT/bench_legal.txt" 2>/dev/null; then
    grep '"metric"' "$OUT/bench_legal.txt" > "$ART/bench_legal.json"
    commit_art "Measurement artifacts: bench with legal fast leg (r4s4)"
else
    echo "== bench_legal produced no metric line — NOT committing"
    commit_art "Measurement status: bench_legal FAILED rc=$RUN_RC (r4s4 chain)"
fi

# bench 2: price the kcap default flip (escalated per-tile cap 768 —
# the [T,K] glue is K-proportional; quality side adjudicated in r4s3)
run bench_k768 2400 env BENCH_MAX_PER_TILE=768 python bench.py
if grep -q '"metric"' "$OUT/bench_k768.txt" 2>/dev/null; then
    grep '"metric"' "$OUT/bench_k768.txt" > "$ART/bench_k768.json"
    commit_art "Measurement artifacts: bench at max_per_tile 768 (r4s4)"
else
    echo "== bench_k768 produced no metric line — NOT committing"
    commit_art "Measurement status: bench_k768 FAILED rc=$RUN_RC (r4s4 chain)"
fi

echo "== chain done ($(date +%H:%M:%S))"
python -m isogs_slam_tpu.tools.contracts --control silnorm \
    artifacts/r4s4 artifacts/r4s3 artifacts/r4s1 \
    | tee "$ART/contracts.txt" || true
commit_art "Measurement artifacts: r4s4 contracts + status"
