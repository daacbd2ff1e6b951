#!/usr/bin/env bash
# Round-5 session-3 chain: decide the fastlegal8 conflict.
#   nohup bash bash_scripts/tpu_chain_r5s3.sh > /tmp/chain_r5s3.log 2>&1 &
#
# The r5s2 battery left fastlegal8 (track sub4 + map sub8 + tail) with
# CONFLICTING evidence: 30-frame 3-seed median dATE +0.064 (beyond the
# 0.044 FAIL line, but with a 0.08 cm seed spread — 7x control noise),
# while its 100-frame drift run landed at 0.20 cm, BELOW the exact
# control pair (0.248 / 0.263). The repo's own doctrine says drift
# shape at length is the stronger signal; n=1 is not a median. This
# chain completes the long-run protocol to 3 seeds each side:
#   long100fs8 s1, s2   — candidate
#   (control already has s0, s1 from r5s1)
#   long100sn  s2       — control third seed
# then re-runs contracts with the 3-seed long groups.
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r5s3_${TS}"
ART="artifacts/r5s3"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-9000}    # 2.5 h
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r5s3 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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
    echo "== probe $n failed ($(date +%H:%M:%S)); sleeping 600s"
    if [ "$n" -ge 6 ] || [ "$(remaining)" -lt 3000 ]; then
        echo "== giving up"; exit 1
    fi
    sleep 600
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
    if [ "$rem" -lt 900 ]; then
        echo "== [$name] SKIPPED (deadline)" | tee -a "$OUT/log.txt"
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
    grep "\[progress\]" "$OUT/$name.txt" > "$ART/${name}_progress.txt" \
        2>/dev/null || true
    if [ "$ok" = 1 ]; then
        commit_art "Measurement artifacts: ${name} quality run (r5s3 chain)"
    else
        commit_art "Measurement status: ${name} FAILED rc=$RUN_RC (r5s3 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations

quality_run long100fs8_s1 6000 "$A/full_res_fastlegal8.py" \
    abl_long100fs8_s1 100 \
    --set data.num_frames=110 --set seed=1 --set run_name=abl_long100fs8_s1
quality_run long100fs8_s2 6000 "$A/full_res_fastlegal8.py" \
    abl_long100fs8_s2 100 \
    --set data.num_frames=110 --set seed=2 --set run_name=abl_long100fs8_s2
quality_run long100sn_s2 6000 "$A/full_res_silnorm.py" abl_long100sn_s2 100 \
    --set data.num_frames=110 --set seed=2 --set run_name=abl_long100sn_s2

echo "== chain done ($(date +%H:%M:%S))"
python -m isogs_slam_tpu.tools.contracts --control silnorm \
    --tiebreak long100sn:long100fs8 \
    --tiebreak-covers fastlegal8,msub8sn \
    artifacts/r5s3 artifacts/r5s2 artifacts/r5s1 artifacts/r4s4 \
    artifacts/r4s3 artifacts/r4s1 \
    | tee "$ART/contracts_sub8.txt" || true
python -m isogs_slam_tpu.tools.seed_stats artifacts/r5s3 artifacts/r5s2 \
    artifacts/r5s1 | tee "$ART/seed_stats.txt" || true
commit_art "Measurement artifacts: r5s3 3-seed long-run contracts + status"
