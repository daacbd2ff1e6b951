#!/usr/bin/env bash
# Round-5 session-4 chain: full-scale endurance + resume stress.
#   nohup bash bash_scripts/tpu_chain_r5s4.sh > /tmp/chain_r5s4.log 2>&1 &
#
# The checkpoint/auto-resume subsystem (SURVEY §5: emergency ckpt,
# keep-last-3 GC, metrics-CSV truncation, trajectory replay) has only
# toy-scale CPU coverage (tests/test_parallel_and_resume.py). This
# chain stresses it at production scale and extends the round-5
# drift-shape story to 200 frames:
#   1. long200sn_part  — exact control WITH checkpoints, STOPPED at
#                        frame 120 (simulated interruption)
#   2. long200sn_res   — auto-resume from the latest params*.npz,
#                        continue to 200, full eval (the resume-
#                        continuity artifact)
#   3. long200sn_full  — uninterrupted 200-frame control (resume leg
#                        compares against THIS — continuity = equal
#                        within seed noise)
#   4. long200fs8      — fastlegal8 at 200 frames: does the flatter-
#                        drift crossover hold/grow at 2x length?
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r5s4_${TS}"
ART="artifacts/r5s4"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-12600}   # 3.5 h
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r5s4 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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

grab() { # grab <name> <seq>  — copy artifacts without wiping the dir
    local name="$1" seq="$2"
    for f in eval/eval_summary.json runtime_stats.json; do
        local src="experiments/Synthetic/${seq}/${f}"
        [ -s "$src" ] && cp "$src" "$ART/${name}_$(basename "$f")"
    done
    grep "\[progress\]" "$OUT/$name.txt" > "$ART/${name}_progress.txt" \
        2>/dev/null || true
}

A=isogs_slam_tpu/configs/synthetic/ablations
SEQ=abl_long200sn_res
CKPT_SETS="--set save_checkpoints=True --set checkpoint_interval=40"

# 1. interrupted leg: checkpoints on, stop at 120 (no final eval — the
#    interruption IS the point)
rm -rf "experiments/Synthetic/${SEQ}"
run long200sn_part 7000 python -m isogs_slam_tpu.scripts.splatam \
    "$A/full_res_silnorm.py" --end-at 120 --no-eval \
    --set data.num_frames=210 --set run_name=${SEQ} $CKPT_SETS
grep "\[progress\]" "$OUT/long200sn_part.txt" \
    > "$ART/long200sn_part_progress.txt" 2>/dev/null || true
ls "experiments/Synthetic/${SEQ}"/params*.npz \
    > "$ART/long200sn_part_checkpoints.txt" 2>/dev/null || true
commit_art "Measurement artifacts: long200 interrupted leg (r5s4 chain)"

# 2. auto-resume from latest checkpoint, run to 200, full eval
run long200sn_res 9000 python -m isogs_slam_tpu.scripts.splatam \
    "$A/full_res_silnorm.py" --end-at 200 \
    --set data.num_frames=210 --set run_name=${SEQ} $CKPT_SETS \
    --set load_checkpoint=True --set checkpoint_time_idx=-1
grab long200sn_res ${SEQ}
grep -i "resum" "$OUT/long200sn_res.txt" | head -5 \
    > "$ART/long200sn_res_resume_lines.txt" 2>/dev/null || true
commit_art "Measurement artifacts: long200 auto-resume leg (r5s4 chain)"

# 3. uninterrupted 200-frame control
rm -rf "experiments/Synthetic/abl_long200sn_full"
run long200sn_full 12000 python -m isogs_slam_tpu.scripts.splatam \
    "$A/full_res_silnorm.py" --end-at 200 \
    --set data.num_frames=210 --set run_name=abl_long200sn_full
grab long200sn_full abl_long200sn_full
commit_art "Measurement artifacts: long200 uninterrupted control (r5s4 chain)"

# 4. fastlegal8 at 200 frames (drift-shape crossover at 2x length)
rm -rf "experiments/Synthetic/abl_long200fs8"
run long200fs8 9000 python -m isogs_slam_tpu.scripts.splatam \
    "$A/full_res_fastlegal8.py" --end-at 200 \
    --set data.num_frames=210 --set run_name=abl_long200fs8
grab long200fs8 abl_long200fs8
commit_art "Measurement artifacts: long200 fastlegal8 drift leg (r5s4 chain)"

echo "== chain done ($(date +%H:%M:%S))"
commit_art "Measurement artifacts: r5s4 status"
