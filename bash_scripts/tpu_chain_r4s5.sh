#!/usr/bin/env bash
# Round-4 FINAL chain: rerun fastlegal x3 after the vmem fix.
#   Launch AFTER tpu_chain_r4s4.sh exits:
#   nohup bash bash_scripts/tpu_chain_r4s5.sh > /tmp/chain_r4s5.log 2>&1 &
#
# The r4s4 fastlegal runs crashed at the first cap escalation: the
# subset-path composite backward's f32 dgdata block put the kernel 1 KB
# over the 16 MB scoped-vmem limit at K=768 (status.tsv rc=1 x3). Fixed
# by emitting the cotangent in bf16 on that path (its consumer is the
# bf16 scatter anyway). This chain reruns the 3 seeds; short deadline so
# the driver's round-end bench gets the chip.
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r4s5_${TS}"
ART="artifacts/r4s4"      # same artifact family the verdict reads
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-3600}
T0=$(date +%s)
STATUS="$ART/status_r4s5.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r4s5 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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
    echo "== probe $n failed; sleeping 300s"
    [ "$n" -ge 3 ] && { echo "== giving up"; exit 1; }
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
    local name="$1" cfg="$2" seq="$3" end="$4"; shift 4
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 2400 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
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
        commit_art "Measurement artifacts: ${name} quality run (r4s5 chain)"
    else
        echo "== [$name] FAILED (rc=$RUN_RC)"
        commit_art "Measurement status: ${name} run FAILED rc=$RUN_RC (r4s5 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations

quality_run fastlegal_s0 "$A/full_res_fastlegal.py" \
    synthetic_room_fullres_fastlegal_0 30
quality_run fastlegal_s1 "$A/full_res_fastlegal.py" abl_fastlegal_s1 30 \
    --set seed=1 --set run_name=abl_fastlegal_s1
quality_run fastlegal_s2 "$A/full_res_fastlegal.py" abl_fastlegal_s2 30 \
    --set seed=2 --set run_name=abl_fastlegal_s2

echo "== chain done ($(date +%H:%M:%S))"
python -m isogs_slam_tpu.tools.contracts --control silnorm \
    artifacts/r4s4 artifacts/r4s3 artifacts/r4s1 \
    | tee "$ART/contracts.txt" || true
commit_art "Measurement artifacts: r4s5 contracts + status"
