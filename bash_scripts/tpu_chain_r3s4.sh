#!/usr/bin/env bash
# Round-3 session-4 adjudication chain (strictly serial, ONE chip):
# the fast-mode ladder under dense Adam + margin-0 defaults.
#   nohup bash bash_scripts/tpu_chain_r3s4.sh > /tmp/chain_r3s4.log 2>&1 &
#
# Queue (NOTES.md round-3 session 4):
#   mapsub2        — contract check at sub=2 (halved underfit)
#   tracksub4      — tracking-subsample ATE cost, mapping exact
#   mapsub4_it60   — middle iteration-ladder point
#   fast2          — production candidate: mapsub2 + track4 combined
#   bench_fast2    — bench with the candidate env (headline + detail)
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r3s4_${TS}"
mkdir -p "$OUT"
echo "== chain r3s4 -> $OUT (pid $$)"

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
    if [ "$n" -ge 60 ]; then echo "== giving up after $n probes"; exit 1; fi
    sleep 600
done
echo "== tunnel UP at $(date +%H:%M:%S); starting ladder"

run() { # run <name> <timeout_s> <cmd...>
    local name="$1" to="$2"; shift 2
    echo "== [$name] $* ($(date +%H:%M:%S))" | tee -a "$OUT/log.txt"
    timeout "$to" "$@" 2>&1 | tee "$OUT/$name.txt" | tail -3
    local rc=${PIPESTATUS[0]}
    echo "== [$name] exit $rc" | tee -a "$OUT/log.txt"
}

quality_run() { # quality_run <name> <config> <sequence>
    local name="$1" cfg="$2" seq="$3"
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 4000 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
        --end-at 30
    cp "experiments/Synthetic/${seq}/eval/eval_summary.json" \
       "$OUT/${name}_eval_summary.json" 2>/dev/null || true
    cp "experiments/Synthetic/${seq}/runtime_stats.json" \
       "$OUT/${name}_runtime_stats.json" 2>/dev/null || true
}

A=isogs_slam_tpu/configs/synthetic/ablations

quality_run mapsub2 "$A/full_res_mapsub2.py" synthetic_room_fullres_mapsub2_0
quality_run tracksub4 "$A/full_res_tracksub4.py" \
    synthetic_room_fullres_tracksub_0
quality_run mapsub4_it60 "$A/full_res_mapsub4_it60.py" \
    synthetic_room_fullres_mapsub4it60_0
quality_run fast2 "$A/full_res_fast2.py" synthetic_room_fullres_fast2_0

# bench with the fast2 candidate env (the fast_mode detail line)
BENCH_TILE_SUBSAMPLE=2 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_fast2 1500 python bench.py

echo "== chain done ($(date +%H:%M:%S)); results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
grep -H 'Final Average ATE\|Average PSNR' "$OUT"/*_eval_summary.json \
    2>/dev/null || true
