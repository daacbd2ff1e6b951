#!/usr/bin/env bash
# Round-3 session-4 chain #2 (strictly serial, ONE chip): the exact-tail
# polish ladder + the regularizer-free SplaTAM-parity quality run.
#   nohup bash bash_scripts/tpu_chain_r3s5.sh > /tmp/chain_r3s5.log 2>&1 &
#
# Queue (NOTES.md round-3 session 4):
#   mapsub4_pol4 — sub4 + 4 exact closing iters (stripe-staleness fix;
#                  13 exact-iter-equivalents vs 40)
#   mapsub4_pol8 — deeper tail ladder point (16 equivalents)
#   noreg        — flat=0/iso=0, sil 0.99: the reference's own headline
#                  regime (BASELINE.md numbers are SplaTAM-baseline)
#   bench_sub4_pol4 — bench with the polish fast mode
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r3s5_${TS}"
mkdir -p "$OUT"
echo "== chain r3s5 -> $OUT (pid $$)"

probe() {
    timeout 90 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024))
(x @ x).block_until_ready()
EOF
}

# wait for any in-flight chain to finish (ONE chip) — chains write a pid
# file while active
while [ -f /tmp/tpu_chain.pid ] && kill -0 "$(cat /tmp/tpu_chain.pid)" \
        2>/dev/null; do
    echo "== another chain active (pid $(cat /tmp/tpu_chain.pid)); sleep 300"
    sleep 300
done
echo $$ > /tmp/tpu_chain.pid

n=0
until probe; do
    n=$((n + 1))
    echo "== probe $n failed ($(date +%H:%M:%S)); tunnel down, sleeping 600s"
    if [ "$n" -ge 60 ]; then echo "== giving up after $n probes"; exit 1; fi
    sleep 600
done
echo "== tunnel UP at $(date +%H:%M:%S); starting"

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

quality_run mapsub4_pol4 "$A/full_res_mapsub4_pol4.py" \
    synthetic_room_fullres_mapsub4pol4_0
quality_run noreg "$A/full_res_noreg.py" synthetic_room_fullres_noreg_0
quality_run mapsub4_pol8 "$A/full_res_mapsub4_pol8.py" \
    synthetic_room_fullres_mapsub4pol8_0
# per-tile compositing-cap truncation adjudication (~6% true isects
# dropped at 512; the reference composites all)
quality_run kcap "$A/full_res_kcap.py" synthetic_room_fullres_kcap_0

BENCH_TILE_SUBSAMPLE=4 BENCH_MAP_POLISH=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_pol4 1500 python bench.py

# post-margin-0 cost attribution: exact mapping phase + exact tracking
run profile_map_exact 2000 python -m isogs_slam_tpu.tools.profile_map \
    --phases 2 --top 25
run profile_track_exact 2000 python -m isogs_slam_tpu.tools.profile_map \
    --track --top 25

rm -f /tmp/tpu_chain.pid
echo "== chain done ($(date +%H:%M:%S)); results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
grep -H 'Final Average ATE\|Average PSNR' "$OUT"/*_eval_summary.json \
    2>/dev/null || true
