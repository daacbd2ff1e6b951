#!/usr/bin/env bash
# Round-3 session-4 chain #2 (strictly serial, ONE chip).
#   nohup bash bash_scripts/tpu_chain_r3s5.sh > /tmp/chain_r3s5.log 2>&1 &
#
# The it40/60/80 sub4 ladder came out NON-MONOTONE (2.35 / 3.24 / 1.48):
# 30-frame tracked ATE is chaos-dominated at the 1.5-3 cm scale, so
# single runs cannot adjudicate the <=1.39 contract. This chain:
#   noreg          — flat=0/iso=0 SplaTAM-parity run (expected LARGE
#                    effect; BASELINE.md's 0.28 cm is measured this way)
#   exact  x3 seeds — control + the chaos noise scale
#   pol4   x3 seeds — sub4 + 4 exact closing iters (stripe-staleness fix)
#   kcap            — per-tile cap truncation adjudication (~6% dropped)
#   bench_sub4_pol4 — throughput of the polish fast mode
#   profiles        — post-margin-0 exact map/track cost attribution
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

quality_run() { # quality_run <name> <config> <sequence> [extra --set args]
    local name="$1" cfg="$2" seq="$3"; shift 3
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 4000 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
        --end-at 30 "$@"
    cp "experiments/Synthetic/${seq}/eval/eval_summary.json" \
       "$OUT/${name}_eval_summary.json" 2>/dev/null || true
    cp "experiments/Synthetic/${seq}/runtime_stats.json" \
       "$OUT/${name}_runtime_stats.json" 2>/dev/null || true
}

A=isogs_slam_tpu/configs/synthetic/ablations
F=isogs_slam_tpu/configs/synthetic/full_res.py

# 1. the SplaTAM-parity regime (large expected effect)
quality_run noreg "$A/full_res_noreg.py" synthetic_room_fullres_noreg_0

# 2. chaos noise scale: exact control at 3 seeds
quality_run exact_s0 "$F" synthetic_room_fullres_0
quality_run exact_s1 "$F" abl_exact_s1 \
    --set seed=1 --set run_name=abl_exact_s1
quality_run exact_s2 "$F" abl_exact_s2 \
    --set seed=2 --set run_name=abl_exact_s2

# 3. polish fast mode at 3 seeds
quality_run pol4_s0 "$A/full_res_mapsub4_pol4.py" \
    synthetic_room_fullres_mapsub4pol4_0
quality_run pol4_s1 "$A/full_res_mapsub4_pol4.py" abl_pol4_s1 \
    --set seed=1 --set run_name=abl_pol4_s1
quality_run pol4_s2 "$A/full_res_mapsub4_pol4.py" abl_pol4_s2 \
    --set seed=2 --set run_name=abl_pol4_s2

# 4. Polyak pose-EMA at 3 seeds (single-frame probe: 1.17 -> 0.33 mm
# vs best-candidate at zero extra renders; variance cut, not metric
# descent, so the fan's gauge-drift mechanism does not apply)
quality_run polyak_s0 "$A/full_res_polyak.py" \
    synthetic_room_fullres_polyak_0
quality_run polyak_s1 "$A/full_res_polyak.py" abl_polyak_s1 \
    --set seed=1 --set run_name=abl_polyak_s1
quality_run polyak_s2 "$A/full_res_polyak.py" abl_polyak_s2 \
    --set seed=2 --set run_name=abl_polyak_s2

# 5. per-tile compositing-cap truncation (~6% true isects dropped at 512)
quality_run kcap "$A/full_res_kcap.py" synthetic_room_fullres_kcap_0

# 5. throughput of the polish fast mode
BENCH_TILE_SUBSAMPLE=4 BENCH_MAP_POLISH=4 BENCH_TRACK_TILE_SUBSAMPLE=4 \
    run bench_sub4_pol4 1500 python bench.py

# 6. post-margin-0 cost attribution
run profile_map_exact 2400 python -m isogs_slam_tpu.tools.profile_map \
    --phases 2 --top 25
run profile_track_exact 2400 python -m isogs_slam_tpu.tools.profile_map \
    --track --top 25

echo "== chain done ($(date +%H:%M:%S)); results in $OUT"
grep -h '"metric"' "$OUT"/bench_*.txt 2>/dev/null
grep -H 'Final Average ATE\|Average PSNR' "$OUT"/*_eval_summary.json \
    2>/dev/null || true
