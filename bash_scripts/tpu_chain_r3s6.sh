#!/usr/bin/env bash
# Round-3 session-5 chain (strictly serial, ONE chip).
#   nohup bash bash_scripts/tpu_chain_r3s6.sh > /tmp/chain_r3s6.log 2>&1 &
#
# Same adjudication set as tpu_chain_r3s5.sh but (a) priority-ordered so
# the most decision-relevant results land first if the tunnel dies, and
# (b) SELF-COMMITTING: the workspace (experiments/, gitignored) does NOT
# survive between sessions, so each run's summary is copied into the
# tracked artifacts/r3s6/ dir and committed immediately.
#
# Priority rationale:
#   bench_exact     — headline + the NEW pol4 fast-mode detail in one run
#   pol4 x3 seeds   — fast-mode quality contract (multi-seed medians;
#                     30-frame tracked ATE is chaos-dominated, NOTES r3s4)
#   exact x2 seeds  — the chaos noise scale (s0=1.26 known, same tree)
#   noreg           — SplaTAM-parity regime (flat=0/iso=0, sil 0.99)
#   polyak x3 seeds — pose-EMA tail tracking attack
#   kcap            — per-tile cap truncation adjudication
#   exact_s0        — same-tree confirmation of the 1.26 control
#   profiles        — post-margin-0 exact map/track cost attribution
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r3s6_${TS}"
ART="artifacts/r3s6"
mkdir -p "$OUT" "$ART"
echo "== chain r3s6 -> $OUT (pid $$)"

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
    if [ "$n" -ge 30 ]; then echo "== giving up after $n probes"; exit 1; fi
    sleep 600
done
echo "== tunnel UP at $(date +%H:%M:%S); starting"

commit_art() { # commit_art <msg>
    git add -A "$ART" 2>/dev/null
    git commit -q -m "$1" -- "$ART" 2>/dev/null \
        && echo "== committed: $1" || true
}

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
       "$ART/${name}_eval_summary.json" 2>/dev/null || true
    cp "experiments/Synthetic/${seq}/runtime_stats.json" \
       "$ART/${name}_runtime_stats.json" 2>/dev/null || true
    commit_art "Measurement artifacts: ${name} quality run (r3s6 chain)"
}

A=isogs_slam_tpu/configs/synthetic/ablations
F=isogs_slam_tpu/configs/synthetic/full_res.py

# 1. headline + pol4 fast-mode detail (bench.py fast detail now runs
# map-sub4 + exact_polish_iters=4 + track-sub4)
run bench_exact 2400 python bench.py
grep '"metric"' "$OUT/bench_exact.txt" > "$ART/bench_exact.json" || true
commit_art "Measurement artifacts: bench exact + pol4 fast detail (r3s6)"

# 2. fast-mode quality contract at 3 seeds
quality_run pol4_s0 "$A/full_res_mapsub4_pol4.py" \
    synthetic_room_fullres_mapsub4pol4_0
quality_run pol4_s1 "$A/full_res_mapsub4_pol4.py" abl_pol4_s1 \
    --set seed=1 --set run_name=abl_pol4_s1
quality_run pol4_s2 "$A/full_res_mapsub4_pol4.py" abl_pol4_s2 \
    --set seed=2 --set run_name=abl_pol4_s2

# 3. chaos noise scale: exact control extra seeds (s0 = 1.26, r3s4 tree)
quality_run exact_s1 "$F" abl_exact_s1 \
    --set seed=1 --set run_name=abl_exact_s1
quality_run exact_s2 "$F" abl_exact_s2 \
    --set seed=2 --set run_name=abl_exact_s2

# 4. the SplaTAM-parity regime (large expected effect)
quality_run noreg "$A/full_res_noreg.py" synthetic_room_fullres_noreg_0

# 5. Polyak pose-EMA at 3 seeds
quality_run polyak_s0 "$A/full_res_polyak.py" \
    synthetic_room_fullres_polyak_0
quality_run polyak_s1 "$A/full_res_polyak.py" abl_polyak_s1 \
    --set seed=1 --set run_name=abl_polyak_s1
quality_run polyak_s2 "$A/full_res_polyak.py" abl_polyak_s2 \
    --set seed=2 --set run_name=abl_polyak_s2

# 6. per-tile compositing-cap truncation (~6% true isects dropped at 512)
quality_run kcap "$A/full_res_kcap.py" synthetic_room_fullres_kcap_0

# 7. same-tree exact control confirmation
quality_run exact_s0 "$F" synthetic_room_fullres_0

# 8. post-margin-0 cost attribution
run profile_map_exact 2400 python -m isogs_slam_tpu.tools.profile_map \
    --phases 2 --top 25
cp "$OUT/profile_map_exact.txt" "$ART/" 2>/dev/null || true
run profile_track_exact 2400 python -m isogs_slam_tpu.tools.profile_map \
    --track --top 25
cp "$OUT/profile_track_exact.txt" "$ART/" 2>/dev/null || true
commit_art "Measurement artifacts: exact map/track profiles (r3s6)"

echo "== chain done ($(date +%H:%M:%S)); results in $OUT and $ART"
python -m isogs_slam_tpu.tools.seed_stats "$ART" \
    | tee "$ART/seed_stats.txt" || true
commit_art "Measurement artifacts: r3s6 multi-seed stats"
