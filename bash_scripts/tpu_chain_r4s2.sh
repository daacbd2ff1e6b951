#!/usr/bin/env bash
# Round-4 session-2 chain (strictly serial, ONE chip).
#   Launch AFTER the r4s1 chain exits, e.g.:
#   nohup bash bash_scripts/wait_then_r4s2.sh > /tmp/chain_r4s2.log 2>&1 &
#
# r4s1's first result (silnorm_s0: ATE 0.13 cm / PSNR 34.97 with the full
# IsoGS regularizers ON, vs the exact family's 1.26-3.42 cm / 19.5 dB)
# confirms the silhouette-bias mechanism. This chain re-adjudicates the
# open throughput/semantics contracts UNDER the silnorm regime, where the
# seed noise is ~20x smaller and the contracts become decidable
# (VERDICT items 3, 4, 5):
#   estopsn  x3  — tracking early-stop (patience 8): iter savings + quality
#   tsub4sn  x3  — tracking tile_subsample=4: the fast-tracking contract
#   kcapsn   x3  — adaptive per-tile cap: the true-drop semantics verdict
#   msub4sn  x3  — mapping sub4 + 4 exact tail iters: the fast-map contract
#   p99sn    x1  — sil_thres back to the reference 0.99 under silnorm
#   long100  x1  — 100-frame silnorm run: drift shape at length (protocol)
#   profiles — re-capture map+track op profiles (r3s6 map profile was empty)
# Controls: silnorm_s0/s1/s2 (r4s1) at 30 frames, same seeds.
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r4s2_${TS}"
ART="artifacts/r4s2"
mkdir -p "$OUT" "$ART"
# default deadline: chip free by 18:45 local (driver round-end bench
# needs the chip); overridable via CHAIN_MAX_S
if [ -z "${CHAIN_MAX_S:-}" ]; then
    now=$(date +%s); cutoff=$(date -d "18:45" +%s)
    CHAIN_MAX_S=$(( cutoff - now )); [ "$CHAIN_MAX_S" -lt 900 ] && CHAIN_MAX_S=900
fi
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r4s2 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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

quality_run() { # quality_run <name> <config> <sequence> <end_at> [extra --set]
    local name="$1" cfg="$2" seq="$3" end="$4"; shift 4
    rm -rf "experiments/Synthetic/${seq}"
    run "$name" 4000 python -m isogs_slam_tpu.scripts.splatam "$cfg" \
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
        commit_art "Measurement artifacts: ${name} quality run (r4s2 chain)"
    else
        echo "== [$name] FAILED (rc=$RUN_RC, missing summaries) — no artifact"
        commit_art "Measurement status: ${name} run FAILED rc=$RUN_RC (r4s2 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations
SN="--set tracking.sil_norm_render=True"

# 0. op-profile captures FIRST (r3s6 map profile artifact was empty;
#    these drive any further kernel work this round)
run profile_map 1800 python -m isogs_slam_tpu.tools.profile_map
[ -s "$OUT/profile_map.txt" ] && grep -q "device op time" "$OUT/profile_map.txt" \
    && cp "$OUT/profile_map.txt" "$ART/profile_map_exact.txt" \
    && commit_art "Measurement artifacts: exact map op profile (r4s2)"
run profile_track 1800 python -m isogs_slam_tpu.tools.profile_map --track
[ -s "$OUT/profile_track.txt" ] && grep -q "device op time" "$OUT/profile_track.txt" \
    && cp "$OUT/profile_track.txt" "$ART/profile_track_exact.txt" \
    && commit_art "Measurement artifacts: exact track op profile (r4s2)"

# 1. tracking early-stop under silnorm (throughput lever, quality gate)
quality_run estopsn_s0 "$A/full_res_earlystop.py" abl_estopsn_s0 30 \
    $SN --set run_name=abl_estopsn_s0
quality_run estopsn_s1 "$A/full_res_earlystop.py" abl_estopsn_s1 30 \
    $SN --set seed=1 --set run_name=abl_estopsn_s1
quality_run estopsn_s2 "$A/full_res_earlystop.py" abl_estopsn_s2 30 \
    $SN --set seed=2 --set run_name=abl_estopsn_s2

# 2. tracking tile_subsample=4 under silnorm (the fast-tracking contract)
quality_run tsub4sn_s0 "$A/full_res_tracksub4.py" abl_tsub4sn_s0 30 \
    $SN --set run_name=abl_tsub4sn_s0
quality_run tsub4sn_s1 "$A/full_res_tracksub4.py" abl_tsub4sn_s1 30 \
    $SN --set seed=1 --set run_name=abl_tsub4sn_s1
quality_run tsub4sn_s2 "$A/full_res_tracksub4.py" abl_tsub4sn_s2 30 \
    $SN --set seed=2 --set run_name=abl_tsub4sn_s2

# 3. adaptive per-tile cap under silnorm (the true-drop semantics verdict)
quality_run kcapsn_s0 "$A/full_res_kcap.py" abl_kcapsn_s0 30 \
    $SN --set run_name=abl_kcapsn_s0
quality_run kcapsn_s1 "$A/full_res_kcap.py" abl_kcapsn_s1 30 \
    $SN --set seed=1 --set run_name=abl_kcapsn_s1
quality_run kcapsn_s2 "$A/full_res_kcap.py" abl_kcapsn_s2 30 \
    $SN --set seed=2 --set run_name=abl_kcapsn_s2

# 4. mapping sub4 + exact tail under silnorm (the fast-map contract)
quality_run msub4sn_s0 "$A/full_res_mapsub4_pol4.py" abl_msub4sn_s0 30 \
    $SN --set run_name=abl_msub4sn_s0
quality_run msub4sn_s1 "$A/full_res_mapsub4_pol4.py" abl_msub4sn_s1 30 \
    $SN --set seed=1 --set run_name=abl_msub4sn_s1
quality_run msub4sn_s2 "$A/full_res_mapsub4_pol4.py" abl_msub4sn_s2 30 \
    $SN --set seed=2 --set run_name=abl_msub4sn_s2

# 5. reference threshold under silnorm (config-simplification check)
quality_run p99sn_s0 "$A/full_res_silnorm.py" abl_p99sn_s0 30 \
    --set tracking.sil_thres=0.99 --set run_name=abl_p99sn_s0

# 6. 100-frame drift shape (variance-aware protocol, VERDICT item 3)
quality_run long100sn_s0 "$A/full_res_silnorm.py" abl_long100sn_s0 100 \
    --set data.num_frames=110 --set run_name=abl_long100sn_s0

echo "== chain done ($(date +%H:%M:%S)); results in $OUT and $ART"
python -m isogs_slam_tpu.tools.seed_stats "$ART" artifacts/r4s1 artifacts/r3s6 \
    | tee "$ART/seed_stats.txt" || true
commit_art "Measurement artifacts: r4s2 multi-seed stats + status"
