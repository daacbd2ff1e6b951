#!/usr/bin/env bash
# Round-4 session-3 chain (strictly serial, ONE chip).
#   nohup bash bash_scripts/tpu_chain_r4s3.sh > /tmp/chain_r4s3.log 2>&1 &
#
# The r4s1 chain closed the regularizer cliff (silnorm, 3 seeds, ATE
# 0.135 cm median) and the session boundary cut it before polyak /
# noregsil05; the r4s2 chain never ran (its 18:45 wall-clock deadline is
# stale). This chain is the r4s2 battery under the NOW-DEFAULT silnorm
# tracking render (pipeline default flipped this session; the ablation
# configs inherit it), plus the polyak re-adjudication:
#   profiles      — map+track op profiles (r3s6 map profile was empty)
#   estopsn  x3   — tracking early-stop (patience 8): iter savings + quality
#   tsub4sn  x3   — tracking tile_subsample=4: the fast-tracking contract
#   kcapsn   x3   — adaptive per-tile cap: the true-drop semantics verdict
#   msub4sn  x3   — mapping sub4 + 4 exact tail iters: the fast-map contract
#   p99sn    x1   — sil_thres back to the reference 0.99 under silnorm
#   polyaksn x3   — polyak EMA under silnorm (r3s6 s1=1.41 was raw-regime)
#   long100  x1   — 100-frame silnorm run: drift shape at length
# Controls: silnorm_s0/s1/s2 (artifacts/r4s1) at 30 frames, same seeds.
# Decision rule: NOTES round-4 (medians over >= 3 seeds; real iff
# |delta| > 0.022 cm ATE / 0.6 dB PSNR, the measured silnorm 3-seed
# range; PROVISIONAL within 2x noise, long100 is the tiebreaker).
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r4s3_${TS}"
ART="artifacts/r4s3"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-18000}   # 5 h hard deadline: chip free for the
                                    # driver's round-end bench
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r4s3 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

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
        commit_art "Measurement artifacts: ${name} quality run (r4s3 chain)"
    else
        echo "== [$name] FAILED (rc=$RUN_RC, missing summaries) — no artifact"
        commit_art "Measurement status: ${name} run FAILED rc=$RUN_RC (r4s3 chain)"
    fi
}

A=isogs_slam_tpu/configs/synthetic/ablations

# 0. op-profile captures FIRST (they drive any further kernel work)
run profile_map 1800 python -m isogs_slam_tpu.tools.profile_map
[ -s "$OUT/profile_map.txt" ] && grep -q "device op time" "$OUT/profile_map.txt" \
    && cp "$OUT/profile_map.txt" "$ART/profile_map_exact.txt" \
    && commit_art "Measurement artifacts: exact map op profile (r4s3)"
run profile_track 1800 python -m isogs_slam_tpu.tools.profile_map --track
[ -s "$OUT/profile_track.txt" ] && grep -q "device op time" "$OUT/profile_track.txt" \
    && cp "$OUT/profile_track.txt" "$ART/profile_track_exact.txt" \
    && commit_art "Measurement artifacts: exact track op profile (r4s3)"

# 1. tracking early-stop under silnorm (throughput lever, quality gate)
quality_run estopsn_s0 "$A/full_res_earlystop.py" abl_estopsn_s0 30 \
    --set run_name=abl_estopsn_s0
quality_run estopsn_s1 "$A/full_res_earlystop.py" abl_estopsn_s1 30 \
    --set seed=1 --set run_name=abl_estopsn_s1
quality_run estopsn_s2 "$A/full_res_earlystop.py" abl_estopsn_s2 30 \
    --set seed=2 --set run_name=abl_estopsn_s2

# 2. tracking tile_subsample=4 under silnorm (the fast-tracking contract)
quality_run tsub4sn_s0 "$A/full_res_tracksub4.py" abl_tsub4sn_s0 30 \
    --set run_name=abl_tsub4sn_s0
quality_run tsub4sn_s1 "$A/full_res_tracksub4.py" abl_tsub4sn_s1 30 \
    --set seed=1 --set run_name=abl_tsub4sn_s1
quality_run tsub4sn_s2 "$A/full_res_tracksub4.py" abl_tsub4sn_s2 30 \
    --set seed=2 --set run_name=abl_tsub4sn_s2

# 3. adaptive per-tile cap under silnorm (the true-drop semantics verdict)
quality_run kcapsn_s0 "$A/full_res_kcap.py" abl_kcapsn_s0 30 \
    --set run_name=abl_kcapsn_s0
quality_run kcapsn_s1 "$A/full_res_kcap.py" abl_kcapsn_s1 30 \
    --set seed=1 --set run_name=abl_kcapsn_s1
quality_run kcapsn_s2 "$A/full_res_kcap.py" abl_kcapsn_s2 30 \
    --set seed=2 --set run_name=abl_kcapsn_s2

# 4. mapping sub4 + exact tail under silnorm (the fast-map contract)
quality_run msub4sn_s0 "$A/full_res_mapsub4_pol4.py" abl_msub4sn_s0 30 \
    --set run_name=abl_msub4sn_s0
quality_run msub4sn_s1 "$A/full_res_mapsub4_pol4.py" abl_msub4sn_s1 30 \
    --set seed=1 --set run_name=abl_msub4sn_s1
quality_run msub4sn_s2 "$A/full_res_mapsub4_pol4.py" abl_msub4sn_s2 30 \
    --set seed=2 --set run_name=abl_msub4sn_s2

# 5. reference threshold under silnorm (config-simplification check)
quality_run p99sn_s0 "$A/full_res_silnorm.py" abl_p99sn_s0 30 \
    --set tracking.sil_thres=0.99 --set run_name=abl_p99sn_s0

# 6. polyak EMA under silnorm (r3s6's 1.41-vs-2.5 was the raw regime;
#    does the EMA still help at the 0.135 cm noise floor?)
quality_run polyaksn_s0 "$A/full_res_polyak.py" abl_polyaksn_s0 30 \
    --set run_name=abl_polyaksn_s0
quality_run polyaksn_s1 "$A/full_res_polyak.py" abl_polyaksn_s1 30 \
    --set seed=1 --set run_name=abl_polyaksn_s1
quality_run polyaksn_s2 "$A/full_res_polyak.py" abl_polyaksn_s2 30 \
    --set seed=2 --set run_name=abl_polyaksn_s2

# 7. 100-frame drift shape (variance-aware protocol tiebreaker)
quality_run long100sn_s0 "$A/full_res_silnorm.py" abl_long100sn_s0 100 \
    --set data.num_frames=110 --set run_name=abl_long100sn_s0

echo "== chain done ($(date +%H:%M:%S)); results in $OUT and $ART"
python -m isogs_slam_tpu.tools.seed_stats "$ART" artifacts/r4s1 artifacts/r3s6 \
    | tee "$ART/seed_stats.txt" || true
commit_art "Measurement artifacts: r4s3 multi-seed stats + status"
