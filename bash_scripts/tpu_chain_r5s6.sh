#!/usr/bin/env bash
# Round-5 session-6 chain: execute the r5s5 PRODUCT-WORKFLOW plan after
# the VM restart wiped experiments/ (the r5s4 200-frame checkpoint is
# gone). Self-contained at 100-frame scale:
#   0. slam100   — regenerate a checkpoint: fastlegal8 (the adjudicated
#                  long-sequence fast mode) 100 frames WITH checkpoints,
#                  full eval; num_frames pinned to 100 so downstream
#                  trajectory consumers clip cleanly.
#   1. postopt   — post-SLAM map optimization against the ESTIMATED
#                  trajectory (scripts/post_splatam_opt.py), full eval
#   2. mesh      — watertight mesh extraction (block-tiled density +
#                  marching tets) from the SLAM checkpoint
#   3. mesheval  — accuracy/completion/chamfer/F-score vs the ANALYTIC
#                  wall geometry (tools/synth_gt_mesh.py)
#   4. exportply — 3DGS-viewer PLY export
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r5s6_${TS}"
ART="artifacts/r5s6"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-3300}    # 55 min — must end before the driver bench
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r5s6 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

remaining() { echo $(( CHAIN_MAX_S - ($(date +%s) - T0) )); }

probe() {
    timeout 90 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024))
(x @ x).block_until_ready()
EOF
}

probe || { echo "== tunnel DOWN — aborting (no time to wait)"; \
           echo -e "probe\t1\t0\ttunnel down" >> "$STATUS"; exit 1; }
echo "== tunnel UP at $(date +%H:%M:%S); starting"

commit_art() {
    git add -A "$ART" 2>/dev/null
    git commit -q -m "$1" -- "$ART" 2>/dev/null \
        && echo "== committed: $1" || true
}

run() {
    local name="$1" to="$2"; shift 2
    local rem; rem=$(remaining)
    if [ "$rem" -lt 240 ]; then
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

A=isogs_slam_tpu/configs/synthetic/ablations
SEQ=abl_r5s6_fs8_100

# 0. regenerate the source checkpoint: fastlegal8, 100 frames, ckpts on
rm -rf "experiments/Synthetic/${SEQ}"
run slam100 1700 python -m isogs_slam_tpu.scripts.splatam \
    "$A/full_res_fastlegal8.py" --set data.num_frames=100 \
    --set run_name=${SEQ} \
    --set save_checkpoints=True --set checkpoint_interval=40
for f in eval/eval_summary.json runtime_stats.json; do
    src="experiments/Synthetic/${SEQ}/${f}"
    [ -s "$src" ] && cp "$src" "$ART/slam100_$(basename "$f")"
done
grep "\[progress\]" "$OUT/slam100.txt" > "$ART/slam100_progress.txt" \
    2>/dev/null || true
commit_art "Measurement artifacts: r5s6 slam100 source run (product workflow)"

[ -e "experiments/Synthetic/${SEQ}/params100.npz" ] || \
    ls "experiments/Synthetic/${SEQ}"/params*.npz > /dev/null 2>&1 || {
    echo "== no checkpoint produced — aborting"; exit 1; }

# minimal config pointing the checkpoint-consuming CLIs at the run
CKPT_CFG="$OUT/ckpt_cfg.py"
cat > "$CKPT_CFG" <<EOF
config = dict(workdir="./experiments/Synthetic", run_name="${SEQ}")
EOF

# 1. post-SLAM optimization + full eval (config's param_run_name
#    overridden to the regenerated run via a thin wrapper config)
POSTCFG="$OUT/postopt_cfg.py"
cat > "$POSTCFG" <<EOF
import runpy
config = runpy.run_path(
    "configs/synthetic/post_splatam_opt_fullres.py")["config"]
config["run_name"] = "abl_r5s6_postopt"
config["data"]["param_run_name"] = "${SEQ}"
config["data"]["num_frames"] = 100
EOF
rm -rf experiments/Synthetic/abl_r5s6_postopt
run postopt 1500 python -m isogs_slam_tpu.scripts.post_splatam_opt "$POSTCFG"
if [ -s experiments/Synthetic/abl_r5s6_postopt/eval/eval_summary.json ]; then
    cp experiments/Synthetic/abl_r5s6_postopt/eval/eval_summary.json \
        "$ART/postopt_eval_summary.json"
    commit_art "Measurement artifacts: post-SLAM opt on estimated trajectory (r5s6)"
else
    commit_art "Measurement status: postopt FAILED rc=$RUN_RC (r5s6)"
fi

# 2. mesh extraction from the SLAM checkpoint (timing in the log)
run mesh 1200 python -m isogs_slam_tpu.scripts.extract_mesh_fast \
    "$CKPT_CFG" --voxel-size 0.02 --no-show \
    --output "$OUT/mesh100.ply"
MESH="$OUT/mesh100.ply"
[ -s "$MESH" ] || MESH=$(ls "experiments/Synthetic/${SEQ}"/*.ply 2>/dev/null | head -1)
if [ -s "$MESH" ]; then
    grep -iE "vert|face|density|second|time|block" "$OUT/mesh.txt" \
        | head -20 > "$ART/mesh_log.txt" || true
    commit_art "Measurement artifacts: mesh extraction log (r5s6)"
fi

# 3. geometry eval vs the analytic GT walls
run gtmesh 300 python -m isogs_slam_tpu.tools.synth_gt_mesh \
    --out "$OUT/gt_room.ply" --subdiv 16
if [ -s "$MESH" ] && [ -s "$OUT/gt_room.ply" ]; then
    run mesheval 900 python -m isogs_slam_tpu.scripts.eval_mesh_geometry \
        "$CKPT_CFG" --gt-mesh "$OUT/gt_room.ply" --pred-mesh "$MESH" \
        --num-samples 200000
    cp "$OUT/mesheval.txt" "$ART/mesheval.txt" 2>/dev/null || true
    find "experiments/Synthetic/${SEQ}" -name 'mesh_geometry*' \
        -exec cp {} "$ART/" \; 2>/dev/null || true
    commit_art "Measurement artifacts: mesh geometry vs analytic GT (r5s6)"
fi

# 4. 3DGS PLY export
run exportply 600 python -m isogs_slam_tpu.scripts.export_ply "$CKPT_CFG"
ls -la "experiments/Synthetic/${SEQ}"/splat*.ply \
    > "$ART/exportply_ls.txt" 2>/dev/null || true
commit_art "Measurement artifacts: r5s6 status + export"

echo "== chain done ($(date +%H:%M:%S))"
