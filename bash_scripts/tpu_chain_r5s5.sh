#!/usr/bin/env bash
# Round-5 session-5 chain: the full PRODUCT WORKFLOW at production
# scale, downstream of the r5s4 endurance checkpoint (200 frames,
# 1.18M Gaussians):
#   1. postopt200  — post-SLAM map optimization against the estimated
#                    trajectory (scripts/post_splatam_opt.py), full eval
#   2. mesh200     — watertight mesh extraction (block-tiled density +
#                    marching tets) from the SLAM checkpoint
#   3. mesheval200 — accuracy/completion/chamfer/F-score vs the
#                    ANALYTIC wall geometry (tools/synth_gt_mesh.py —
#                    the synthetic scene's true surfaces)
#   4. exportply   — 3DGS-viewer PLY export
# Requires experiments/Synthetic/abl_long200sn_res from chain r5s4
# (same session — experiments/ does not survive VM restarts).
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d_%H%M%S)
OUT="experiments/tpu_chain_r5s5_${TS}"
ART="artifacts/r5s5"
mkdir -p "$OUT" "$ART"
CHAIN_MAX_S=${CHAIN_MAX_S:-5400}    # 1.5 h
T0=$(date +%s)
STATUS="$ART/status.tsv"
echo -e "step\trc\tseconds\tnote" > "$STATUS"
echo "== chain r5s5 -> $OUT (pid $$, deadline ${CHAIN_MAX_S}s)"

SRC_RUN="experiments/Synthetic/abl_long200sn_res"
if [ ! -d "$SRC_RUN" ] || ! ls "$SRC_RUN"/params*.npz > /dev/null 2>&1; then
    echo "== source checkpoint $SRC_RUN missing (VM restart?) — aborting"
    echo -e "precheck\t1\t0\tno source checkpoint" >> "$STATUS"
    exit 1
fi

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
    echo "== probe $n failed; sleeping 600s"
    [ "$n" -ge 3 ] && { echo "== giving up"; exit 1; }
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
    if [ "$rem" -lt 300 ]; then
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

# minimal config pointing the checkpoint-consuming CLIs at the r5s4 run
CKPT_CFG="$OUT/ckpt_cfg.py"
cat > "$CKPT_CFG" <<'EOF'
config = dict(workdir="./experiments/Synthetic",
              run_name="abl_long200sn_res")
EOF

# 1. post-SLAM optimization + full eval
rm -rf experiments/Synthetic/abl_long200sn_postopt
run postopt200 4200 python -m isogs_slam_tpu.scripts.post_splatam_opt \
    configs/synthetic/post_splatam_opt_fullres.py
if [ -s experiments/Synthetic/abl_long200sn_postopt/eval/eval_summary.json ]; then
    cp experiments/Synthetic/abl_long200sn_postopt/eval/eval_summary.json \
        "$ART/postopt200_eval_summary.json"
    commit_art "Measurement artifacts: post-SLAM opt at 200-frame scale (r5s5)"
else
    commit_art "Measurement status: postopt200 FAILED rc=$RUN_RC (r5s5)"
fi

# 2. mesh extraction from the SLAM checkpoint (timing in the log)
run mesh200 2400 python -m isogs_slam_tpu.scripts.extract_mesh_fast \
    "$CKPT_CFG" --voxel-size 0.02 --no-show \
    --output "$OUT/mesh200.ply"
MESH="$OUT/mesh200.ply"
[ -s "$MESH" ] || MESH=$(ls "$SRC_RUN"/*.ply 2>/dev/null | head -1)
if [ -s "$MESH" ]; then
    grep -iE "vert|face|density|second|time|block" "$OUT/mesh200.txt" \
        | head -20 > "$ART/mesh200_log.txt" || true
    commit_art "Measurement artifacts: 200-frame mesh extraction log (r5s5)"
fi

# 3. geometry eval vs the analytic GT walls
run gtmesh 300 python -m isogs_slam_tpu.tools.synth_gt_mesh \
    --out "$OUT/gt_room.ply" --subdiv 16
if [ -s "$MESH" ] && [ -s "$OUT/gt_room.ply" ]; then
    run mesheval200 1800 python -m isogs_slam_tpu.scripts.eval_mesh_geometry \
        "$CKPT_CFG" --gt-mesh "$OUT/gt_room.ply" --pred-mesh "$MESH" \
        --num-samples 200000
    cp "$OUT/mesheval200.txt" "$ART/mesheval200.txt" 2>/dev/null || true
    find "$SRC_RUN" -name 'mesh_geometry*' -exec cp {} "$ART/" \; \
        2>/dev/null || true
    commit_art "Measurement artifacts: mesh geometry vs analytic GT (r5s5)"
fi

# 4. 3DGS PLY export
run exportply 900 python -m isogs_slam_tpu.scripts.export_ply "$CKPT_CFG"
ls -la "$SRC_RUN"/splat*.ply > "$ART/exportply_ls.txt" 2>/dev/null || true
commit_art "Measurement artifacts: r5s5 status + export"

echo "== chain done ($(date +%H:%M:%S))"
