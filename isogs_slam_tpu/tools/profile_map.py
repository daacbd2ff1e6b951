"""Profile the mapping/tracking step at bench scale on the real chip.

Builds the same synthetic scene as bench.py, runs a few mapping phases
under jax.profiler, then parses the trace and prints the top XLA ops by
accumulated device time — the ground truth for per-iteration cost
attribution (micro-benchmarks through the axon tunnel are unreliable;
NOTES.md lever 1e).

Usage:
  python -m isogs_slam_tpu.tools.profile_map [--h 680 --w 1200]
      [--phases 2] [--track] [--top 40]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile


def build_scene(H, W, map_iters, tile_sub=1, cull=False,
                tight_rect=False, isect_per_gaussian=2.5,
                isect_cap=0, vmap_bins=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core import gaussians as G
    from ..datasets.synthetic import SyntheticDataset
    from ..ops.rasterize import RasterConfig
    from ..slam.losses import LossConfig
    from ..slam.mapping import MappingConfig, PruneConfig
    from ..slam.pointcloud import add_new_gaussians, initialize_first_frame
    from ..utils.transforms import rotmat_to_quat

    n_wall = max(400, (H * W) // 40)
    ds = SyntheticDataset(num_frames=8, height=H, width=W,
                          n_per_wall=n_wall)
    cam = ds.cam
    rcfg = RasterConfig(tile_cull=cull, tight_rect=tight_rect,
                        isect_per_gaussian=isect_per_gaussian,
                        max_isect_cap=isect_cap)
    lcfg = LossConfig(
        tracking=False, use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
        w_flat=50.0, w_iso=2.0, iso_sample_size=8192, iso_k=16,
        calc_iso=True, knn_block=8192)
    mcfg = MappingConfig(
        num_iters=map_iters, lr_means3d=0.0001, lr_rgb_colors=0.0025,
        lr_unnorm_rotations=0.001, lr_logit_opacities=0.05,
        lr_log_scales=0.001,
        prune=PruneConfig(True, 0, 0, 20, 20, 0.005, 0.005, False, 500),
        tile_subsample=tile_sub, vmap_bins=vmap_bins)

    key = jax.random.PRNGKey(0)

    def frame(i):
        color, depth, _, pose = ds[i]
        im = jnp.asarray(color, jnp.float32).transpose(2, 0, 1) / 255.0
        d = jnp.asarray(depth, jnp.float32).transpose(2, 0, 1)
        w2c = np.linalg.inv(np.asarray(pose, np.float64))
        q = np.asarray(rotmat_to_quat(jnp.asarray(w2c[:3, :3], jnp.float32)))
        return im, d, q.astype(np.float32), w2c[:3, 3].astype(np.float32)

    im0, d0, q0, t0 = frame(0)
    key, sub = jax.random.split(key)
    capacity = G.round_capacity(int(H * W * 1.5), 65536)
    state = initialize_first_frame(im0, d0, cam, capacity, sub, 3.0)
    # densify from a couple more views to reach bench-scale N
    for i in (2, 4):
        im, d, q, t = frame(i)
        key, k1 = jax.random.split(key)
        state = add_new_gaussians(state, im, d, jnp.asarray(q),
                                  jnp.asarray(t), float(i), k1, cam, rcfg,
                                  sil_thres=0.5)

    S = 4
    kf_colors = jnp.stack([
        (frame(i)[0].transpose(1, 2, 0) * 255).astype(jnp.uint8)
        for i in range(S)])
    kf_depths = jnp.stack([frame(i)[1][0] for i in range(S)])
    kf_quats = jnp.stack([jnp.asarray(frame(i)[2]) for i in range(S)])
    kf_trans = jnp.stack([jnp.asarray(frame(i)[3]) for i in range(S)])
    return (state, kf_colors, kf_depths, kf_quats, kf_trans, cam, rcfg,
            lcfg, mcfg, frame)


def parse_trace(trace_dir, top=40):
    """Sum device-time by op name from the profiler's trace.json.gz."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid names containing "TPU" and
    # thread names like "XLA Ops"
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_op = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e["pid"], "")
        tname = tid_name.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Op" not in tname and "Steps" not in tname \
                and "XLA Modules" not in tname:
            continue
        if "XLA Op" not in tname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_op[name] = by_op.get(name, 0.0) + dur
        total += dur
    print(f"\n=== device op time (total {total:.1f} ms) "
          f"from {os.path.basename(path)} ===")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:10.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--phases", type=int, default=2)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--track", action="store_true",
                    help="profile tracking instead of mapping")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--tile-sub", type=int, default=1,
                    help="mapping.tile_subsample (fast-mapping mode)")
    ap.add_argument("--tight-rect", action="store_true",
                    help="enable raster.tight_rect (opacity-aware "
                         "exact-ellipse binning rects)")
    ap.add_argument("--isect-per-gaussian", type=float, default=2.5,
                    help="static intersection capacity multiplier")
    ap.add_argument("--cull", action="store_true",
                    help="enable raster.tile_cull (zero-contribution "
                         "slot culling)")
    ap.add_argument("--isect-cap", type=int, default=0,
                    help="static isect capacity override in rows "
                         "(raster.max_isect_cap; 0 = N-proportional)")
    ap.add_argument("--vmap-bins", action="store_true",
                    help="batch per-slot binnings with vmap "
                         "(mapping.vmap_bins)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from ..utils.common import acquire_tpu_lock, enable_compilation_cache
    acquire_tpu_lock()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    (state, kf_colors, kf_depths, kf_quats, kf_trans, cam, rcfg, lcfg,
     mcfg, frame) = build_scene(args.h, args.w, args.iters, args.tile_sub,
                 args.cull, args.tight_rect, args.isect_per_gaussian,
                 args.isect_cap, args.vmap_bins)
    print("n_gaussians:", int(jnp.sum(state.alive)), flush=True)

    rng = np.random.default_rng(0)
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="isogs_trace_")

    if args.track:
        from ..ops.rasterize import RasterConfig
        from ..slam.losses import LossConfig
        from ..slam.tracking import TrackingConfig, track_frame
        rcfg_t = rcfg._replace(max_per_tile=256)
        lcfg_t = LossConfig(
            tracking=True, use_sil_for_loss=True, sil_thres=0.99,
            use_l1=True, ignore_outlier_depth_loss=False, w_im=0.5,
            w_depth=1.0, w_flat=0.0, w_iso=0.0, calc_iso=False)
        # --tile-sub applies to the tracking subset path here (the
        # bench's BENCH_TRACK_TILE_SUBSAMPLE analog)
        tcfg = TrackingConfig(num_iters=10, lr_quat=0.0004, lr_trans=0.002,
                              tile_subsample=args.tile_sub)
        im, d, q, t = frame(1)

        def run():
            res = track_frame(state.params, state.alive, jnp.asarray(q),
                              jnp.asarray(t), im, d, cam, rcfg_t, lcfg_t,
                              tcfg)
            jax.block_until_ready(res.quat)
        run()  # compile
        run()
        jax.profiler.start_trace(trace_dir)
        run()
        jax.profiler.stop_trace()
    else:
        from ..slam.mapping import map_frame

        def run(st, key):
            iter_slots = jnp.asarray(
                rng.integers(0, kf_quats.shape[0], size=args.iters),
                jnp.int32)
            keys = jax.random.split(key, args.iters)
            st, mlog, _ = map_frame(st, kf_colors, kf_depths, kf_quats,
                                    kf_trans, iter_slots, keys, cam, rcfg,
                                    lcfg, mcfg)
            jax.block_until_ready(mlog)
            return st
        key = jax.random.PRNGKey(1)
        key, k = jax.random.split(key)
        state = run(state, k)  # compile
        import time
        t0 = time.perf_counter()
        jax.profiler.start_trace(trace_dir)
        for _ in range(args.phases):
            key, k = jax.random.split(key)
            state = run(state, k)
        jax.profiler.stop_trace()
        dt = time.perf_counter() - t0
        print(f"{args.phases} phases x {args.iters} iters: {dt:.3f}s "
              f"({dt/args.phases/args.iters*1000:.1f} ms/iter incl. fixed)")

    parse_trace(trace_dir, args.top)
    print("trace dir:", trace_dir)


if __name__ == "__main__":
    main()
