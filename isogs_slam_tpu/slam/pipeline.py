"""The SLAM driver: per-frame tracking + densification + keyframe mapping.

Host-side orchestration of the jitted steps; the structural analog of
`rgbd_slam` (scripts/splatam.py:876-1701). Per frame:

  1. load RGB-D (host) -> device
  2. constant-velocity pose init (splatam.py:844-863)
  3. tracking: ONE jit call runs the whole Adam loop (tracking.track_frame)
  4. every map_every frames: silhouette densification (pointcloud.
     add_new_gaussians), overlap keyframe selection (keyframes.py),
     then ONE jit call runs all mapping iterations (mapping.map_frame)
  5. keyframe append every keyframe_every frames (splatam.py:1523-1536)
  6. checkpoint + GC on checkpoint_interval (splatam.py:1539-1586), with
     auto-resume from the latest params*.npz (splatam.py:1037-1174)

Unlike the reference (hundreds of host<->GPU round trips per frame), the
device work per frame is 2-3 XLA program invocations.
"""
from __future__ import annotations

import csv
import functools
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core import gaussians as G
from ..core.camera import Camera
from ..datasets import get_dataset, load_dataset_config
from ..io import checkpoints as ckpt_io
from ..ops.rasterize import RasterConfig
from ..utils.transforms import pose_to_w2c, rotmat_to_quat, normalize
from . import keyframes as KF
from .config import inject_defaults
from .losses import LossConfig
from .mapping import MappingConfig, PruneConfig, map_frame
from .pointcloud import add_new_gaussians, initialize_first_frame
from .tracking import (BinningReuse, TrackingConfig, initialize_camera_pose,
                       track_frame, track_frame_pyramid)

LOG_FIELDS = ["frame", "stage", "step", "loss", "image_loss", "depth_loss",
              "flat_loss", "iso_loss", "mean_density", "mask_frac"]

# Default ON since round 4 (r4s3 kcap verdict, 3 seeds quality-free,
# true-drop 6.6% -> 0.91%): the reference composites EVERY intersection
# (renderer.cpp:214-232), so a silent >0.5% true-candidate drop at the
# per-tile top-K was a render-semantics deviation. Module-level so tests
# assert the shipped default, not a local mirror of it.
ADAPTIVE_MAX_PER_TILE_DEFAULT = True


class MetricsCSV:
    """Append-only metrics_log.csv with resume truncation
    (splatam.py:61-159)."""

    def __init__(self, output_dir: str, checkpoint_time_idx: int = 0):
        self.path = os.path.join(output_dir, "metrics_log.csv")
        rows = []
        if os.path.exists(self.path) and checkpoint_time_idx > 0:
            try:
                with open(self.path) as f:
                    for row in csv.DictReader(f):
                        try:
                            if int(row.get("frame", -1)) < checkpoint_time_idx:
                                rows.append(row)
                        except ValueError:
                            continue
            except Exception:
                rows = []
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=LOG_FIELDS)
            w.writeheader()
            w.writerows(rows)

    def append_block(self, frame: int, stage: str, log: np.ndarray):
        """log [n_iters, 6] (loss, im, depth, flat, iso, mean_density);
        NaN-loss rows (unexecuted while-loop slots) are skipped."""
        with open(self.path, "a", newline="") as f:
            w = csv.writer(f)
            for step, row in enumerate(np.asarray(log)):
                if np.isnan(row[0]):
                    continue
                w.writerow([frame, stage, step] + [float(x) for x in row])


def _dataset_from_config(config, height, width):
    dc = config["data"]
    if "gradslam_data_cfg" not in dc:
        data_cfg = {"dataset_name": dc["dataset_name"]}
        if "synthetic_traj_step" in dc:
            data_cfg["synthetic_traj_step"] = dc["synthetic_traj_step"]
    else:
        data_cfg = load_dataset_config(dc["gradslam_data_cfg"])
    return get_dataset(
        config_dict=data_cfg, basedir=dc.get("basedir", ""),
        sequence=os.path.basename(str(dc.get("sequence", ""))),
        start=dc.get("start", 0), end=dc.get("end", -1),
        stride=dc.get("stride", 1), desired_height=height,
        desired_width=width, relative_pose=True,
        ignore_bad=dc.get("ignore_bad", False),
        use_train_split=dc.get("use_train_split", True),
        num_frames=dc.get("num_frames", -1), seed=config.get("seed", 0))


def _loss_cfg_tracking(config) -> LossConfig:
    t = config["tracking"]
    w = t["loss_weights"]
    return LossConfig(
        tracking=True, use_sil_for_loss=t["use_sil_for_loss"],
        sil_thres=t["sil_thres"], use_l1=t["use_l1"],
        ignore_outlier_depth_loss=t["ignore_outlier_depth_loss"],
        w_im=w["im"], w_depth=w["depth"], w_flat=0.0, w_iso=0.0,
        calc_iso=False,
        # Default ON (round-4 verdict, NOTES r4s2): the unnormalized alpha
        # composite under-estimates depth by the silhouette factor; with the
        # iso regularizer pulling s below 1 that bias drove the tracked-ATE
        # cliff (2.5-3.4 cm -> 0.135 cm with normalization, 3 seeds). The
        # LossConfig dataclass default stays False (library-level reference
        # parity); raw-regime ablation configs pin False explicitly.
        sil_norm_render=t.get("sil_norm_render", True))


def _loss_cfg_mapping(config) -> LossConfig:
    m = config["mapping"]
    w = m["loss_weights"]
    iso_cfg = config.get("isogs", {})
    return LossConfig(
        tracking=False, use_sil_for_loss=m["use_sil_for_loss"],
        sil_thres=m["sil_thres"], use_l1=m["use_l1"],
        ignore_outlier_depth_loss=m["ignore_outlier_depth_loss"],
        w_im=w["im"], w_depth=w["depth"],
        w_flat=w.get("flat", 50.0), w_iso=w.get("iso", 2.0),
        iso_sample_size=iso_cfg.get("sample_size", 8192),
        iso_k=iso_cfg.get("k", 16),
        iso_target=iso_cfg.get("target_saturation", 1.0),
        calc_iso=w.get("iso", 2.0) != 0.0,
        knn_block=iso_cfg.get("knn_block", 8192),
        iso_pool_size=iso_cfg.get("knn_pool_size", 32768))


def _mapping_cfg(config) -> MappingConfig:
    m = config["mapping"]
    lrs = m["lrs"]
    pd = m.get("pruning_dict", {})
    prune = PruneConfig(
        enabled=m.get("prune_gaussians", False),
        start_after=pd.get("start_after", 0),
        remove_big_after=pd.get("remove_big_after", 0),
        stop_after=pd.get("stop_after", 20),
        prune_every=pd.get("prune_every", 20),
        removal_opacity_threshold=pd.get("removal_opacity_threshold", 0.005),
        final_removal_opacity_threshold=pd.get(
            "final_removal_opacity_threshold", 0.005),
        reset_opacities=pd.get("reset_opacities", False),
        reset_opacities_every=pd.get("reset_opacities_every", 500))
    use_dens = m.get("use_gaussian_splatting_densification", False)
    dens = None
    if use_dens:
        from .densify import DensifyConfig
        dd = m.get("densify_dict", {})
        dens = DensifyConfig(
            start_after=dd.get("start_after", 500),
            remove_big_after=dd.get("remove_big_after", 3000),
            stop_after=dd.get("stop_after", 5000),
            densify_every=dd.get("densify_every", 100),
            grad_thresh=dd.get("grad_thresh", 0.0002),
            num_to_split_into=dd.get("num_to_split_into", 2),
            removal_opacity_threshold=dd.get(
                "removal_opacity_threshold", 0.005),
            final_removal_opacity_threshold=dd.get(
                "final_removal_opacity_threshold", 0.005),
            reset_opacities_every=dd.get("reset_opacities_every", 3000),
            reset_opacities=dd.get("reset_opacities", False))
    return MappingConfig(
        num_iters=m["num_iters"], lr_means3d=lrs["means3D"],
        lr_rgb_colors=lrs["rgb_colors"],
        lr_unnorm_rotations=lrs["unnorm_rotations"],
        lr_logit_opacities=lrs["logit_opacities"],
        lr_log_scales=lrs["log_scales"], prune=prune,
        use_densification=use_dens, densify=dens,
        tile_subsample=int(m.get("tile_subsample", 1)),
        tile_cycle=bool(m.get("tile_cycle", True)),
        lazy_adam=bool(m.get("lazy_adam", False)),
        force_subset=bool(m.get("force_subset", False)),
        vmap_bins=bool(m.get("vmap_bins", False)),
        exact_polish_iters=int(m.get("exact_polish_iters", 0)),
        # 0 (default) = margin-free phase binnings: tile lists are the
        # TRUE rects at the phase-start params, so the mapping loss
        # composites exactly what eval and (coverage-fixed) tracking
        # render — full render-semantics consistency across the three
        # surfaces (MEASURED: ATE 2.04 -> 1.26 cm, PSNR 19.61 -> 20.35;
        # see MappingConfig.bin_margin_px)
        bin_margin_px=float(m.get("bin_margin_px", 0.0)))


def _tracking_cfg(config) -> TrackingConfig:
    t = config["tracking"]
    return TrackingConfig(
        num_iters=t["num_iters"], lr_quat=t["lrs"]["cam_unnorm_rots"],
        lr_trans=t["lrs"]["cam_trans"],
        use_depth_loss_thres=t.get("use_depth_loss_thres", False),
        depth_loss_thres=t.get("depth_loss_thres", 100000),
        lr_decay=t.get("lr_decay", 1.0),
        gn_iters=t.get("gn_iters", 0),
        gn_damping=t.get("gn_damping", 1e-3),
        gn_phot_tol=t.get("gn_phot_tol", 0.05),
        tile_subsample=int(t.get("tile_subsample", 1)),
        pyramid_levels=t.get("pyramid_levels", 1),
        pyramid_iters=t.get("pyramid_iters", 0),
        pyramid_lr_scale=t.get("pyramid_lr_scale", 1.0),
        fan_rounds=int(t.get("fan_rounds", 0)),
        fan_trans_eps=t.get("fan_trans_eps", 0.0),
        fan_quat_eps=t.get("fan_quat_eps", 0.0),
        polyak_rho=float(t.get("polyak_rho", 0.0)),
        early_stop_patience=int(t.get("early_stop_patience", 0)),
        bin_margin_px=t.get("bin_margin_px", 8.0),
        rebin_every_iter=t.get("rebin_every_iter", False),
        reuse_binning=t.get("reuse_binning", True),
        cross_frame_margin_px=t.get("cross_frame_margin_px", 16.0))


def _to_chw_frame(color, depth):
    """Dataset (H,W,3) 0..255 + (H,W,1) -> device [3,H,W] 0..1, [1,H,W]."""
    im = jnp.asarray(color, jnp.float32).transpose(2, 0, 1) / 255.0
    d = jnp.asarray(depth, jnp.float32).transpose(2, 0, 1)
    return im, d


class SLAM:
    """Stateful SLAM runner (construct once, call run()).

    `dataset` (optional) injects a pre-built frame source (e.g. the online
    demo's live StreamDataset) instead of constructing one from the
    config — the supported seam for streaming input (no module patching).
    A stream cannot be re-decoded at other resolutions, so separate
    tracking/densification resolutions are rejected loudly and the main
    stream is used for all phases.
    """

    def __init__(self, config: dict, dataset=None):
        self.config = inject_defaults(config)
        cfg = self.config
        # loud per-knob verdict lines for any enabled adjudicated-loser
        # knob (slam/experimental.py — the `experimental` namespace)
        from .experimental import warn_experimental
        warn_experimental(cfg)
        self.output_dir = os.path.join(cfg["workdir"], cfg["run_name"])
        self.eval_dir = os.path.join(self.output_dir, "eval")
        os.makedirs(self.eval_dir, exist_ok=True)

        dc = cfg["data"]
        self._injected_dataset = dataset is not None
        if self._injected_dataset:
            self.dataset = dataset
        else:
            self.dataset = _dataset_from_config(
                cfg, dc["desired_image_height"], dc["desired_image_width"])
        self.num_frames = dc.get("num_frames", -1)
        if self.num_frames == -1:
            self.num_frames = len(self.dataset)

        # Separate-resolution tracking / densification datasets
        want_track_res = (
            dc["tracking_image_height"] != dc["desired_image_height"]
            or dc["tracking_image_width"] != dc["desired_image_width"])
        want_dens_res = (
            dc["densification_image_height"] != dc["desired_image_height"]
            or dc["densification_image_width"]
            != dc["desired_image_width"])
        if self._injected_dataset and (want_track_res or want_dens_res):
            print("[pipeline] WARNING: separate tracking/densification "
                  "resolutions are not available for an injected stream "
                  "dataset; using the stream resolution for all phases.")
            want_track_res = want_dens_res = False
        self.tracking_dataset = None
        if want_track_res:
            self.tracking_dataset = _dataset_from_config(
                cfg, dc["tracking_image_height"], dc["tracking_image_width"])
        self.densify_dataset = None
        if want_dens_res:
            self.densify_dataset = _dataset_from_config(
                cfg, dc["densification_image_height"],
                dc["densification_image_width"])

        # cameras
        color0, depth0, intrinsics0, pose0 = self.dataset[0]
        H, W = color0.shape[0], color0.shape[1]
        self.intrinsics = np.asarray(intrinsics0)[:3, :3]
        self.cam = Camera.from_intrinsics(self.intrinsics, W, H)
        self.first_frame_w2c = np.linalg.inv(np.asarray(pose0, np.float64))
        if self.tracking_dataset is not None:
            tc, _, ti, _ = self.tracking_dataset[0]
            self.tracking_cam = Camera.from_intrinsics(
                np.asarray(ti)[:3, :3], tc.shape[1], tc.shape[0])
        else:
            self.tracking_cam = self.cam
        if self.densify_dataset is not None:
            dcol, _, di, _ = self.densify_dataset[0]
            self.densify_cam = Camera.from_intrinsics(
                np.asarray(di)[:3, :3], dcol.shape[1], dcol.shape[0])
            self.densify_intrinsics = np.asarray(di)[:3, :3]
        else:
            self.densify_cam = self.cam
            self.densify_intrinsics = self.intrinsics

        r = cfg["raster"]
        self.rcfg = RasterConfig(max_per_tile=r["max_per_tile"],
                                 isect_per_gaussian=r["isect_per_gaussian"],
                                 tile_chunk=r["tile_chunk"],
                                 tile_cull=r.get("tile_cull", False),
                                 cull_q_slack=r.get("cull_q_slack", 1.5),
                                 tight_rect=r.get("tight_rect", False))
        # tracking composites against a mature map whose transmittance
        # saturates after ~10-20 Gaussians; a smaller per-tile cap halves
        # the gather/backward traffic with no pose-accuracy effect
        self.rcfg_track = self.rcfg._replace(
            max_per_tile=r.get("max_per_tile_tracking",
                               min(256, r["max_per_tile"])))
        # demand-driven intersection-buffer capacity (RasterConfig.
        # max_isect_cap): the N-proportional heuristic over-provisions
        # ~4x once row capacity outgrows the alive count, and the binning
        # sort + expansion pay for capacity, not demand. Seeded from the
        # first frame's row count, grown geometrically from observed
        # per-binning n_isect (mapping bin_stats + the tracking binning).
        self._adaptive_isect = bool(r.get("adaptive_isect_cap", True))
        self.lcfg_track = _loss_cfg_tracking(cfg)
        self.lcfg_map = _loss_cfg_mapping(cfg)
        self.tcfg = _tracking_cfg(cfg)
        self.mcfg = _mapping_cfg(cfg)

        # host-side camera trajectory [4,T], [3,T] (cam_unnorm_rots/trans)
        T = self.num_frames
        self.cam_rots = np.tile(np.array([1, 0, 0, 0], np.float32)[:, None],
                                (1, T))
        self.cam_trans = np.zeros((3, T), np.float32)

        self.granule = cfg["capacity_granule"]
        self.state: G.MapState | None = None
        max_kf = T // max(cfg["keyframe_every"], 1) + 3
        self.kf = KF.KeyframeLibrary(max_kf, H, W)
        self.gt_w2c_all: list[np.ndarray] = []
        self.keyframe_time_indices: list[int] = []
        self.rng = np.random  # module-level RNG, seeded by seed_everything
        self.key = jax.random.PRNGKey(cfg.get("seed", 0))
        from ..utils.logging_utils import RunLogger
        self.logger = RunLogger(cfg)
        self.stats = {"tracking_iter_time": [], "tracking_frame_time": [],
                      "mapping_iter_time": [], "mapping_frame_time": [],
                      "gn_accepted": []}
        # online evaluation (eval_online + full report_progress,
        # eval_helpers.py:188-441): created lazily on first report
        self.online_eval = None
        # cross-phase iso-KNN pool cache (_phase_iso_pool)
        self._iso_pool = None
        self._iso_pool_age = 0
        self._compact_every = cfg.get("compact_every", 50)
        # multi-chip mapping over a view mesh (config["parallel"]["map_views"])
        self._map_views = int(cfg.get("parallel", {}).get("map_views", 0))
        self._mv_phase = None
        if self._map_views > 1:
            from ..parallel.sharded import make_mesh, make_multiview_map_phase
            n_dev = len(jax.devices())
            if self._map_views > n_dev:
                print(f"[parallel] map_views {self._map_views} > "
                      f"{n_dev} devices; clamping")
                self._map_views = n_dev
            self._mv_mesh = make_mesh(self._map_views)
            self._mv_phase = make_multiview_map_phase(
                self._mv_mesh, self.cam, self.rcfg, self.lcfg_map,
                self.mcfg)
        # multi-chip tracking over a tile mesh
        # (config["parallel"]["track_tiles"]): the whole per-frame Adam
        # pose loop runs inside a shard_map with the compositing tiles
        # sharded (parallel/track_sharded.py); programs are cached per
        # (camera, rcfg, lcfg, tcfg) so pyramid levels and isect-cap
        # growth re-build automatically
        self._track_tiles = int(cfg.get("parallel", {}).get(
            "track_tiles", 0))
        self._tt_mesh = None
        self._tt_cache = {}
        if self._track_tiles > 1:
            from ..parallel.track_sharded import make_tile_mesh
            n_dev = len(jax.devices())
            if self._track_tiles > n_dev:
                print(f"[parallel] track_tiles {self._track_tiles} > "
                      f"{n_dev} devices; clamping")
                self._track_tiles = n_dev
            self._tt_mesh = make_tile_mesh(self._track_tiles)
        # cross-frame tracking tile-list cache; invalidated on every map
        # edit (densify / mapping / compaction / growth). The tile-sharded
        # tracker bins internally every frame, so the cache is a
        # serial-path-only feature.
        self._track_bins = (BinningReuse(
            self.tracking_cam, self.rcfg_track,
            margin_px=self.tcfg.cross_frame_margin_px,
            slack_px=self.tcfg.bin_margin_px)
            if self.tcfg.reuse_binning and not self.tcfg.rebin_every_iter
            and self._tt_mesh is None
            else None)

    # ------------------------------------------------------------- helpers
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _pose(self, time_idx):
        q = self.cam_rots[:, time_idx]
        q = q / np.linalg.norm(q)
        return (jnp.asarray(q, jnp.float32),
                jnp.asarray(self.cam_trans[:, time_idx], jnp.float32))

    def _est_w2c(self, time_idx) -> np.ndarray:
        q, t = self._pose(time_idx)
        return np.asarray(pose_to_w2c(q, t))

    def _map_changed(self):
        """Invalidate caches keyed on map rows (tracking tile lists)."""
        if self._track_bins is not None:
            self._track_bins.invalidate()

    def _invalidate_iso_pool(self):
        """Row indices changed (compaction / growth): a cached cross-phase
        iso pool would point at the wrong Gaussians."""
        self._iso_pool = None
        self._iso_pool_age = 0

    def _phase_iso_pool(self):
        """Cross-phase iso-KNN pool amortization
        (mapping.iso_pool_refresh_phases, default 1 = build inside
        map_frame every phase, exact round-1 semantics). Pool rows are
        alive-masked at evaluation, so staleness across a few phases only
        delays newly-densified rows' entry into the iso sample."""
        refresh = int(self.config["mapping"].get("iso_pool_refresh_phases",
                                                 1))
        lcfg = self.lcfg_map
        if refresh <= 1 or not (lcfg.calc_iso and lcfg.iso_pool_size > 0):
            return None
        if self._iso_pool is None or self._iso_pool_age >= refresh:
            from .mapping import build_phase_iso_pool
            self._iso_pool = build_phase_iso_pool(
                self.state.params, self.state.alive, self._next_key(),
                lcfg)
            self._iso_pool_age = 0
        self._iso_pool_age += 1
        return self._iso_pool

    def _ensure_capacity(self, needed_extra: int):
        used = int(self.state.hwm)
        cap = self.state.capacity
        if used + needed_extra > cap:
            self._map_changed()
            self._invalidate_iso_pool()   # compaction/growth permute rows
            # compaction re-packs pruned rows and lowers hwm without
            # changing shapes (no re-jit); prefer it when it frees enough
            n_alive = int(self.state.num_alive())
            if n_alive < used and n_alive + needed_extra <= cap:
                self.state = jax.jit(G.compact,
                                     donate_argnums=0)(self.state)
                return
            # otherwise grow geometrically: every new capacity bucket
            # re-jits the big programs, so bucket count must stay O(log N)
            new_cap = G.round_capacity(max(used + needed_extra,
                                           2 * cap), self.granule)
            print(f"[capacity] {cap} -> {new_cap} "
                  f"(hwm {used}, recompiling jitted programs)")
            self.state = G.grow_capacity(self.state, new_cap)

    def _set_isect_cap(self, rows: int):
        """Round `rows` up to a coarse granule and re-point both raster
        configs at it (a changed static config re-jits, like capacity
        growth)."""
        g = 1 << 18
        cap = max(g, (rows + g - 1) // g * g)
        if cap == self.rcfg.max_isect_cap:
            return
        old = self.rcfg.max_isect_cap
        if old:
            print(f"[isect-cap] {old} -> {cap} (recompiling)")
        self.rcfg = self.rcfg._replace(max_isect_cap=cap)
        self.rcfg_track = self.rcfg_track._replace(max_isect_cap=cap)
        tb = getattr(self, "_track_bins", None)
        if tb is not None:
            tb.rcfg = self.rcfg_track   # captured at construction
            tb.invalidate()
        if self._mv_phase is not None:
            from ..parallel.sharded import make_multiview_map_phase
            self._mv_phase = make_multiview_map_phase(
                self._mv_mesh, self.cam, self.rcfg, self.lcfg_map,
                self.mcfg)

    def _note_isect_demand(self, observed_peak: int):
        """Grow the isect cap when a binning's true demand (n_isect is
        computed pre-clamp) approaches capacity. 0.75 trigger + 1.5x
        growth keeps >= 33% headroom for frame-to-frame demand drift."""
        if not self._adaptive_isect:
            return
        cap = self.rcfg.max_isect_cap
        if cap and observed_peak > cap:
            print(f"[isect-cap] WARNING: demand {observed_peak} exceeded "
                  f"capacity {cap} — intersections were truncated this "
                  f"phase (capacity grows now)")
        if cap and observed_peak > 0.75 * cap:
            self._set_isect_cap(max(int(observed_peak * 1.5),
                                    cap + (1 << 18)))

    def _init_isect_cap(self):
        if self._adaptive_isect and self.rcfg.max_isect_cap == 0:
            self._set_isect_cap(
                int(int(self.state.hwm) * self.rcfg.isect_per_gaussian))

    # --------------------------------------------------------------- init
    def initialize_first_frame(self, color, depth):
        im, d = _to_chw_frame(color, depth)
        n_px = int(self.densify_cam.width * self.densify_cam.height)
        capacity = G.round_capacity(int(n_px * 1.5), self.granule)
        self.state = initialize_first_frame(
            im, d, self.densify_cam, capacity, self._next_key(),
            self.config["scene_radius_depth_ratio"],
            gaussian_distribution=self.config["gaussian_distribution"])
        self._init_isect_cap()

    # ------------------------------------------------------------ resume
    def try_resume(self) -> int:
        cfg = self.config
        if getattr(self, "_resumed_at", None) is not None:
            return self._resumed_at   # idempotent: run() calls this too
        self._resumed_at = 0
        if not cfg.get("load_checkpoint", False):
            return 0
        want = cfg.get("checkpoint_time_idx", 0)
        if want < 0:
            frame, path = ckpt_io.latest_checkpoint(self.output_dir)
            if frame is None:
                return 0
        else:
            frame = want
            path = os.path.join(self.output_dir, f"params{frame}.npz")
            if not os.path.exists(path):
                return 0
        print(f"[Checkpoint] Resuming from frame {frame}")
        data = ckpt_io.load_checkpoint(path)
        n = data["means3D"].shape[0]
        capacity = G.round_capacity(int(n * 1.25), self.granule)
        st = G.empty_state(capacity)
        rows = G.GaussianParams(
            means3d=jnp.asarray(data["means3D"]),
            rgb_colors=jnp.asarray(data["rgb_colors"]),
            unnorm_rotations=jnp.asarray(data["unnorm_rotations"]),
            logit_opacities=jnp.asarray(data["logit_opacities"]),
            log_scales=jnp.asarray(data["log_scales"]))
        st = G.append_rows(st, rows, jnp.ones(n, bool), 0)
        if "timestep" in data:
            ts = jnp.zeros(capacity).at[:n].set(
                jnp.asarray(data["timestep"], jnp.float32)[:n])
            st = st._replace(timestep=ts)
        self.state = st
        self.cam_rots = np.asarray(data["cam_unnorm_rots"])[0]
        self.cam_trans = np.asarray(data["cam_trans"])[0]
        # scene radius from first frame depth
        _, depth0, _, _ = self.dataset[0]
        self.state = self.state._replace(scene_radius=jnp.asarray(
            float(np.max(depth0)) / self.config["scene_radius_depth_ratio"],
            jnp.float32))
        kf_path = os.path.join(self.output_dir,
                               f"keyframe_time_indices{frame}.npy")
        kf_times = (np.load(kf_path).tolist() if os.path.exists(kf_path)
                    else [])
        # replay gt poses + keyframes (splatam.py:1151-1171)
        for t in range(frame):
            color, depth, _, pose = self.dataset[t]
            self.gt_w2c_all.append(np.linalg.inv(np.asarray(pose,
                                                            np.float64)))
            if t in kf_times:
                im, d = _to_chw_frame(color, depth)
                q, tr = self._pose(t)
                self.kf.add_keyframe(t, im, d, q, tr, self._est_w2c(t))
                self.keyframe_time_indices.append(t)
        self._resumed_at = frame
        self._init_isect_cap()
        return frame

    # ----------------------------------------------------------- tracking
    def track(self, time_idx, im, depth):
        cfg = self.config
        if time_idx > 0:
            q0, t0 = initialize_camera_pose(
                jnp.asarray(self.cam_rots), jnp.asarray(self.cam_trans),
                time_idx, cfg["tracking"]["forward_prop"])
            self.cam_rots[:, time_idx] = np.asarray(q0)
            self.cam_trans[:, time_idx] = np.asarray(t0)
        if time_idx == 0:
            return None
        if cfg["tracking"]["use_gt_poses"]:
            gt_w2c = self.gt_w2c_all[-1]
            quat = np.asarray(rotmat_to_quat(
                jnp.asarray(gt_w2c[:3, :3], jnp.float32)))
            self.cam_rots[:, time_idx] = quat
            self.cam_trans[:, time_idx] = gt_w2c[:3, 3]
            return None
        q0 = jnp.asarray(self.cam_rots[:, time_idx])
        t0 = jnp.asarray(self.cam_trans[:, time_idx])
        binning = (self._track_bins.get(self.state.params, self.state.alive,
                                        q0, t0)
                   if self._track_bins is not None else None)
        if self._tt_mesh is not None:
            base_fn = self._sharded_tracker
            tracker = (functools.partial(track_frame_pyramid,
                                         track_fn=base_fn)
                       if self.tcfg.pyramid_levels > 1 else base_fn)
        else:
            tracker = (track_frame_pyramid if self.tcfg.pyramid_levels > 1
                       else track_frame)
        res = tracker(self.state.params, self.state.alive, q0, t0,
                      im, depth, self.tracking_cam, self.rcfg_track,
                      self.lcfg_track, self.tcfg, binning=binning)
        self.cam_rots[:, time_idx] = np.asarray(res.quat)
        self.cam_trans[:, time_idx] = np.asarray(res.trans)
        if binning is not None:
            # grow AFTER the frame so the just-used binning and the rcfg
            # it was built with stay consistent; a one-frame truncation
            # is possible on a >33% demand jump, then capacity catches up
            self._note_isect_demand(int(binning.n_isect))
        if res.gn_accepted is not None and self.tcfg.gn_iters > 0:
            self.stats["gn_accepted"].append(int(res.gn_accepted))
        return res

    def _sharded_tracker(self, params, alive, q0, t0, im, depth, cam,
                         rcfg, lcfg, tcfg, binning=None):
        """track_frame-signature dispatcher to the tile-sharded tracking
        program (parallel/track_sharded.py), built lazily per
        (camera, rcfg, lcfg, tcfg) — pyramid levels and adaptive
        isect-cap growth each get their own cached program. The
        cross-frame binning cache is a serial-path feature (the sharded
        program bins internally)."""
        assert binning is None, \
            "parallel.track_tiles is incompatible with reuse_binning"
        key = (cam, rcfg, lcfg, tcfg)
        fn = self._tt_cache.get(key)
        if fn is None:
            from ..parallel.track_sharded import make_tracking_frame_sharded
            fn = make_tracking_frame_sharded(self._tt_mesh, cam, rcfg,
                                             lcfg, tcfg)
            self._tt_cache[key] = fn
        return fn(params, alive, q0, t0, im, depth)

    # ------------------------------------------------------ densification
    def densify(self, time_idx, im, depth):
        self._ensure_capacity(
            int(self.densify_cam.width * self.densify_cam.height))
        q, t = self._pose(time_idx)
        self._map_changed()
        self.state = add_new_gaussians(
            self.state, im, depth, q, t, float(time_idx), self._next_key(),
            self.densify_cam, self.rcfg,
            sil_thres=self.config["mapping"]["sil_thres"],
            gaussian_distribution=self.config["gaussian_distribution"])

    # ----------------------------------------------------------- mapping
    def map(self, time_idx, im, depth):
        cfg = self.config
        num_iters = cfg["mapping"]["num_iters"]
        if num_iters <= 0:
            return None
        # keyframe selection (splatam.py:1384-1403)
        k = cfg["mapping_window_size"] - 2
        depth_np = np.asarray(depth[0])
        selected = KF.keyframe_selection_overlap(
            depth_np, self._est_w2c(time_idx), self.intrinsics,
            self.kf.w2cs[:-1] if len(self.kf) else [], k, self.rng,
            self.cam.width, self.cam.height)
        slots = [int(s) for s in selected]
        if len(self.kf) > 0:
            slots.append(len(self.kf) - 1)      # always the last keyframe
        slots.append(self.kf.current_slot)      # the current frame (-1)
        q, t = self._pose(time_idx)
        self.kf.set_current(im, depth, q, t)

        sel_ids = [self.kf.time_indices[s] if s != self.kf.current_slot
                   else time_idx for s in slots]
        print(f"\nSelected Keyframes at Frame {time_idx}: {sel_ids}")

        # Sample the per-iteration keyframe choices FIRST, then gather only
        # the DISTINCT sampled slots into compact device arrays: map_frame
        # bins each passed slot once per phase (~250 ms each at 1M
        # Gaussians), so never-sampled window slots would be pure waste.
        # The compact width is bucketed (multiple of 4) so the number of
        # distinct jit programs stays small.
        if self._mv_phase is not None:
            return self._map_multiview(slots, num_iters)

        rand = self.rng.randint(0, len(slots), size=num_iters)
        uniq, iter_local = np.unique(rand, return_inverse=True)
        comp_slots = [slots[int(u)] for u in uniq]
        Wb = max(4, -(-len(comp_slots) // 4) * 4)
        pad_slots = comp_slots + [comp_slots[0]] * (Wb - len(comp_slots))
        sel = jnp.asarray(np.array(pad_slots, np.int32))
        kf_colors = jnp.take(self.kf.colors, sel, axis=0)
        kf_depths = jnp.take(self.kf.depths, sel, axis=0)
        kf_quats = jnp.take(self.kf.quats, sel, axis=0)
        kf_trans = jnp.take(self.kf.trans, sel, axis=0)

        iter_slots = jnp.asarray(iter_local.astype(np.int32))
        keys = jax.random.split(self._next_key(), num_iters)
        self._map_changed()
        self.state, log, bin_stats = map_frame(
            self.state, kf_colors, kf_depths, kf_quats,
            kf_trans, iter_slots, keys, self.cam, self.rcfg,
            self.lcfg_map, self.mcfg, iso_pool=self._phase_iso_pool())
        self._check_tile_cap(bin_stats)
        return log

    def _check_tile_cap(self, bin_stats):
        """The reference composites EVERY intersection; our per-tile top-K
        keeps the front-most max_per_tile. Margin-only candidates rank
        last (dropping them is by design) but dropped TRUE candidates are
        a real deviation — warn, and optionally escalate the cap
        (config raster.adaptive_max_per_tile)."""
        stats = np.asarray(bin_stats)
        dropped, total = int(stats[0]), int(stats[1])
        if stats.shape[0] > 2:
            self._note_isect_demand(int(stats[2]))
        frac = dropped / max(total, 1)
        # per-phase truncation observability: the reference composites
        # every intersection, so any persistent true-candidate drop is a
        # render-semantics deviation — write_runtime_stats reports the
        # max/mean over phases (the once-only warning below hides whether
        # frame-0's dense transient persists in steady state)
        self.stats.setdefault("tile_cap_dropped_frac", []).append(frac)
        if frac <= 0.005:
            return
        K = self.rcfg.max_per_tile
        # Default ON since round 4 (r4s3, 3 seeds: quality-free — ATE
        # 0.137 vs 0.135 control, PSNR +0.39 dB — with true-drop mean
        # 6.6% -> 0.91%): the reference composites EVERY intersection
        # (renderer.cpp:214-232), so leaving >0.5% of true-footprint
        # intersections uncomposited was this repo's last render-
        # semantics deviation. Escalation recompiles the mapping
        # programs (once or twice per run, outside steady state).
        if (self.config["raster"].get("adaptive_max_per_tile",
                                      ADAPTIVE_MAX_PER_TILE_DEFAULT)
                and K < 1024):
            new_k = min(1024, K + 256)
            print(f"[raster] {frac:.1%} true candidates dropped at "
                  f"max_per_tile={K}; escalating to {new_k} "
                  f"(recompiles mapping programs)")
            self.rcfg = self.rcfg._replace(max_per_tile=new_k)
            if self._mv_phase is not None:
                from ..parallel.sharded import make_multiview_map_phase
                self._mv_phase = make_multiview_map_phase(
                    self._mv_mesh, self.cam, self.rcfg, self.lcfg_map,
                    self.mcfg)
        elif not getattr(self, "_warned_tile_cap", False):
            self._warned_tile_cap = True
            print(f"[raster] WARNING: {frac:.1%} of true-footprint "
                  f"intersections exceed max_per_tile={K} and are not "
                  f"composited (the reference composites all). Raise "
                  f"raster.max_per_tile or set "
                  f"raster.adaptive_max_per_tile=True if eval metrics "
                  f"lag the reference.")

    def _map_multiview(self, slots: list, num_iters: int):
        """Multi-chip mapping phase: B keyframe views per Adam step,
        sharded over the view mesh (parallel/sharded.py). num_iters is
        interpreted as total view-renders, so one phase does
        ceil(num_iters / B) lower-variance steps at ~1/B wall-clock."""
        B = self._map_views
        n_steps = -(-num_iters // B)
        Wb = max(4, -(-len(slots) // 4) * 4)
        pad_slots = slots + [slots[0]] * (Wb - len(slots))
        sel = jnp.asarray(np.array(pad_slots, np.int32))
        kf_colors = jnp.take(self.kf.colors, sel, axis=0)
        kf_depths = jnp.take(self.kf.depths, sel, axis=0)
        kf_quats = jnp.take(self.kf.quats, sel, axis=0)
        kf_trans = jnp.take(self.kf.trans, sel, axis=0)

        step_slots = np.empty((n_steps, B), np.int32)
        for s in range(n_steps):
            if len(slots) >= B:
                step_slots[s] = self.rng.permutation(len(slots))[:B]
            else:
                step_slots[s] = self.rng.randint(0, len(slots), size=B)
        keys = jax.random.split(self._next_key(),
                                n_steps * B).reshape(n_steps, B, -1)
        self._map_changed()
        self.state, log, bin_stats = self._mv_phase(
            self.state, kf_colors, kf_depths, kf_quats, kf_trans,
            jnp.asarray(step_slots), keys)
        self._check_tile_cap(bin_stats)
        return log

    # ------------------------------------------------------------- run
    def run(self, end_at: int | None = None) -> dict:
        cfg = self.config
        trace_dir = cfg.get("profile_trace_dir")
        if trace_dir:
            # jax.profiler traces (the reference's runtime_stats plus the
            # deeper tracing its C++ tree listed as TODO, SURVEY.md §5)
            jax.profiler.start_trace(trace_dir)
        try:
            return self._run(end_at)
        finally:
            if trace_dir:
                jax.profiler.stop_trace()
                print(f"[profile] trace written to {trace_dir}")

    def _run(self, end_at: int | None = None) -> dict:
        cfg = self.config
        start_frame = self.try_resume()
        metrics = MetricsCSV(self.output_dir, start_frame)
        end_frame = self.num_frames - 1
        if end_at is not None:
            end_frame = min(int(end_at), end_frame)
        if start_frame > end_frame:
            print(f"[End-At] Nothing to do (start {start_frame} > end "
                  f"{end_frame}).")
            return {}

        # overlap host-side frame decode with device work
        # (data.prefetch_depth frames of lookahead; 0 disables)
        depth_pf = cfg["data"].get("prefetch_depth", 4)
        prefetchers = []
        if depth_pf > 0:
            from ..datasets.prefetch import Prefetcher
            main_ds = Prefetcher(self.dataset, depth_pf)
            prefetchers.append(main_ds)
            track_ds = (Prefetcher(self.tracking_dataset, depth_pf)
                        if self.tracking_dataset is not None else None)
            dens_ds = (Prefetcher(self.densify_dataset, depth_pf)
                       if self.densify_dataset is not None else None)
            prefetchers += [p for p in (track_ds, dens_ds) if p is not None]
        else:
            main_ds = self.dataset
            track_ds = self.tracking_dataset
            dens_ds = self.densify_dataset
        try:
            return self._frame_loop(cfg, metrics, start_frame, end_frame,
                                    main_ds, track_ds, dens_ds)
        finally:
            for p in prefetchers:
                p.close()

    def _frame_loop(self, cfg, metrics, start_frame, end_frame,
                    main_ds, track_ds, dens_ds) -> dict:
        for time_idx in range(start_frame, end_frame + 1):
            color, depth, _, gt_pose = main_ds[time_idx]
            gt_w2c = np.linalg.inv(np.asarray(gt_pose, np.float64))
            self.gt_w2c_all.append(gt_w2c)
            im, d = _to_chw_frame(color, depth)

            if time_idx == 0 and self.state is None:
                if dens_ds is not None:
                    dcol, ddep, _, _ = dens_ds[0]
                    dim, dd = _to_chw_frame(dcol, ddep)
                    self.initialize_first_frame_from(dim, dd)
                else:
                    self.initialize_first_frame(color, depth)

            # tracking
            t0 = time.time()
            if track_ds is not None and time_idx > 0:
                tcol, tdep, _, _ = track_ds[time_idx]
                tim, td = _to_chw_frame(tcol, tdep)
            else:
                tim, td = im, d
            res = self.track(time_idx, tim, td)
            t1 = time.time()
            if res is not None:
                iters = int(res.iters_run)
                log = np.asarray(res.loss_log)
                metrics.append_block(time_idx, "tracking", log)
                self.logger.log_block(time_idx, "tracking", log)
                mask_frac = log[max(iters - 1, 0), 6]
                if mask_frac < 0.01:
                    print(f"[tracking] WARNING frame {time_idx}: loss mask "
                          f"covers {mask_frac:.2%} of pixels — silhouette "
                          f"never exceeds sil_thres="
                          f"{self.lcfg_track.sil_thres}; pose is frozen at "
                          f"its initialization. Lower tracking.sil_thres "
                          f"or reduce the iso weight.")
                self.stats["tracking_iter_time"].append(
                    (t1 - t0) / max(iters, 1))
                # early-stop observability: mean iters actually run is
                # the lever's measured savings (num_iters - mean)
                self.stats.setdefault("tracking_iters_run", []).append(iters)
            self.stats["tracking_frame_time"].append(t1 - t0)

            # densification + mapping
            if time_idx == 0 or (time_idx + 1) % cfg["map_every"] == 0:
                if cfg["mapping"]["add_new_gaussians"] and time_idx > 0:
                    if dens_ds is not None:
                        dcol, ddep, _, _ = dens_ds[time_idx]
                        dim, dd = _to_chw_frame(dcol, ddep)
                    else:
                        dim, dd = im, d
                    self.densify(time_idx, dim, dd)
                t2 = time.time()
                mlog = self.map(time_idx, im, d)
                t3 = time.time()
                if mlog is not None:
                    metrics.append_block(time_idx, "mapping",
                                         np.asarray(mlog))
                    self.logger.log_block(time_idx, "mapping",
                                          np.asarray(mlog))
                    self.stats["mapping_iter_time"].append(
                        (t3 - t2) / max(cfg["mapping"]["num_iters"], 1))
                self.stats["mapping_frame_time"].append(t3 - t2)
                # periodic compaction of pruned rows
                if (time_idx + 1) % self._compact_every == 0:
                    self._map_changed()
                    self._invalidate_iso_pool()
                    self.state = jax.jit(G.compact,
                                         donate_argnums=0)(self.state)

            # keyframe append (splatam.py:1523-1536)
            if (((time_idx == 0)
                 or ((time_idx + 1) % cfg["keyframe_every"] == 0)
                 or (time_idx == self.num_frames - 2))
                    and (not np.isinf(gt_w2c).any())
                    and (not np.isnan(gt_w2c).any())
                    and len(self.kf) < self.kf.max_keyframes):
                q, t = self._pose(time_idx)
                self.kf.add_keyframe(time_idx, im, d, q, t,
                                     self._est_w2c(time_idx))
                self.keyframe_time_indices.append(time_idx)

            # global progress report (report_progress, eval_helpers.py:188+;
            # failures trigger an emergency checkpoint like the reference's
            # bare-except at splatam.py:1350-1358)
            if ((time_idx + 1) % cfg["report_global_progress_every"] == 0
                    or time_idx == end_frame):
                try:
                    self.report_progress(time_idx, im, d)
                except Exception as e:
                    print(f"[progress] report failed ({e}); saving "
                          f"emergency checkpoint")
                    try:
                        self.save_checkpoint(time_idx)
                    except Exception:
                        pass

            # checkpoint
            if (cfg["save_checkpoints"]
                    and time_idx % cfg["checkpoint_interval"] == 0):
                self.save_checkpoint(time_idx)

        if self.online_eval is not None:
            try:
                self.online_eval.finalize()
            except Exception as e:
                print(f"[online eval] finalize failed: {e}")
        self.write_runtime_stats(end_frame)
        if (cfg["save_checkpoints"]
                and end_frame % cfg["checkpoint_interval"] != 0):
            self.save_checkpoint(end_frame)
        return self.stats

    def report_progress(self, time_idx: int, im, d):
        """Full online evaluation of the current frame at its estimated
        pose (report_progress + eval_online, eval_helpers.py:188-441):
        PSNR / MS-SSIM / depth RMSE+L1 / pose errors / running ATE, with
        txt + qualitative-figure artifacts under <run>/eval_online/."""
        if self.online_eval is None:
            from ..eval.online import OnlineEvaluator
            self.online_eval = OnlineEvaluator(
                self.output_dir, self.config["mapping"]["sil_thres"],
                logger=self.logger,
                save_qual=self.config.get("eval_online_save_qual", True))
        m = self.online_eval.eval_frame(self, time_idx, im, d)
        n_alive = int(self.state.num_alive())
        print(f"[progress] frame {time_idx}: PSNR {m['online/psnr']:.2f} "
              f"dB, MS-SSIM {m['online/ms_ssim']:.3f}, depth L1 "
              f"{m['online/depth_l1']*100:.2f} cm, ATE "
              f"{m['online/ate_rmse']*100:.2f} cm, {n_alive} Gaussians")
        self.logger.log({"progress/num_gaussians": n_alive})

    def initialize_first_frame_from(self, im, d):
        n_px = int(self.densify_cam.width * self.densify_cam.height)
        capacity = G.round_capacity(int(n_px * 1.5), self.granule)
        self.state = initialize_first_frame(
            im, d, self.densify_cam, capacity, self._next_key(),
            self.config["scene_radius_depth_ratio"],
            gaussian_distribution=self.config["gaussian_distribution"])

    # --------------------------------------------------------- checkpoint
    def gauss_params_numpy(self) -> dict:
        """Alive rows as the reference's params dict (compacted)."""
        st = jax.jit(G.compact)(self.state)
        n = int(st.hwm)
        p = st.params
        return {
            "means3D": np.asarray(p.means3d[:n]),
            "rgb_colors": np.asarray(p.rgb_colors[:n]),
            "unnorm_rotations": np.asarray(p.unnorm_rotations[:n]),
            "logit_opacities": np.asarray(p.logit_opacities[:n]),
            "log_scales": np.asarray(p.log_scales[:n]),
        }, np.asarray(st.timestep[:n])

    def save_checkpoint(self, time_idx: int):
        params, timestep = self.gauss_params_numpy()
        dc = self.config["data"]
        ckpt_io.save_checkpoint(
            self.output_dir, time_idx, params, self.cam_rots[None],
            self.cam_trans[None], timestep, self.intrinsics,
            self.first_frame_w2c, dc["desired_image_width"],
            dc["desired_image_height"], self.gt_w2c_all,
            self.keyframe_time_indices)

    def write_runtime_stats(self, final_frame: int):
        s = self.stats
        mean = lambda xs: float(np.mean(xs)) if xs else 0.0
        d = {
            "Average Tracking/Iteration Time (ms)":
                mean(s["tracking_iter_time"]) * 1000,
            "Average Tracking/Frame Time (s)": mean(s["tracking_frame_time"]),
            "Average Mapping/Iteration Time (ms)":
                mean(s["mapping_iter_time"]) * 1000,
            "Average Mapping/Frame Time (s)": mean(s["mapping_frame_time"]),
            "Final Frame": int(final_frame),
        }
        if s["gn_accepted"]:
            d["GN Polish Acceptance Rate"] = mean(s["gn_accepted"])
        if s.get("tracking_iters_run"):
            d["Average Tracking Iterations Run"] = mean(
                s["tracking_iters_run"])
        caps = s.get("tile_cap_dropped_frac", [])
        if caps:
            d["Tile-Cap True-Drop Frac (max)"] = float(np.max(caps))
            d["Tile-Cap True-Drop Frac (mean)"] = float(np.mean(caps))
            d["Tile-Cap Phases > 0.5%"] = int(np.sum(np.asarray(caps)
                                                     > 0.005))
        with open(os.path.join(self.output_dir, "runtime_stats.json"),
                  "w") as f:
            json.dump(d, f, indent=2)
        with open(os.path.join(self.output_dir, "runtime_stats.txt"),
                  "w") as f:
            for k, v in d.items():
                f.write(f"{k}: {v}\n")
        print(json.dumps(d, indent=2))


def rgbd_slam(config: dict, end_at: int | None = None) -> SLAM:
    """Reference-named entry point (scripts/splatam.py rgbd_slam)."""
    slam = SLAM(config)
    slam.run(end_at=end_at)
    return slam
