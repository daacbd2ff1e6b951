"""Per-frame camera tracking as a single jitted while-loop.

The reference runs a host-side Python loop of 10..200 Adam iterations per
frame, each doing two CUDA renders + backward (scripts/splatam.py:1247-1317).
Here the *entire* per-frame tracking — loss, gradient, Adam on (quat, trans),
best-candidate selection, and the TUM-style iteration-doubling stop rule —
is one `lax.while_loop` inside one XLA program: zero host round-trips per
iteration.

Reproduced semantics:
  * loss = masked-sum L1 on color+depth with silhouette>sil_thres mask
  * fresh Adam per frame (initialize_optimizer, splatam.py:1237) with
    lrs {cam_unnorm_rots, cam_trans} and eps=1e-8
  * candidate (quat, trans) stored *after* the Adam step whenever the
    pre-step loss improves (splatam.py:1281-1290 ordering)
  * depth_loss_thres rule: at num_iters, stop if weighted depth loss is
    below the threshold, else double the budget once (splatam.py:1304-1317)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import optim
from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..ops.rasterize import RasterConfig
from .losses import LossConfig, compute_loss

N_LOG = 7  # loss, im, depth, flat, iso, mean_density, mask_frac


class TrackingConfig(NamedTuple):
    num_iters: int
    lr_quat: float
    lr_trans: float
    use_depth_loss_thres: bool = False
    depth_loss_thres: float = 100000.0
    eps: float = 1e-8
    # tile lists are binned ONCE per frame at the initial pose, widened by
    # this pixel margin, and reused by every tracking iteration (pose
    # micro-updates stay inside the margin)
    bin_margin_px: float = 8.0
    # exact reference semantics: rebuild the tile lists at the current pose
    # every iteration (~2x tracking cost; removes the frozen-list
    # approximation — use when per-tile density approaches max_per_tile)
    rebin_every_iter: bool = False
    # cross-FRAME reuse (opt-in): the map only changes on map_every frames,
    # so one binning (widened to cross_frame_margin_px) can serve the
    # tracking-only frames in between; rebin when the predicted pose drifts
    # more than (cross_frame_margin_px - bin_margin_px) pixels from the bin
    # pose. Off by default: at Replica-like motion (~10 px/frame at fx=600)
    # the margin needed for even one reused frame inflates the tile
    # expansion towards isect-capacity overflow — only worth enabling for
    # slow-motion sequences (measured: no gain on the bench trajectory).
    reuse_binning: bool = False
    cross_frame_margin_px: float = 16.0
    # The tracking loss is a masked SUM whose silhouette mask depends on
    # the pose: a pose that pushes the render off the masked region
    # zeroes the loss — a degenerate minimum the reference never reaches
    # (its silhouette sits at ~1.0, ours is pulled toward the threshold
    # by the iso density target). Normalizing the best-candidate
    # comparison by mask coverage removes the degenerate attractor while
    # matching the reference bit-for-bit whenever the mask is stable
    # (constant scaling; gradients are untouched either way).
    mask_norm_candidate: bool = True
    # Per-iteration multiplicative lr decay. With L1 losses |grad| does
    # not vanish near the optimum, so constant-lr Adam bounces around the
    # pose optimum at lr scale forever (the reference's accuracy floor —
    # its Replica ATE ~ its translation lr). Decaying the lr anneals the
    # bounce: same loss, strictly tighter final pose. 1.0 = reference
    # behavior.
    lr_decay: float = 1.0
    # Point-to-plane ICP Gauss-Newton polish (0 = off = reference parity):
    # after the Adam loop, gn_iters damped GN steps on the depth channel
    # with the analytic SE(3) Jacobian (slam/icp.py) refine the best pose
    # below the photometric trough bias; accepted only if the point-to-
    # plane RMS decreased. One forward render per step, no backward.
    gn_iters: int = 0
    gn_damping: float = 1e-3
    # Photometric block weight in the GN solve (icp.GNConfig.phot_weight):
    # the combined colored-ICP system. 0 = depth-only p2p — measured
    # structurally drift-prone on low-texture scenes (NOTES.md session 7:
    # ATE 13.2 cm with perfect local depth alignment); keep > 0.
    gn_phot_weight: float = 0.3
    # trust region per GN iteration (icp.GNConfig.max_step)
    gn_max_step: float = 0.05
    # Photometric guard on the GN polish: accept only if the mask-
    # normalized tracking loss does not degrade by more than this factor.
    # The polish targets mm-scale trough corrections, which sit on the
    # FLAT part of the photometric loss (that flatness is the bias); a
    # polish that visibly worsens the photometric fit has aligned to a
    # biased model surface (sparse/blobby maps) and must be rejected —
    # measured: without this guard, toy-scale e2e ATE regressed 1.41 ->
    # 1.66 cm while the corner-scene polish still landed < 2 mm.
    gn_phot_tol: float = 0.05
    # Fast-tracking mode (1 = off = reference parity): evaluate the
    # tracking loss on every tile_subsample-th tile only (strided subset,
    # fixed for the whole frame so best-candidate comparisons stay
    # consistent; masked sums rescaled to full-image magnitude). Every
    # per-iteration cost (slot re-projection, compositing, reductions)
    # shrinks by the factor. The tracking analog of
    # mapping.tile_subsample.
    tile_subsample: int = 1
    # Coarse-to-fine tracking (1 = off = reference parity): run
    # pyramid_levels-1 coarse passes on 2x-downsampled image pyramids
    # before the full-resolution pass. Widens the photometric convergence
    # basin (~2-3 px at full res -> ~2-3 px *at the coarsest level*) for
    # fast motion, and gives the full-res pass a near-basin start. Each
    # coarse level costs ~4^-k of a full-res iteration.
    pyramid_levels: int = 1
    # iterations per coarse level (0 = same as num_iters). Because a
    # level-k iteration costs ~4^-k of a full-res one, moving most
    # iterations coarse (large pyramid_iters + small num_iters) is the
    # cheap route to more total optimization per frame.
    pyramid_iters: int = 0
    # per-level lr multiplier: level k uses lr * pyramid_lr_scale^k.
    # > 1 explores faster at coarse levels (their basin is 2^k wider in
    # pose space) while keeping the full-res pass at the reference lr.
    pyramid_lr_scale: float = 1.0
    # Pose-perturbation fan (0 = off = reference parity): after the Adam
    # loop, fan_rounds rounds of a forward-only pattern search around the
    # best pose — 14 probes per round (+/- eps on each quat/trans
    # component, the Adam parametrization), eps halving each round.
    # With L1 losses Adam bounces at lr scale and never anneals (NOTES.md
    # round-1 findings); the fan descends below that floor for ~14
    # forward slot-renders per round and no backward. Probes use the
    # same mask-normalized candidate metric as the loop.
    fan_rounds: int = 0
    # fan step seeds; 0 = derive from the lrs (the bounce scale)
    fan_trans_eps: float = 0.0
    fan_quat_eps: float = 0.0
    # Polyak (EMA) tail averaging of the pose iterates (0 = off =
    # reference parity): return the bias-corrected exponential moving
    # average of the Adam pose trajectory (decay rho per iteration)
    # instead of the best-candidate pose. With L1 losses Adam bounces
    # around the optimum at lr scale; averaging the iterates cancels the
    # bounce VARIANCE (~sqrt(window) tighter) without descending the
    # biased tracking loss any further — the opposite failure mode of
    # the fan/GN family, which over-optimized the metric and absorbed
    # map error into the pose (gauge drift, NOTES.md round-3 session 3).
    # EMA weight on the quat is linear in the unnormalized coefficients
    # (iterates stay in one hemisphere within a frame).
    polyak_rho: float = 0.0
    # Early stop (0 = off = reference parity): exit the Adam loop when
    # the best-candidate metric has not improved for this many
    # consecutive iterations. With polyak_rho == 0 this is pure
    # throughput: the returned pose is the best-so-far candidate either
    # way, and once the metric stalls the remaining iterations are
    # lr-scale bounce that best-candidate selection discards.
    # lax.while_loop's trip count is data-dependent, so stopped
    # iterations are real wall-clock savings on easy frames (slow
    # motion, converged maps). Takes precedence over the
    # depth_loss_thres doubling rule when both would fire.
    # CAVEAT (unadjudicated combination): with polyak_rho > 0 the
    # returned pose is the EMA of the iterates, and stopping early
    # TRUNCATES the average at the stall point — the two knobs together
    # change the returned pose, not just wall-clock. Do not enable both
    # without a separate multi-seed quality adjudication.
    early_stop_patience: int = 0


class TrackResult(NamedTuple):
    quat: jnp.ndarray       # [4] best candidate
    trans: jnp.ndarray      # [3]
    iters_run: jnp.ndarray  # [] int32
    loss_log: jnp.ndarray   # [2*num_iters, N_LOG], nan-padded
    # GN polish outcome: -1 = off, 0 = rejected, 1 = accepted (the TPU
    # validation needs per-frame acceptance visibility)
    gn_accepted: jnp.ndarray = None


@functools.partial(jax.jit, static_argnames=("cam", "rcfg"))
def bin_at_pose(params: GaussianParams, alive: jnp.ndarray,
                quat: jnp.ndarray, trans: jnp.ndarray,
                margin_px: jnp.ndarray, cam: Camera, rcfg: RasterConfig):
    """Tile lists for the map as seen from (quat, trans), widened by
    margin_px (traced scalar, so margin changes don't recompile)."""
    from ..ops.rasterize import bin_gaussians, project_gaussians
    from ..utils.transforms import transform_to_frame
    params = jax.tree.map(jax.lax.stop_gradient, params)
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, gaussians_grad=False,
                                camera_grad=False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam,
                             margin_px=margin_px)
    # params are frozen during tracking (pose is the only leaf), so the
    # cull needs no opacity drift; margin_px covers pose drift in pixels
    return bin_gaussians(proj, cam, rcfg,
                         opacity=jax.nn.sigmoid(params.logit_opacities[:, 0]),
                         cull_slack_px=margin_px)


@functools.partial(jax.jit, static_argnames=("cam", "stride"))
def max_pixel_drift(means3d: jnp.ndarray, alive: jnp.ndarray,
                    q0: jnp.ndarray, t0: jnp.ndarray,
                    q1: jnp.ndarray, t1: jnp.ndarray,
                    cam: Camera, stride: int = 16) -> jnp.ndarray:
    """Max screen-space displacement (pixels, Chebyshev) of a subsample of
    the map between two camera poses — the cheap validity test for reusing
    frozen tile lists across frames."""
    from ..ops.rasterize import NEAR_CULL_Z
    from ..utils.transforms import (normalize, pose_to_w2c,
                                    transform_points)
    pts = jax.lax.stop_gradient(means3d[::stride])
    al = alive[::stride]

    def uv(q, t):
        w2c = pose_to_w2c(normalize(q), t)
        pc = transform_points(w2c, pts)
        z = jnp.where(pc[:, 2] > 0, pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
        onscreen = ((u > -48.0) & (u < cam.width + 48.0)
                    & (v > -48.0) & (v < cam.height + 48.0))
        return u, v, (pc[:, 2] > NEAR_CULL_Z), onscreen

    u0, v0, m0, on0 = uv(q0, t0)
    u1, v1, m1, on1 = uv(q1, t1)
    # points that left/entered the near frustum force a rebin too
    changed_vis = (m0 ^ m1) & (on0 | on1) & al
    ok = al & m0 & m1 & (on0 | on1)
    d = jnp.maximum(jnp.abs(u0 - u1), jnp.abs(v0 - v1))
    drift = jnp.max(jnp.where(ok, d, 0.0))
    return jnp.where(jnp.any(changed_vis), jnp.inf, drift)


class BinningReuse:
    """Host-side cache of tracking tile lists across frames.

    The map only changes on map_every frames; between map updates the same
    (margin-widened) binning serves every tracking frame. The owner calls
    `invalidate()` whenever the map state changes (densify / mapping step /
    prune compaction / capacity growth — anything that edits rows or their
    order) and `get()` per frame; `get` rebins when the predicted pose has
    drifted beyond the margin budget. NOTES.md lever 1b.
    """

    def __init__(self, cam: Camera, rcfg: RasterConfig,
                 margin_px: float = 16.0, slack_px: float = 8.0):
        self.cam = cam
        self.rcfg = rcfg
        self.margin_px = float(margin_px)
        # pixels reserved for within-frame optimizer motion
        self.slack_px = float(slack_px)
        self._binning = None
        self._pose = None
        self.n_rebins = 0
        self.n_reuses = 0

    def invalidate(self):
        self._binning = None

    def get(self, params: GaussianParams, alive: jnp.ndarray,
            quat: jnp.ndarray, trans: jnp.ndarray):
        if self._binning is not None:
            bq, bt = self._pose
            drift = float(max_pixel_drift(params.means3d, alive, bq, bt,
                                          quat, trans, self.cam))
            if drift <= self.margin_px - self.slack_px:
                self.n_reuses += 1
                return self._binning
        self._binning = bin_at_pose(params, alive, quat, trans,
                                    jnp.float32(self.margin_px),
                                    self.cam, self.rcfg)
        self._pose = (quat, trans)
        self.n_rebins += 1
        return self._binning


class PoseLoopState(NamedTuple):
    """Final carry of the per-frame Adam pose loop (adam_pose_loop)."""
    pose: tuple
    opt: optim.AdamState
    best_pose: tuple
    min_loss: jnp.ndarray
    it: jnp.ndarray
    cur_max: jnp.ndarray
    doubled: jnp.ndarray
    done: jnp.ndarray
    log: jnp.ndarray
    # Polyak tail (tcfg.polyak_rho > 0): unnormalized EMA of the pose
    # iterates + its weight sum (bias correction divisor)
    ema: tuple = ()
    ema_w: jnp.ndarray | None = None
    # iteration index of the last best-candidate improvement (drives
    # tcfg.early_stop_patience)
    best_it: jnp.ndarray | None = None

    def polyak_pose(self) -> tuple:
        """Bias-corrected EMA pose (only valid when polyak_rho > 0)."""
        w = jnp.maximum(self.ema_w, 1e-20)
        return jax.tree.map(lambda e: e / w, self.ema)


def adam_pose_loop(loss_fn, pose0: tuple, tcfg: TrackingConfig,
                   value_and_grad_fn=None) -> PoseLoopState:
    """The whole per-frame tracking optimization as one lax.while_loop:
    Adam on (quat, trans), best-candidate selection under the (optionally
    mask-normalized) metric, per-iteration lr decay, and the TUM-style
    depth_loss_thres iteration-doubling stop rule
    (scripts/splatam.py:1247-1317). `loss_fn(pose) -> (loss, LossOutputs)`
    is the caller's render/loss closure — the serial slot-table path and
    the tile-sharded multi-chip path share this loop.

    value_and_grad_fn overrides the default jax.value_and_grad(loss_fn):
    the tile-sharded path (parallel/track_sharded.py) must psum the pose
    GRADIENTS across the mesh axis explicitly (differentiating through a
    psum'd forward would leave each device with only its local partial
    gradient), so it differentiates the device-local loss and psums both
    values and grads itself."""
    max_iters = tcfg.num_iters * (2 if tcfg.use_depth_loss_thres else 1)
    grad_fn = (jax.value_and_grad(loss_fn, has_aux=True)
               if value_and_grad_fn is None else value_and_grad_fn)
    lrs = (jnp.float32(tcfg.lr_quat), jnp.float32(tcfg.lr_trans))

    init = PoseLoopState(
        pose=pose0, opt=optim.init(pose0), best_pose=pose0,
        min_loss=jnp.asarray(1e20, jnp.float32),
        it=jnp.zeros((), jnp.int32),
        cur_max=jnp.asarray(tcfg.num_iters, jnp.int32),
        doubled=jnp.zeros((), bool), done=jnp.zeros((), bool),
        log=jnp.full((max_iters, N_LOG), jnp.nan, jnp.float32),
        ema=jax.tree.map(jnp.zeros_like, pose0),
        ema_w=jnp.zeros((), jnp.float32),
        best_it=jnp.zeros((), jnp.int32))

    def cond(c: PoseLoopState):
        return ~c.done

    def body(c: PoseLoopState):
        (loss, out), grads = grad_fn(c.pose)
        if tcfg.lr_decay != 1.0:
            decay = jnp.power(jnp.float32(tcfg.lr_decay),
                              c.it.astype(jnp.float32))
            it_lrs = (lrs[0] * decay, lrs[1] * decay)
        else:
            it_lrs = lrs
        new_pose, new_opt = optim.step(c.pose, grads, c.opt, it_lrs,
                                       eps=tcfg.eps)
        if tcfg.mask_norm_candidate:
            # per-masked-pixel loss: a candidate that merely shrank the
            # silhouette mask does not look "better" (see TrackingConfig)
            cand_metric = loss / jnp.maximum(out.mask_frac, 1e-6)
        else:
            cand_metric = loss
        improved = cand_metric < c.min_loss
        best_pose = jax.tree.map(
            lambda b, n: jnp.where(improved, n, b), c.best_pose, new_pose)
        min_loss = jnp.minimum(cand_metric, c.min_loss)
        log = c.log.at[c.it].set(jnp.stack(
            [out.loss, out.im, out.depth, out.flat, out.iso,
             out.mean_density, out.mask_frac]))
        it = c.it + 1
        best_it = jnp.where(improved, c.it, c.best_it)
        at_limit = it >= c.cur_max
        if tcfg.use_depth_loss_thres:
            below = out.depth < tcfg.depth_loss_thres
            do_double = at_limit & ~below & ~c.doubled
            done = at_limit & (below | c.doubled)
            cur_max = jnp.where(do_double, 2 * tcfg.num_iters, c.cur_max)
            doubled = c.doubled | do_double
        else:
            done = at_limit
            cur_max = c.cur_max
            doubled = c.doubled
        if tcfg.early_stop_patience > 0:
            # it-1 is the index just evaluated; stall = patience
            # consecutive evaluated iterations without a new best
            done = done | ((it - 1 - best_it)
                           >= jnp.int32(tcfg.early_stop_patience))
        if tcfg.polyak_rho > 0:
            rho = jnp.float32(tcfg.polyak_rho)
            ema = jax.tree.map(lambda e, p: rho * e + (1 - rho) * p,
                               c.ema, new_pose)
            ema_w = rho * c.ema_w + (1 - rho)
        else:
            ema, ema_w = c.ema, c.ema_w
        return PoseLoopState(pose=new_pose, opt=new_opt,
                             best_pose=best_pose, min_loss=min_loss, it=it,
                             cur_max=cur_max, doubled=doubled, done=done,
                             log=log, ema=ema, ema_w=ema_w, best_it=best_it)

    return jax.lax.while_loop(cond, body, init)


@functools.partial(jax.jit, static_argnames=("cam", "rcfg", "lcfg", "tcfg"))
def track_frame(params: GaussianParams, alive: jnp.ndarray,
                init_quat: jnp.ndarray, init_trans: jnp.ndarray,
                gt_im: jnp.ndarray, gt_depth: jnp.ndarray,
                cam: Camera, rcfg: RasterConfig, lcfg: LossConfig,
                tcfg: TrackingConfig,
                binning=None) -> TrackResult:
    assert lcfg.tracking
    if tcfg.rebin_every_iter and tcfg.tile_subsample > 1:
        raise ValueError(
            "tracking.tile_subsample requires the frozen-slot-table path; "
            "it cannot be combined with tracking.rebin_every_iter")
    max_iters = tcfg.num_iters * (2 if tcfg.use_depth_loss_thres else 1)
    params = jax.tree.map(jax.lax.stop_gradient, params)

    if tcfg.rebin_every_iter:
        # exact reference semantics: per-gaussian re-projection + fresh
        # tile lists every iteration
        def loss_fn(pose):
            quat, trans = pose
            out = compute_loss(params, alive, quat, trans, gt_im, gt_depth,
                               cam, rcfg, lcfg, binning=None)
            return out.loss, out
    else:
        if binning is None:
            # bin once at the initial pose with a safety margin; every
            # iteration reuses the frozen tile lists (the slot render
            # re-projects exactly; margin-only candidates rank after true
            # ones)
            from ..ops.rasterize import bin_gaussians, project_gaussians
            from ..utils.transforms import transform_to_frame
            mc0, qc0 = transform_to_frame(params.means3d,
                                          params.unnorm_rotations,
                                          init_quat, init_trans,
                                          gaussians_grad=False,
                                          camera_grad=False)
            proj0 = project_gaussians(mc0, qc0, params.log_scales, alive,
                                      cam, margin_px=tcfg.bin_margin_px)
            binning = bin_gaussians(
                proj0, cam, rcfg,
                opacity=jax.nn.sigmoid(params.logit_opacities[:, 0]),
                cull_slack_px=tcfg.bin_margin_px)
        # gather the frozen per-slot raw table ONCE per frame; iterations
        # re-project per slot with pose as the only gradient leaf (no
        # per-iteration gather, no backward scatter — see rasterize.py)
        from ..ops.rasterize import gather_raw_table
        from .losses import compute_loss_slots
        counts = binning.tile_count
        # the GN polish renders the FULL image from the frozen table; only
        # gather all T tiles when it will run (else the subset suffices)
        need_full = tcfg.tile_subsample <= 1 or tcfg.gn_iters > 0
        raw = (gather_raw_table(params, binning.tile_gauss)
               if need_full else None)

        if tcfg.tile_subsample > 1:
            # strided tile subset, fixed per frame (see TrackingConfig)
            from ..ops.rasterize import image_to_tiles, tile_pixel_validity
            from .losses import compute_loss_slots_subset
            T_tiles = cam.num_tiles
            Ts = max(T_tiles // tcfg.tile_subsample, 1)
            sel = jnp.arange(Ts, dtype=jnp.int32) * tcfg.tile_subsample
            # gather only the selected tiles' slots (the whole point of
            # the mode is to shrink the per-frame [T, K] setup cost)
            raw_sub = (raw[sel] if raw is not None else
                       gather_raw_table(params, binning.tile_gauss[sel]))
            counts_sub = counts[sel]
            gt_tiles = image_to_tiles(
                jnp.concatenate([gt_im, gt_depth], axis=0), cam)[sel]
            valid_px = jnp.asarray(tile_pixel_validity(cam))[sel]
            scale = float(T_tiles) / float(Ts)

            def loss_fn(pose):
                quat, trans = pose
                out = compute_loss_slots_subset(
                    raw_sub, counts_sub, sel, quat, trans, gt_tiles,
                    valid_px, cam, rcfg, lcfg, scale=scale)
                return out.loss, out
        else:
            def loss_fn(pose):
                quat, trans = pose
                out = compute_loss_slots(raw, counts, quat, trans, gt_im,
                                         gt_depth, cam, rcfg, lcfg)
                return out.loss, out

    final = adam_pose_loop(loss_fn, (init_quat, init_trans), tcfg)
    best_q, best_t = (final.polyak_pose() if tcfg.polyak_rho > 0
                      else final.best_pose)
    gn_accepted = jnp.asarray(-1, jnp.int32)

    if tcfg.fan_rounds > 0:
        # forward-only pattern search below the Adam bounce floor (see
        # TrackingConfig.fan_rounds): probe +/- eps on each pose
        # component, keep the best by the SAME candidate metric as the
        # loop, halve eps, repeat. No backward passes; rejected probes
        # leave the pose untouched, so the fan can only improve the
        # metric the loop was already optimizing.
        def cand_metric_fn(pose):
            loss, out = loss_fn(pose)
            if tcfg.mask_norm_candidate:
                return loss / jnp.maximum(out.mask_frac, 1e-6)
            return loss

        eps_t0 = jnp.float32(tcfg.fan_trans_eps or tcfg.lr_trans)
        eps_q0 = jnp.float32(tcfg.fan_quat_eps or tcfg.lr_quat)
        eye4, eye3 = jnp.eye(4, dtype=jnp.float32), jnp.eye(3,
                                                           dtype=jnp.float32)
        dirs_q = jnp.concatenate([eye4, -eye4, jnp.zeros((6, 4))])  # [14,4]
        dirs_t = jnp.concatenate([jnp.zeros((8, 3)), eye3, -eye3])  # [14,3]

        def fan_round(r, carry):
            bq, bt, bm = carry
            s = jnp.power(jnp.float32(0.5), r.astype(jnp.float32))
            qs = bq[None] + dirs_q * (eps_q0 * s)
            ts = bt[None] + dirs_t * (eps_t0 * s)
            ms = jax.lax.map(cand_metric_fn, (qs, ts))
            i = jnp.argmin(ms)
            better = ms[i] < bm
            return (jnp.where(better, qs[i], bq),
                    jnp.where(better, ts[i], bt), jnp.minimum(ms[i], bm))

        m0 = cand_metric_fn((best_q, best_t))
        best_q, best_t, _ = jax.lax.fori_loop(
            0, tcfg.fan_rounds, fan_round, (best_q, best_t, m0))

    if tcfg.gn_iters > 0:
        from .icp import GNConfig, gn_depth_polish
        if tcfg.rebin_every_iter:
            # the exact-rebin path never built a slot table: bin + gather
            # once at the converged pose for the polish renders
            from ..ops.rasterize import (bin_gaussians, gather_raw_table,
                                         project_gaussians)
            from ..utils.transforms import transform_to_frame
            mc1, qc1 = transform_to_frame(params.means3d,
                                          params.unnorm_rotations,
                                          best_q, best_t,
                                          gaussians_grad=False,
                                          camera_grad=False)
            proj1 = project_gaussians(mc1, qc1, params.log_scales, alive,
                                      cam, margin_px=tcfg.bin_margin_px)
            b1 = bin_gaussians(
                proj1, cam, rcfg,
                opacity=jax.nn.sigmoid(params.logit_opacities[:, 0]),
                cull_slack_px=tcfg.bin_margin_px)
            gn_raw, gn_counts = gather_raw_table(params,
                                                 b1.tile_gauss), b1.tile_count
        else:
            gn_raw, gn_counts = raw, counts
        # NOTE: GN keeps its own 0.9 confidence gate regardless of the
        # (possibly much looser) tracking-loss sil_thres — low-sil pixels
        # have the least reliable normalized depth (see icp.linearize).
        gcfg = GNConfig(iters=tcfg.gn_iters, damping=tcfg.gn_damping,
                        phot_weight=tcfg.gn_phot_weight,
                        max_step=tcfg.gn_max_step)
        pq, pt, c0, c1 = gn_depth_polish(gn_raw, gn_counts, best_q, best_t,
                                         gt_depth, cam, rcfg, gcfg,
                                         gt_im=gt_im)

        if tcfg.rebin_every_iter:
            from .losses import compute_loss_slots

            def _metric(pose):
                out = compute_loss_slots(gn_raw, gn_counts, pose[0], pose[1],
                                         gt_im, gt_depth, cam, rcfg, lcfg)
                return out.loss / jnp.maximum(out.mask_frac, 1e-6)
        else:
            def _metric(pose):
                loss, out = loss_fn(pose)
                return loss / jnp.maximum(out.mask_frac, 1e-6)

        phot_ok = (_metric((pq, pt))
                   <= _metric((best_q, best_t)) * (1.0 + tcfg.gn_phot_tol))
        accept = (c1 < c0) & phot_ok
        best_q = jnp.where(accept, pq, best_q)
        best_t = jnp.where(accept, pt, best_t)
        gn_accepted = accept.astype(jnp.int32)

    return TrackResult(quat=best_q, trans=best_t,
                       iters_run=final.it, loss_log=final.log,
                       gn_accepted=gn_accepted)


def pyramid_cam(cam: Camera, k: int) -> Camera:
    """Camera for pyramid level k (2^k downsample), intrinsics scaled the
    same way the dataset layer scales them on resize (K rows * ratio,
    datasets/base.py:138-140)."""
    s = 1 << k
    return Camera(width=cam.width // s, height=cam.height // s,
                  fx=cam.fx / s, fy=cam.fy / s, cx=cam.cx / s,
                  cy=cam.cy / s, near=cam.near, far=cam.far)


@functools.partial(jax.jit, static_argnames=("k",))
def downsample_frame(gt_im: jnp.ndarray, gt_depth: jnp.ndarray, k: int):
    """[3,H,W]+[1,H,W] -> level-k pyramid frame: color 2^k average-pooled
    (BILINEAR-like), depth stride-subsampled (NEAREST — no edge mixing,
    zeros stay exact zeros for the valid-depth mask)."""
    s = 1 << k
    H, W = gt_im.shape[-2], gt_im.shape[-1]
    h, w = H // s, W // s
    im = gt_im[:, : h * s, : w * s].reshape(3, h, s, w, s).mean((2, 4))
    d = gt_depth[:, : h * s : s, : w * s : s]
    return im, d


def track_frame_pyramid(params: GaussianParams, alive: jnp.ndarray,
                        init_quat: jnp.ndarray, init_trans: jnp.ndarray,
                        gt_im: jnp.ndarray, gt_depth: jnp.ndarray,
                        cam: Camera, rcfg: RasterConfig, lcfg: LossConfig,
                        tcfg: TrackingConfig, binning=None,
                        track_fn=None) -> TrackResult:
    """Coarse-to-fine tracking: pyramid_levels-1 coarse passes feed the
    full-resolution track_frame. Each level is its own jitted program
    (static camera); the pose carries across levels, the best-candidate
    bookkeeping restarts per level (loss scales differ across levels).
    Returns the full-resolution result with iters_run accumulated.

    track_fn overrides the per-level tracker (same signature as
    track_frame) — the pipeline passes the tile-sharded multi-chip
    tracker here (parallel/track_sharded.py)."""
    if track_fn is None:
        track_fn = track_frame
    q, t = init_quat, init_trans
    coarse_logs = []
    coarse_iters = tcfg.pyramid_iters or tcfg.num_iters
    for k in range(tcfg.pyramid_levels - 1, 0, -1):
        cam_k = pyramid_cam(cam, k)
        im_k, d_k = downsample_frame(gt_im, gt_depth, k)
        # gn_iters=0 / fan_rounds=0: the GN polish and the perturbation
        # fan are sub-pixel refinements — at coarse levels they only add
        # compiles + renders; run them at full resolution only.
        # pyramid_lr_scale^k: coarse levels may explore with larger steps
        # (their photometric basin is 2^k wider in pose space).
        lr_k = tcfg.pyramid_lr_scale ** k
        tcfg_k = tcfg._replace(num_iters=coarse_iters, pyramid_levels=1,
                               use_depth_loss_thres=False, gn_iters=0,
                               fan_rounds=0,
                               # coarse passes are still CONVERGING (not
                               # bouncing): an EMA would lag the handoff
                               # pose — Polyak applies at full res only
                               polyak_rho=0.0,
                               lr_quat=tcfg.lr_quat * lr_k,
                               lr_trans=tcfg.lr_trans * lr_k)
        res = track_fn(params, alive, q, t, im_k, d_k, cam_k, rcfg,
                       lcfg, tcfg_k)
        q, t = res.quat, res.trans
        coarse_logs.append(res.loss_log[: int(res.iters_run)])
    res = track_fn(params, alive, q, t, gt_im, gt_depth, cam, rcfg,
                   lcfg, tcfg._replace(pyramid_levels=1),
                   binning=binning)
    # one contiguous log so iters_run always indexes valid rows
    # (consumers read log[iters_run - 1])
    extra = sum(r.shape[0] for r in coarse_logs)
    return res._replace(
        iters_run=res.iters_run + extra,
        loss_log=jnp.concatenate(coarse_logs + [res.loss_log]))


def initialize_camera_pose(cam_rots, cam_trans, time_idx: int,
                           forward_prop: bool):
    """Constant-velocity pose initialization (splatam.py:844-863).
    cam_rots [4, T], cam_trans [3, T] numpy/jnp; returns (quat, trans)."""
    if time_idx > 1 and forward_prop:
        r1 = cam_rots[:, time_idx - 1]
        r1 = r1 / jnp.linalg.norm(r1)
        r2 = cam_rots[:, time_idx - 2]
        r2 = r2 / jnp.linalg.norm(r2)
        new_rot = r1 + (r1 - r2)
        new_rot = new_rot / jnp.linalg.norm(new_rot)
        t1 = cam_trans[:, time_idx - 1]
        t2 = cam_trans[:, time_idx - 2]
        return new_rot, t1 + (t1 - t2)
    return cam_rots[:, time_idx - 1], cam_trans[:, time_idx - 1]
