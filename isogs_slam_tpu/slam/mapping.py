"""Keyframe mapping as a single jitted lax.scan over optimization iterations.

Replaces the host loop at scripts/splatam.py:1412-1491: per iteration, pick a
(host-pre-sampled) keyframe, evaluate the mapping loss (L1+SSIM color, masked
depth L1, IsoGS flat+iso), take one Adam step on the Gaussian parameters, and
apply the pruning schedule (prune_gaussians, slam_external.py:167-188) as
alive-mask updates. The full keyframe window lives on device (uint8 color /
f32 depth) so a mapping phase runs without host round-trips.

Fresh Adam per frame (initialize_optimizer is called per mapping phase,
splatam.py:1406) with eps=1e-15 and per-param lrs.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import optim
from ..core.camera import Camera
from ..core.gaussians import GaussianParams, MapState
from ..ops.rasterize import RasterConfig
from ..utils.transforms import normalize
from .losses import LossConfig, compute_loss

N_LOG = 7  # loss, im, depth, flat, iso, mean_density, mask_frac


def _col_major(tree):
    """Constrain every [N, C] leaf to column-major ({0,1}) layout.

    Left to itself, XLA lays the mapping scan's carry (params + Adam
    moments) out row-major {1,0:T(8,128)} — 3 live lanes of 128, so every
    elementwise op on them (Adam, transform backward) runs at ~2.5% of
    HBM bandwidth (measured: 25 ms/iter of Adam at N=1.2M that should
    cost < 1 ms). Column-major puts N in the lane dimension (~42x less
    physical padding); the renderer's row-gather tables are built by
    concat and keep their own layouts.
    """
    if jax.default_backend() != "tpu":
        return tree
    from jax.experimental.layout import Layout, with_layout_constraint
    cm = Layout((1, 0))
    return jax.tree.map(
        lambda a: with_layout_constraint(a, cm) if a.ndim == 2 else a, tree)


class PruneConfig(NamedTuple):
    enabled: bool
    start_after: int
    remove_big_after: int
    stop_after: int
    prune_every: int
    removal_opacity_threshold: float
    final_removal_opacity_threshold: float
    reset_opacities: bool
    reset_opacities_every: int


class MappingConfig(NamedTuple):
    num_iters: int
    lr_means3d: float
    lr_rgb_colors: float
    lr_unnorm_rotations: float
    lr_logit_opacities: float
    lr_log_scales: float
    prune: PruneConfig
    eps: float = 1e-15
    # tile lists are binned ONCE per keyframe slot per mapping phase.
    # 0 (default) = MARGIN-FREE: the lists are the TRUE tile rects at the
    # phase-start params, so the mapping loss composites exactly the
    # function eval and (coverage-fixed) tracking render. A positive
    # margin makes the lists a superset, but margin-extra slots composite
    # real alpha the reference's per-iteration rects never render, and
    # the map then converges to "margin-render == GT" while tracking/eval
    # see the margin-free render — MEASURED 2026-08-19: that mismatch
    # cost tracked ATE 1.26 -> 2.04 cm and PSNR 20.35 -> 19.61 at
    # full_res (ablations/full_res_map_margin0.py).
    bin_margin_px: float = 0.0
    # optional Inria clone/split densification during mapping
    # (use_gaussian_splatting_densification, configs/*/splatam.py)
    use_densification: bool = False
    densify: tuple | None = None   # DensifyConfig when enabled
    # fast-mapping mode (OFF by default, stochastic-gradient variant of
    # the reference semantics): render the loss on a 1/tile_subsample
    # full-width tile-row STRIPE per iteration — every intersection-
    # proportional cost (gather, Pallas fwd/bwd, backward scatter)
    # shrinks by ~the factor (the stripe carries one halo tile row above
    # and below so the SSIM windows are exact; see
    # losses.compute_loss_subsampled for the estimator proof).
    tile_subsample: int = 1
    # stripe selection: True = epoch-style cycling (a per-cycle
    # permutation of the disjoint stripes — every tile rendered exactly
    # once per `tile_subsample` iterations, i.e. without-replacement
    # SGD); False = iid stripes (cycling MEASURED better for per-tile
    # subsets: ATE 11.3 iid vs 2.82 cycled at sub4+40 iters, NOTES.md
    # sessions 7-8).
    tile_cycle: bool = True
    # lazy (sparse) Adam for the subset path: a Gaussian's moments /
    # bias-correction count / params advance only on iterations whose
    # stripe actually produced a gradient for it. Without this, every
    # non-visited iteration applies a pure-momentum echo step (~2.4x
    # overshoot per visit at sub=4) that the reference's full-image Adam
    # never takes. MEASURED 2026-08-19 (30-frame full_res, margin-0):
    # the echo HELPS the subset regime — it acts as extra effective
    # per-row iterations where each row only gets num_iters/sub visits
    # (sub4@40: lazy ATE 6.88 vs dense 2.35 cm; sub4@80: 1.66 vs 1.48).
    # Default OFF; the knob stays for schedules that re-tune lrs per
    # visit count. No effect on the exact path (every visible row is
    # touched every iteration there, matching torch semantics).
    lazy_adam: bool = False
    # run the LAST `exact_polish_iters` iterations of a subsampled phase
    # on the exact full-image loss (same optimizer state, same frozen
    # binnings). Rationale: stripes leave the phase-final map in a
    # stripe-correlated stale state — each band's loss was last
    # consistent at ITS final visit, but params kept moving for up to
    # `sub-1` iterations afterwards — and tracking then reads that
    # spatially-patterned residual as pose error (the sub4 drift is
    # super-linear from ~frame 15, NOTES.md round-3 session 4). A few
    # exact closing iterations re-anchor every pixel to the same final
    # params at a cost of 1 exact-iter-equivalent each.
    exact_polish_iters: int = 0
    # ablation knob: route through the subset loss path even at
    # tile_subsample=1 (all tiles selected, zero sampling variance).
    # With the stripe estimator this is loss-equivalent to the exact
    # path (the sub=1 stripe IS the full image) — kept as the
    # discriminator that proved the old per-tile valid-window SSIM was
    # the fast-mode quality bug (ATE 1.22 -> 2.14 cm at sub=1).
    force_subset: bool = False
    # batch the per-slot phase binnings with vmap instead of a serial
    # lax.map: one wide sort/expansion program instead of S sequential
    # ones (S = distinct sampled keyframe slots, 4-8). Costs S-times the
    # transient expansion memory; with the demand-driven isect cap that
    # is ~100-400 MB at 1M Gaussians. MEASURED 2026-08-19 (TPU bench,
    # 939k Gaussians): LOSES — exact 0.873 FPS vs 0.923 serial (the
    # batched sort's wider key space costs more than the dispatch
    # saves). Experimental; keep off.
    vmap_bins: bool = False

    def lrs(self) -> GaussianParams:
        f = jnp.float32
        return GaussianParams(
            means3d=f(self.lr_means3d), rgb_colors=f(self.lr_rgb_colors),
            unnorm_rotations=f(self.lr_unnorm_rotations),
            logit_opacities=f(self.lr_logit_opacities),
            log_scales=f(self.lr_log_scales))


def stripe_shape(gy: int, gx: int, sub: int):
    """Static stripe geometry for the fast-mapping mode: core rows per
    stripe, window rows (core + up to one halo tile row on each side),
    stripe count, and the rendered tile count Ts."""
    rows_core = -(-gy // sub)
    rows_w = min(rows_core + 2, gy)
    n_stripes = -(-gy // rows_core)
    return rows_core, rows_w, n_stripes, rows_w * gx


def select_stripe(perm_base, visit, stripe_or_key, gy: int, gx: int,
                  rows_core: int, rows_w: int, n_stripes: int):
    """Tile ids + core mask of one full-width tile-row stripe.

    The stripe estimator (losses.compute_loss_subsampled) needs each
    selected band to carry one HALO tile row above and below its core so
    SSIM windows centered in the core read true rendered neighbors. Core
    starts cycle through a per-cycle permutation of the n_stripes
    disjoint bands (without-replacement SGD over the image; iid subsets
    and the old per-tile chunks were MEASURED worse — NOTES.md sessions
    7-8). When rows_core does not divide gy the last stripe is shifted
    up to stay in range (a few rows visited twice per cycle; none
    missed). Pass stripe_or_key=None for cycling, or a PRNG key for an
    iid random stripe (mapping.tile_cycle=False).

    Returns (sel [rows_w * gx] int32 ascending tile ids,
    core [rows_w * gx] bool)."""
    if stripe_or_key is None:
        cycle = visit // n_stripes
        perm = jax.random.permutation(
            jax.random.fold_in(perm_base, cycle), n_stripes)
        si = perm[visit % n_stripes]
    else:
        si = jax.random.randint(stripe_or_key, (), 0, n_stripes)
    r0 = jnp.minimum(si * rows_core, gy - rows_core)
    ws = jnp.clip(r0 - 1, 0, gy - rows_w)
    rows = ws + jnp.arange(rows_w, dtype=jnp.int32)
    core_row = (rows >= r0) & (rows < r0 + rows_core)
    sel = (rows[:, None] * gx
           + jnp.arange(gx, dtype=jnp.int32)[None, :]).reshape(-1)
    return sel, jnp.repeat(core_row, gx)


def _prune_mask(params: GaussianParams, alive, scene_radius, it,
                pc: PruneConfig):
    """Row-removal mask for iteration `it` (prune_gaussians semantics)."""
    thres = jnp.where(it == pc.stop_after,
                      pc.final_removal_opacity_threshold,
                      pc.removal_opacity_threshold)
    remove = jax.nn.sigmoid(params.logit_opacities[:, 0]) < thres
    big = jnp.max(jnp.exp(params.log_scales), axis=1) > 0.1 * scene_radius
    remove = jnp.where(it >= pc.remove_big_after, remove | big, remove)
    do = ((it <= pc.stop_after) & (it >= pc.start_after)
          & (it % max(pc.prune_every, 1) == 0))
    return jnp.where(do & pc.enabled, remove & alive, False)


@functools.partial(jax.jit, static_argnames=("lcfg",))
def build_phase_iso_pool(params: GaussianParams, alive, key,
                         lcfg: LossConfig):
    """Standalone per-phase iso-KNN pool builder (hash grid + batched
    KNN). Used by the pipeline when mapping.iso_pool_refresh_phases > 1:
    the pool's neighbor indices are order statistics over a slowly-
    drifting map, and both queries and neighbors are alive-masked at
    evaluation time, so reusing a pool for a few phases only skips
    newly-added rows from the iso SAMPLE until the next refresh."""
    from ..ops.iso_loss import build_iso_knn_pool
    p0 = jax.tree.map(jax.lax.stop_gradient, params)
    iso_grid = None
    if lcfg.knn_method == "hash":
        from ..ops.spatial_hash import build_hash_grid, default_cell_size
        cell = default_cell_size(p0.log_scales, alive)
        iso_grid = build_hash_grid(p0.means3d, alive, cell,
                                   lcfg.hash_table_size)
    return build_iso_knn_pool(
        p0.means3d, p0.log_scales, alive, key,
        pool_size=lcfg.iso_pool_size, k=lcfg.iso_k,
        knn_method=lcfg.knn_method, hash_cap=lcfg.hash_cap,
        hash_table_size=lcfg.hash_table_size, knn_block=lcfg.knn_block,
        grid=iso_grid)


@functools.partial(jax.jit,
                   static_argnames=("cam", "rcfg", "lcfg", "mcfg"),
                   donate_argnames=("state",))
def map_frame(state: MapState,
              kf_colors_u8: jnp.ndarray,   # [S, H, W, 3] uint8
              kf_depths: jnp.ndarray,      # [S, H, W] float32 (meters)
              kf_quats: jnp.ndarray,       # [S, 4] estimated pose per slot
              kf_transl: jnp.ndarray,      # [S, 3]
              iter_slots: jnp.ndarray,     # [num_iters] int32 slot per iter
              keys: jnp.ndarray,           # [num_iters] PRNG keys
              cam: Camera, rcfg: RasterConfig, lcfg: LossConfig,
              mcfg: MappingConfig, iso_pool=None):
    """Returns (new MapState, loss_log [num_iters, N_LOG], bin_stats [2] =
    [true-candidate intersections dropped by the per-tile cap, total
    intersections] summed over the phase's keyframe slots).

    Note on use_densification: tile lists and the iso hash grid are frozen
    per phase, so rows cloned/split mid-phase start receiving render
    gradients at the NEXT phase (the reference re-bins every iteration).
    For SLAM the in-phase delay is at most one map_every interval.
    """
    assert not lcfg.tracking
    lrs = mcfg.lrs()
    pc = mcfg.prune

    # bin each keyframe slot once (frozen per-phase tile lists with margin;
    # the analog of the tracking-side once-per-frame binning)
    from ..ops.rasterize import bin_gaussians, project_gaussians
    from ..utils.transforms import transform_to_frame
    p0 = jax.tree.map(jax.lax.stop_gradient, state.params)
    alive0 = state.alive

    subsample = mcfg.tile_subsample > 1 or mcfg.force_subset
    polish = (min(int(mcfg.exact_polish_iters), mcfg.num_iters)
              if subsample else 0)
    n_sub = mcfg.num_iters - polish

    def bin_slot(pose):
        quat, trans = pose
        mc, qc = transform_to_frame(p0.means3d, p0.unnorm_rotations,
                                    quat, trans, gaussians_grad=False,
                                    camera_grad=False)
        proj = project_gaussians(mc, qc, p0.log_scales, alive0, cam,
                                 margin_px=mcfg.bin_margin_px)
        # emit the expansion-position payload only when the backward will
        # consume it: always for the exact path, above the row crossover
        # for the subset path (rasterize.subset_uses_segreduce)
        if subsample:
            from ..ops.rasterize import subset_uses_segreduce
            t_sub = stripe_shape(cam.tiles_y, cam.tiles_x,
                                 mcfg.tile_subsample)[3]
            emit = subset_uses_segreduce(rcfg, t_sub)
            if polish:  # the closing exact iterations render full-image
                emit = emit or rcfg.resolve_bwd_mode() == "segreduce"
        else:
            emit = rcfg.resolve_bwd_mode() == "segreduce"
        # cull budget while this binning is reused: pixel slack = the rect
        # margin; opacity logits can rise by <= 3.2 * lr per Adam step
        # worst-case ((1-b1)/sqrt(1-b2) with b1=0.9, b2=0.999 — sign flips
        # after near-zero gradients), so budget 3.2 * lr * num_iters
        return bin_gaussians(
            proj, cam, rcfg, emit_exp=emit,
            opacity=jax.nn.sigmoid(p0.logit_opacities[:, 0]),
            cull_slack_px=mcfg.bin_margin_px,
            cull_logit_drift=3.2 * mcfg.lr_logit_opacities * mcfg.num_iters)

    bins = (jax.vmap(bin_slot)((kf_quats, kf_transl)) if mcfg.vmap_bins
            else jax.lax.map(bin_slot, (kf_quats, kf_transl)))
    # true-candidate truncation observability (Binning.n_true_overflow):
    # [sum of true-footprint intersections dropped by the K cap, total]
    bin_stats = jnp.stack([jnp.sum(bins.n_true_overflow),
                           jnp.sum(bins.n_isect),
                           jnp.max(bins.n_isect)])

    # hash grid for the iso loss: built once per phase, reused every
    # iteration (Gaussian drift within a phase << cell size). Skipped
    # entirely when a prebuilt pool is passed in (the pool path never
    # consults the grid) — mapping.iso_pool_refresh_phases amortizes the
    # grid + pool build across phases.
    iso_grid = None
    if iso_pool is None and lcfg.calc_iso and lcfg.knn_method == "hash":
        from ..ops.spatial_hash import build_hash_grid, default_cell_size
        cell = default_cell_size(p0.log_scales, alive0)
        iso_grid = build_hash_grid(p0.means3d, alive0, cell,
                                   lcfg.hash_table_size)
    if iso_pool is None and lcfg.calc_iso and lcfg.iso_pool_size > 0:
        # per-phase frozen KNN pool (see LossConfig.iso_pool_size): one
        # batched KNN here replaces 27-cell candidate gathers + top-k in
        # every iteration — the dominant iso cost at N ~ 10^6
        from ..ops.iso_loss import build_iso_knn_pool
        pool_key = jax.random.fold_in(keys[0], 0x150)
        iso_pool = build_iso_knn_pool(
            p0.means3d, p0.log_scales, alive0, pool_key,
            pool_size=lcfg.iso_pool_size, k=lcfg.iso_k,
            knn_method=lcfg.knn_method, hash_cap=lcfg.hash_cap,
            hash_table_size=lcfg.hash_table_size,
            knn_block=lcfg.knn_block, grid=iso_grid)

    def loss_fn_exact(params, m2d, alive, quat, trans, slot, key, binning,
                      it, visit):
        del it, visit
        gt_im = (kf_colors_u8[slot].astype(jnp.float32) / 255.0
                 ).transpose(2, 0, 1)
        gt_depth = kf_depths[slot][None]
        out = compute_loss(params, alive, quat, trans, gt_im, gt_depth,
                           cam, rcfg, lcfg, key=key, binning=binning,
                           iso_grid=iso_grid, means2d_offset=m2d,
                           iso_pool=iso_pool)
        return out.loss, out

    if subsample:
        # pre-tile the phase's keyframe GT into the compositor's tile
        # layout once; iterations gather only the selected tiles' rows
        from ..ops.rasterize import image_to_tiles, tile_pixel_validity
        from .losses import compute_loss_subsampled

        def tile_gt(c_u8, dmap):
            im = c_u8.astype(jnp.float32).transpose(2, 0, 1) / 255.0
            return image_to_tiles(
                jnp.concatenate([im, dmap[None]], axis=0), cam)

        gt_tiles_all = jax.lax.map(
            lambda x: tile_gt(*x), (kf_colors_u8, kf_depths))  # [S,T,P,4]
        valid_px_full = jnp.asarray(tile_pixel_validity(cam))  # [T, P]
        rows_core, rows_w, n_stripes, _ = stripe_shape(
            cam.tiles_y, cam.tiles_x, mcfg.tile_subsample)
        perm_base = jax.random.fold_in(keys[0], 0x71C)

        def loss_fn_sub(params, m2d, alive, quat, trans, slot, key, binning,
                        it, visit):
            key_sel, key_iso = jax.random.split(jax.random.fold_in(key, 7))
            # cycle per (slot, visit): each keyframe's OWN iterations
            # walk disjoint stripes — with a global cycle a slot seen
            # ~iters/S times has a (1-1/sub)^visits chance a stripe
            # never gets rendered for it within the phase
            sel, core = select_stripe(
                jax.random.fold_in(perm_base, slot), visit,
                None if mcfg.tile_cycle else key_sel,
                cam.tiles_y, cam.tiles_x, rows_core, rows_w, n_stripes)
            gt_tiles = gt_tiles_all[slot][sel]
            out = compute_loss_subsampled(
                params, alive, quat, trans, gt_tiles, valid_px_full[sel],
                core, sel, binning, cam, rcfg, lcfg,
                key=key_iso, means2d_offset=m2d, iso_grid=iso_grid,
                iso_pool=iso_pool)
            return out.loss, out

        loss_fn = loss_fn_sub
    else:
        loss_fn = loss_fn_exact

    grad_argnums = (0, 1) if mcfg.use_densification else (0,)

    def make_body(loss_f):
        grad_fn = jax.value_and_grad(loss_f, argnums=grad_argnums,
                                     has_aux=True)

        def body(carry, xs):
            st, opt = carry
            slot, key, it, visit = xs
            quat = jax.lax.stop_gradient(kf_quats[slot])
            trans = jax.lax.stop_gradient(kf_transl[slot])
            binning = jax.tree.map(lambda a: a[slot], bins)

            m2d = (jnp.zeros((st.capacity, 2), jnp.float32)
                   if mcfg.use_densification else None)
            (loss, out), grad_tuple = grad_fn(st.params, m2d, st.alive,
                                              quat, trans, slot, key,
                                              binning, it, visit)
            grads = grad_tuple[0]
            if mcfg.use_densification:
                from .densify import (accumulate_mean2d_gradient,
                                      densify_step)
                st = accumulate_mean2d_gradient(st, out.radii,
                                                grad_tuple[1])
                key_d, key = jax.random.split(key)
                st, opt = densify_step(st, opt, key_d, it, mcfg.densify)

            # seen/max_2D_radius bookkeeping (splatam.py:751-753)
            seen = out.radii > 0
            max_r = jnp.where(
                seen, jnp.maximum(out.radii.astype(st.max_2d_radius.dtype),
                                  st.max_2d_radius), st.max_2d_radius)
            st = st._replace(max_2d_radius=max_r)

            # prune (before the optimizer step, splatam.py:1461-1467)
            remove = _prune_mask(st.params, st.alive, st.scene_radius, it,
                                 pc)
            st = st._replace(alive=st.alive & ~remove)

            # opacity reset (update_params_and_optimizer: param replaced
            # and its Adam moments zeroed, slam_external.py:183-186)
            if pc.reset_opacities:
                do_reset = ((it > 0)
                            & (it % max(pc.reset_opacities_every, 1) == 0))
                reset_val = jnp.log(jnp.asarray(0.01 / 0.99, jnp.float32))
                new_op = jnp.where(do_reset,
                                   jnp.full_like(st.params.logit_opacities,
                                                 reset_val),
                                   st.params.logit_opacities)
                st = st._replace(
                    params=st.params._replace(logit_opacities=new_op))
                zmu = jnp.where(do_reset,
                                jnp.zeros_like(opt.mu.logit_opacities),
                                opt.mu.logit_opacities)
                znu = jnp.where(do_reset,
                                jnp.zeros_like(opt.nu.logit_opacities),
                                opt.nu.logit_opacities)
                opt = opt._replace(mu=opt.mu._replace(logit_opacities=zmu),
                                   nu=opt.nu._replace(logit_opacities=znu))

            new_params, opt = optim.step(st.params, grads, opt, lrs,
                                         eps=mcfg.eps)
            new_params = _col_major(new_params)
            opt = opt._replace(mu=_col_major(opt.mu), nu=_col_major(opt.nu))
            st = st._replace(params=new_params)
            log = jnp.stack([out.loss, out.im, out.depth, out.flat, out.iso,
                             out.mean_density, out.mask_frac])
            return (st, opt), log

        return body

    opt0 = optim.init(state.params, lazy=subsample and mcfg.lazy_adam)
    its = jnp.arange(mcfg.num_iters, dtype=jnp.int32)
    # per-slot visit counters: visits[i] = #{j < i : slots[j] == slots[i]}
    # (drives the per-slot tile-chunk cycling; [num_iters]^2 is tiny)
    eq = iter_slots[:, None] == iter_slots[None, :]
    visits = jnp.sum(jnp.tril(eq, k=-1), axis=1).astype(jnp.int32)
    (state, opt1), loss_log = jax.lax.scan(
        make_body(loss_fn), (state, opt0),
        (iter_slots[:n_sub], keys[:n_sub], its[:n_sub], visits[:n_sub]))
    if polish:
        # closing exact iterations: same optimizer state, same frozen
        # binnings, full-image loss (see MappingConfig.exact_polish_iters)
        (state, _), log_pol = jax.lax.scan(
            make_body(loss_fn_exact), (state, opt1),
            (iter_slots[n_sub:], keys[n_sub:], its[n_sub:],
             visits[n_sub:]))
        loss_log = jnp.concatenate([loss_log, log_pol])
    return state, loss_log, bin_stats


def estimated_pose(cam_rots, cam_trans, time_idx):
    """Normalized (quat, trans) at a frame index; cam_rots [4,T]."""
    q = cam_rots[:, time_idx]
    return q / jnp.linalg.norm(q), cam_trans[:, time_idx]
