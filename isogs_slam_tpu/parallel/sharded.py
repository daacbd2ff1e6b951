"""Multi-chip parallel mapping over a `jax.sharding.Mesh`.

The reference is strictly single-process / single-GPU (SURVEY.md §2.3: no
torch.distributed, no NCCL/MPI anywhere in either tree); its only
parallelism is intra-kernel CUDA thread blocks. On TPU the natural scaling
axis for this workload is **data parallelism over keyframe views**: each
mapping iteration in the reference samples ONE random keyframe and takes one
Adam step (scripts/splatam.py:1412-1491). Here a *batch* of keyframe views is
rendered and differentiated concurrently — one view per mesh slot — and the
mean multi-view loss produces a single Adam step. XLA/GSPMD partitions every
per-view tensor (renders, masks, losses, iso-loss queries) over the `view`
axis and inserts the gradient `psum` over ICI automatically; the Gaussian map
state is replicated (it is the "model", and it must be fully visible to every
view's rasterization — the analog of the 20M-Gaussian pool in
cpp/src/core/gaussian_model.cpp:25-45).

This is also a semantically *better* mapping step at equal FLOPs: an Adam
step on the mean loss over B views is lower-variance than B sequential
one-view steps, so multi-chip runs can cut wall-clock per frame by ~B while
improving gradient quality.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import optim
from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..ops.rasterize import RasterConfig
from ..slam.losses import LossConfig, compute_loss
from ..slam.mapping import MappingConfig

VIEW_AXIS = "view"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the view (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def batched_map_loss(params: GaussianParams, alive, kf_quats, kf_transl,
                     gt_ims, gt_depths, keys, cam: Camera,
                     rcfg: RasterConfig, lcfg: LossConfig):
    """Mean mapping loss over a batch of views (leading axis = view)."""

    def one(quat, trans, im, depth, key):
        out = compute_loss(params, alive, jax.lax.stop_gradient(quat),
                           jax.lax.stop_gradient(trans), im, depth,
                           cam, rcfg, lcfg, key=key)
        return out.loss

    losses = jax.vmap(one)(kf_quats, kf_transl, gt_ims, gt_depths, keys)
    return jnp.mean(losses)


def make_sharded_map_step(mesh: Mesh, cam: Camera, rcfg: RasterConfig,
                          lcfg: LossConfig, mcfg: MappingConfig):
    """Build the jitted multi-chip mapping train step.

    Returns step(params, alive, opt, kf_quats [B,4], kf_transl [B,3],
    gt_ims [B,3,H,W], gt_depths [B,1,H,W], keys [B,2])
    -> (new_params, new_opt, loss), with B sharded over the mesh's view axis
    and the Gaussian state replicated. GSPMD inserts the ICI psum for the
    replicated-parameter gradients.
    """
    repl = NamedSharding(mesh, P())
    view = NamedSharding(mesh, P(VIEW_AXIS))
    lrs = mcfg.lrs()

    def step(params, alive, opt, kf_quats, kf_transl, gt_ims, gt_depths,
             keys):
        loss, grads = jax.value_and_grad(batched_map_loss)(
            params, alive, kf_quats, kf_transl, gt_ims, gt_depths, keys,
            cam, rcfg, lcfg)
        new_params, new_opt = optim.step(params, grads, opt, lrs,
                                         eps=mcfg.eps)
        return new_params, new_opt, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, view, view, view, view, view),
        out_shardings=(repl, repl, repl))


def shard_view_batch(mesh: Mesh, *arrays):
    """Place per-view batched arrays (leading axis B) onto the mesh."""
    view = NamedSharding(mesh, P(VIEW_AXIS))
    return tuple(jax.device_put(a, view) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (the Gaussian map state) across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, repl), tree)


# ---------------------------------------------------------------------------
# Full multi-chip mapping PHASE: the pipeline-integrated version of the
# train step above. One phase = lax.scan over steps; each step renders B
# keyframe views concurrently (B = mesh size, views sharded over ICI),
# takes ONE Adam step on the mean loss, and applies the same per-phase
# machinery as slam.mapping.map_frame: frozen per-slot tile binning (the
# binning batch axis is itself sharded), frozen iso hash grid + KNN pool,
# prune schedule, opacity reset, seen/max-radius bookkeeping. The prune /
# reset schedules are indexed by cumulative VIEW count (step*B) so a
# multi-chip run follows the same schedule as the serial reference
# interpretation of mapping.num_iters.

def make_multiview_map_phase(mesh: Mesh, cam: Camera, rcfg: RasterConfig,
                             lcfg: LossConfig, mcfg: MappingConfig):
    """Returns phase(state, kf_colors_u8 [S,H,W,3], kf_depths [S,H,W],
    kf_quats [S,4], kf_transl [S,3], step_slots [n_steps, B],
    keys [n_steps, B]) -> (new state, loss_log [n_steps, N_LOG])."""
    from ..slam.mapping import N_LOG, _prune_mask
    from ..ops.rasterize import bin_gaussians, project_gaussians
    from ..utils.transforms import transform_to_frame

    assert not lcfg.tracking
    assert not mcfg.use_densification, \
        "clone/split densification is not supported in multiview mapping"
    repl = NamedSharding(mesh, P())
    view = NamedSharding(mesh, P(VIEW_AXIS))
    lrs = mcfg.lrs()
    pc = mcfg.prune
    B = int(np.prod(mesh.devices.shape))

    def shard_views(tree):
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, view), tree)

    def phase(state, kf_colors_u8, kf_depths, kf_quats, kf_transl,
              step_slots, keys):
        p0 = jax.tree.map(jax.lax.stop_gradient, state.params)
        alive0 = state.alive

        # per-slot frozen tile lists; the slot axis is sharded so each
        # device bins its share of the window
        def bin_slot(quat, trans):
            mc, qc = transform_to_frame(p0.means3d, p0.unnorm_rotations,
                                        quat, trans, gaussians_grad=False,
                                        camera_grad=False)
            proj = project_gaussians(mc, qc, p0.log_scales, alive0, cam,
                                     margin_px=mcfg.bin_margin_px)
            # same cull budgets as the serial mapping bins (mapping.py)
            return bin_gaussians(
                proj, cam, rcfg,
                opacity=jax.nn.sigmoid(p0.logit_opacities[:, 0]),
                cull_slack_px=mcfg.bin_margin_px,
                cull_logit_drift=3.2 * mcfg.lr_logit_opacities
                * mcfg.num_iters)

        bins = shard_views(jax.vmap(bin_slot)(kf_quats, kf_transl))
        bin_stats = jnp.stack([jnp.sum(bins.n_true_overflow),
                               jnp.sum(bins.n_isect),
                               jnp.max(bins.n_isect)])

        iso_grid = None
        iso_pool = None
        if lcfg.calc_iso and lcfg.knn_method == "hash":
            from ..ops.spatial_hash import build_hash_grid, default_cell_size
            cell = default_cell_size(p0.log_scales, alive0)
            iso_grid = build_hash_grid(p0.means3d, alive0, cell,
                                       lcfg.hash_table_size)
        if lcfg.calc_iso and lcfg.iso_pool_size > 0:
            from ..ops.iso_loss import build_iso_knn_pool
            pool_key = jax.random.fold_in(keys[0, 0], 0x150)
            iso_pool = build_iso_knn_pool(
                p0.means3d, p0.log_scales, alive0, pool_key,
                pool_size=lcfg.iso_pool_size, k=lcfg.iso_k,
                knn_method=lcfg.knn_method, hash_cap=lcfg.hash_cap,
                hash_table_size=lcfg.hash_table_size,
                knn_block=lcfg.knn_block, grid=iso_grid)

        # the IsoGS regularizers do not depend on the view: evaluate them
        # ONCE per Adam step instead of once per view (same estimand as
        # the per-view mean — iso is a stochastic sample either way)
        lcfg_view = lcfg._replace(calc_iso=False, w_flat=0.0, w_iso=0.0)

        def batch_loss(params, alive, quats, transl, gt_ims, gt_depths,
                       bkeys, binnings):
            def one(quat, trans, gt_im, gt_depth, key, binning):
                out = compute_loss(params, alive, quat, trans, gt_im,
                                   gt_depth, cam, rcfg, lcfg_view, key=key,
                                   binning=binning)
                return out.loss, out
            losses, outs = jax.vmap(one)(quats, transl, gt_ims, gt_depths,
                                         bkeys, binnings)
            total = jnp.mean(losses)
            from ..ops.iso_loss import flat_loss, iso_surface_loss
            wflat = jnp.zeros(())
            wiso = jnp.zeros(())
            mean_density = jnp.zeros(())
            if lcfg.w_flat != 0.0:
                wflat = lcfg.w_flat * flat_loss(params.log_scales, alive)
            if lcfg.calc_iso and lcfg.w_iso != 0.0:
                iso, mean_density = iso_surface_loss(
                    params.means3d, params.unnorm_rotations,
                    params.log_scales, params.logit_opacities, alive,
                    bkeys[0], sample_size=lcfg.iso_sample_size,
                    k=lcfg.iso_k, target_saturation=lcfg.iso_target,
                    knn_block=lcfg.knn_block, knn_method=lcfg.knn_method,
                    hash_cap=lcfg.hash_cap,
                    hash_table_size=lcfg.hash_table_size, grid=iso_grid,
                    pool=iso_pool)
                wiso = lcfg.w_iso * iso
            total = total + wflat + wiso
            outs = outs._replace(
                flat=jnp.broadcast_to(wflat, outs.flat.shape),
                iso=jnp.broadcast_to(wiso, outs.iso.shape),
                mean_density=jnp.broadcast_to(mean_density,
                                              outs.mean_density.shape))
            return total, outs

        grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

        def body(carry, xs):
            st, opt = carry
            slots, kkeys, it = xs                      # [B], [B,2], []
            gt_im = shard_views(
                (kf_colors_u8[slots].astype(jnp.float32) / 255.0
                 ).transpose(0, 3, 1, 2))
            gt_depth = shard_views(kf_depths[slots][:, None])
            quats = jax.lax.stop_gradient(kf_quats[slots])
            transl = jax.lax.stop_gradient(kf_transl[slots])
            binnings = shard_views(jax.tree.map(lambda a: a[slots], bins))

            (loss, outs), grads = grad_fn(st.params, st.alive, quats,
                                          transl, gt_im, gt_depth, kkeys,
                                          binnings)

            # seen/max_2D_radius over the whole view batch
            radii = jnp.max(outs.radii, axis=0)
            seen = radii > 0
            max_r = jnp.where(
                seen, jnp.maximum(radii.astype(st.max_2d_radius.dtype),
                                  st.max_2d_radius), st.max_2d_radius)
            st = st._replace(max_2d_radius=max_r)

            # prune / opacity reset on cumulative view count
            view_it = it * B
            remove = _prune_mask(st.params, st.alive, st.scene_radius,
                                 view_it, pc)
            st = st._replace(alive=st.alive & ~remove)
            if pc.reset_opacities:
                do_reset = ((view_it > 0)
                            & (view_it % max(pc.reset_opacities_every, 1)
                               < B))
                reset_val = jnp.log(jnp.asarray(0.01 / 0.99, jnp.float32))
                new_op = jnp.where(
                    do_reset,
                    jnp.full_like(st.params.logit_opacities, reset_val),
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
            st = st._replace(params=new_params)
            mean = lambda a: jnp.mean(a)
            log = jnp.stack([loss, mean(outs.im), mean(outs.depth),
                             mean(outs.flat), mean(outs.iso),
                             mean(outs.mean_density),
                             mean(outs.mask_frac)])
            return (st, opt), log

        opt0 = optim.init(state.params)
        n_steps = step_slots.shape[0]
        its = jnp.arange(n_steps, dtype=jnp.int32)
        (state, _), loss_log = jax.lax.scan(
            body, (state, opt0), (step_slots, keys, its))
        return state, loss_log, bin_stats

    return jax.jit(phase, donate_argnums=(0,))
