"""Subsampled-tile fast-mapping mode (mapping.tile_subsample).

Pins the estimator against the exact path:
  * with sel = ALL tiles and the SSIM term weighted out, the subset loss
    and its parameter gradients equal compute_loss exactly (same render,
    same masked means);
  * a uniformly-random subset's photometric terms average to the exact
    path's values (unbiasedness at the estimator level);
  * map_frame with tile_subsample > 1 runs and actually reduces loss.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import (RasterConfig, image_to_tiles,
                                          render_rgbd_sil,
                                          tile_pixel_validity)
from isogs_slam_tpu.slam.losses import (LossConfig, compute_loss,
                                        compute_loss_subsampled)
from isogs_slam_tpu.utils.transforms import transform_to_frame


H, W = 96, 128   # multiples of TILE=16: every pixel valid, no boundary
FX = 90.0


def _cam():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float64)
    return Camera.from_intrinsics(K, W, H)


def _scene(n=768, seed=3):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n),
                    rng.uniform(1.4, 3.6, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.tile(jnp.asarray([1., 0, 0, 0]), (n, 1)),
        logit_opacities=jnp.full((n, 1), 2.0),
        log_scales=jnp.full((n, 3), np.log(0.05), jnp.float32))
    return params, jnp.ones(n, bool)


def _gt(cam, params, alive, rcfg):
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q, t, False, False)
    im, depth, _, _, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg)
    # perturb so the loss is nonzero
    return jnp.clip(im + 0.05, 0, 1), depth + 0.02


def _lcfg(w_im):
    return LossConfig(tracking=False, use_sil_for_loss=False, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=w_im, w_depth=1.0, w_flat=50.0, w_iso=2.0,
                      iso_sample_size=256, iso_k=8, calc_iso=True,
                      knn_method="exact", iso_pool_size=0, knn_block=2048)


def _subset_inputs(cam, gt_im, gt_depth):
    gt_tiles = image_to_tiles(jnp.concatenate([gt_im, gt_depth], axis=0),
                              cam)
    valid = jnp.asarray(tile_pixel_validity(cam))
    interior = valid.all(axis=1).astype(jnp.float32)
    return gt_tiles, valid, interior


@pytest.mark.parametrize("bwd", ["scatter", "segreduce"])
def test_all_tiles_subset_matches_exact_loss_and_grads(bwd):
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode=bwd,
                        grad_scatter_bf16=False)
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    gt_tiles, valid, interior = _subset_inputs(cam, gt_im, gt_depth)
    sel = jnp.arange(cam.num_tiles, dtype=jnp.int32)
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    key = jax.random.PRNGKey(5)
    lcfg = _lcfg(w_im=0.0)  # SSIM estimator differs by design; weight out

    def exact(p):
        return compute_loss(p, alive, q, t, gt_im, gt_depth, cam, rcfg,
                            lcfg, key=key).loss

    from isogs_slam_tpu.ops.rasterize import bin_gaussians, \
        project_gaussians
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q, t, False, False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam)
    binning = bin_gaussians(proj, cam, rcfg, emit_exp=(bwd == "segreduce"))

    def subset_b(p):
        return compute_loss_subsampled(p, alive, q, t, gt_tiles, valid,
                                       interior, sel, binning, cam, rcfg,
                                       lcfg, key=key).loss

    le = float(exact(params))
    ls = float(subset_b(p=params))
    np.testing.assert_allclose(ls, le, rtol=2e-5)

    # the subset path shifts u,v into virtual-grid coordinates (an f32
    # add of up to T*16 px), so gradients agree to coordinate-rounding
    # noise, not bit-exactly: compare direction + magnitude per leaf
    ge = jax.grad(exact)(params)
    gs = jax.grad(subset_b)(params)
    for a, b in zip(jax.tree.leaves(ge), jax.tree.leaves(gs)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 and nb == 0:   # rgb_colors: w_im=0 severs its chain
            continue
        cos = float(a @ b / (na * nb))
        assert cos > 0.99999, cos
        assert abs(nb / na - 1.0) < 1e-3, (na, nb)


def test_random_subsets_average_to_exact():
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    gt_tiles_all, valid, interior = _subset_inputs(cam, gt_im, gt_depth)
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    key = jax.random.PRNGKey(5)
    lcfg = _lcfg(w_im=0.0)._replace(calc_iso=False, w_flat=0.0, w_iso=0.0)

    from isogs_slam_tpu.ops.rasterize import bin_gaussians, \
        project_gaussians
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q, t, False, False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam)
    binning = bin_gaussians(proj, cam, rcfg)

    exact = float(compute_loss(params, alive, q, t, gt_im, gt_depth, cam,
                               rcfg, lcfg, key=key).loss)
    T = cam.num_tiles
    t_sub = T // 4
    vals = []
    for i in range(24):
        sel = jax.random.permutation(jax.random.PRNGKey(i), T)[:t_sub]
        vals.append(float(compute_loss_subsampled(
            params, alive, q, t, gt_tiles_all[sel], valid[sel],
            interior[sel], sel, binning, cam, rcfg, lcfg, key=key).loss))
    # depth-masked-mean ratio estimator: mean over subsets ~ exact value
    assert abs(np.mean(vals) - exact) < 0.15 * max(abs(exact), 1e-3), \
        (np.mean(vals), exact)


def test_map_frame_with_subsample_reduces_loss():
    from isogs_slam_tpu.core import gaussians as G
    from isogs_slam_tpu.slam.mapping import (MappingConfig, PruneConfig,
                                             map_frame)
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    n = params.means3d.shape[0]
    cap = 1024
    pad = cap - n
    padp = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), params)
    state = G.MapState(
        params=padp, alive=jnp.concatenate([alive, jnp.zeros(pad, bool)]),
        hwm=jnp.asarray(n, jnp.int32),
        timestep=jnp.zeros(cap, jnp.float32),
        max_2d_radius=jnp.zeros(cap, jnp.float32),
        means2d_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
        scene_radius=jnp.asarray(4.0, jnp.float32))
    lcfg = _lcfg(w_im=0.5)
    mcfg = MappingConfig(
        num_iters=8, lr_means3d=0.0001, lr_rgb_colors=0.0025,
        lr_unnorm_rotations=0.001, lr_logit_opacities=0.05,
        lr_log_scales=0.001,
        prune=PruneConfig(False, 0, 0, 20, 20, 0.005, 0.005, False, 500),
        tile_subsample=4)
    rgb0 = np.asarray(padp.rgb_colors[:n])   # map_frame donates state
    kf_colors = (np.asarray(gt_im).transpose(1, 2, 0) * 255).astype(
        np.uint8)[None]
    kf_depths = np.asarray(gt_depth)[0][None]
    st, log, _ = map_frame(
        state, jnp.asarray(kf_colors), jnp.asarray(kf_depths),
        jnp.asarray([[1., 0, 0, 0]]), jnp.zeros((1, 3)),
        jnp.zeros(mcfg.num_iters, jnp.int32),
        jax.random.split(jax.random.PRNGKey(0), mcfg.num_iters),
        cam, rcfg, lcfg, mcfg)
    losses = np.asarray(log[:, 0])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params actually moved
    assert float(np.abs(np.asarray(st.params.rgb_colors[:n])
                        - rgb0).max()) > 0


def test_map_frame_force_subset_sub1_tracks_exact():
    """mapping.force_subset at tile_subsample=1: the subset machinery with
    ALL tiles selected each iteration. Must run, reduce loss, and land
    near the exact path's final loss (same render; only the SSIM
    estimator differs — per-tile valid windows vs same-padded image)."""
    from isogs_slam_tpu.core import gaussians as G
    from isogs_slam_tpu.slam.mapping import (MappingConfig, PruneConfig,
                                             map_frame)
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    n = params.means3d.shape[0]
    cap = 1024
    pad = cap - n
    padp = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), params)

    def mk_state():
        return G.MapState(
            params=jax.tree.map(jnp.array, padp),
            alive=jnp.concatenate([alive, jnp.zeros(pad, bool)]),
            hwm=jnp.asarray(n, jnp.int32),
            timestep=jnp.zeros(cap, jnp.float32),
            max_2d_radius=jnp.zeros(cap, jnp.float32),
            means2d_grad_accum=jnp.zeros(cap, jnp.float32),
            denom=jnp.zeros(cap, jnp.float32),
            scene_radius=jnp.asarray(4.0, jnp.float32))

    lcfg = _lcfg(w_im=0.5)
    base = MappingConfig(
        num_iters=8, lr_means3d=0.0001, lr_rgb_colors=0.0025,
        lr_unnorm_rotations=0.001, lr_logit_opacities=0.05,
        lr_log_scales=0.001,
        prune=PruneConfig(False, 0, 0, 20, 20, 0.005, 0.005, False, 500))
    kf_colors = (np.asarray(gt_im).transpose(1, 2, 0) * 255).astype(
        np.uint8)[None]
    kf_depths = np.asarray(gt_depth)[0][None]
    args = (jnp.asarray(kf_colors), jnp.asarray(kf_depths),
            jnp.asarray([[1., 0, 0, 0]]), jnp.zeros((1, 3)),
            jnp.zeros(base.num_iters, jnp.int32),
            jax.random.split(jax.random.PRNGKey(0), base.num_iters),
            cam, rcfg, lcfg)
    _, log_f, _ = map_frame(mk_state(), *args,
                            base._replace(force_subset=True))
    _, log_e, _ = map_frame(mk_state(), *args, base)
    lf, le = np.asarray(log_f[:, 0]), np.asarray(log_e[:, 0])
    assert np.isfinite(lf).all()
    assert lf[-1] < lf[0]
    # H,W are TILE multiples here so every window is valid: the two
    # estimators should agree closely on each iteration's loss
    np.testing.assert_allclose(lf, le, rtol=0.02)


@pytest.mark.smoke
def test_tile_cycle_covers_all_tiles_each_cycle():
    """Epoch-cycled selection (mapping.tile_cycle): within every cycle of
    `sub` iterations the union of selected chunks is ALL tiles, and the
    permutation reshuffles between cycles."""
    from isogs_slam_tpu.slam.mapping import select_tile_chunk
    key = jax.random.PRNGKey(11)
    for n_tiles, sub in [(48, 4), (50, 4), (7, 3)]:
        t_sub = -(-n_tiles // sub)
        per_cycle = []
        for cycle in range(2):
            seen = set()
            order = []
            for j in range(sub):
                it = jnp.asarray(cycle * sub + j, jnp.int32)
                sel = np.asarray(select_tile_chunk(key, it, sub, n_tiles,
                                                   t_sub))
                assert sel.shape == (t_sub,)
                assert sel.min() >= 0 and sel.max() < n_tiles
                seen |= set(sel.tolist())
                order.extend(sel.tolist())
            assert seen == set(range(n_tiles)), (n_tiles, sub)
            per_cycle.append(order)
        assert per_cycle[0] != per_cycle[1]   # reshuffled across cycles


@pytest.mark.smoke
def test_vmap_bins_matches_serial_map_frame():
    """mapping.vmap_bins batches the per-slot binnings; the phase result
    must be identical to the serial lax.map path."""
    from isogs_slam_tpu.core import gaussians as G
    from isogs_slam_tpu.slam.mapping import (MappingConfig, PruneConfig,
                                             map_frame)
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    n = params.means3d.shape[0]
    cap = 1024
    pad = cap - n
    padp = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), params)

    def mk_state():
        # fresh copies: map_frame donates the state buffers
        return G.MapState(
            params=jax.tree.map(jnp.array, padp),
            alive=jnp.concatenate([alive, jnp.zeros(pad, bool)]),
            hwm=jnp.asarray(n, jnp.int32),
            timestep=jnp.zeros(cap, jnp.float32),
            max_2d_radius=jnp.zeros(cap, jnp.float32),
            means2d_grad_accum=jnp.zeros(cap, jnp.float32),
            denom=jnp.zeros(cap, jnp.float32),
            scene_radius=jnp.asarray(4.0, jnp.float32))

    lcfg = _lcfg(w_im=0.5)
    base = MappingConfig(
        num_iters=4, lr_means3d=0.0001, lr_rgb_colors=0.0025,
        lr_unnorm_rotations=0.001, lr_logit_opacities=0.05,
        lr_log_scales=0.001,
        prune=PruneConfig(False, 0, 0, 20, 20, 0.005, 0.005, False, 500))
    kf_colors = jnp.stack([
        (np.asarray(gt_im).transpose(1, 2, 0) * 255).astype(np.uint8),
        (np.asarray(jnp.clip(gt_im + 0.1, 0, 1)).transpose(1, 2, 0)
         * 255).astype(np.uint8)])
    kf_depths = jnp.stack([np.asarray(gt_depth)[0]] * 2)
    kf_quats = jnp.asarray([[1., 0, 0, 0], [1., 0, 0, 0]])
    kf_trans = jnp.zeros((2, 3))
    iter_slots = jnp.asarray([0, 1, 0, 1], jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)

    outs = []
    for vb in (False, True):
        st, log, bstats = map_frame(
            mk_state(), kf_colors, kf_depths, kf_quats, kf_trans,
            iter_slots, keys, cam, rcfg, lcfg, base._replace(vmap_bins=vb))
        outs.append((np.asarray(log), np.asarray(st.params.means3d),
                     np.asarray(bstats)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
