"""Subsampled-stripe fast-mapping mode (mapping.tile_subsample).

Pins the stripe estimator against the exact path:
  * with sel = ALL tiles (the sub=1 stripe) the subset loss INCLUDING the
    SSIM term and its parameter gradients equal compute_loss (the stripe
    estimator is an exact partition of the same-padded full-image SSIM,
    unlike the retired per-tile valid-window estimator);
  * each stripe's SSIM contribution equals the full-image ssim_map
    averaged over that stripe's core positions (per-stripe exactness,
    halo rows included);
  * cycling covers every stripe each cycle and reshuffles across cycles;
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
from isogs_slam_tpu.slam.mapping import select_stripe, stripe_shape
from isogs_slam_tpu.utils.transforms import transform_to_frame


H, W = 96, 128   # multiples of TILE=16: every pixel valid, no boundary
FX = 90.0


def _cam(h=H, w=W):
    K = np.array([[FX, 0, w / 2], [0, FX, h / 2], [0, 0, 1]], np.float64)
    return Camera.from_intrinsics(K, w, h)


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
    return gt_tiles, valid


def _binning(cam, params, alive, rcfg, emit_exp=False):
    from isogs_slam_tpu.ops.rasterize import bin_gaussians, \
        project_gaussians
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q, t, False, False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam)
    return bin_gaussians(proj, cam, rcfg, emit_exp=emit_exp)


@pytest.mark.parametrize("bwd", ["scatter", "segreduce"])
def test_all_tiles_subset_matches_exact_loss_and_grads(bwd):
    """sub=1 stripe (= the whole image, all tiles core): the subset loss
    must equal compute_loss INCLUDING the SSIM term — the stripe
    estimator's central exactness claim."""
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode=bwd,
                        grad_scatter_bf16=False)
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    gt_tiles, valid = _subset_inputs(cam, gt_im, gt_depth)
    sel = jnp.arange(cam.num_tiles, dtype=jnp.int32)
    core = jnp.ones(cam.num_tiles, bool)
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    key = jax.random.PRNGKey(5)
    lcfg = _lcfg(w_im=0.5)   # SSIM included: estimators must now agree

    def exact(p):
        return compute_loss(p, alive, q, t, gt_im, gt_depth, cam, rcfg,
                            lcfg, key=key).loss

    binning = _binning(cam, params, alive, rcfg,
                       emit_exp=(bwd == "segreduce"))

    def subset_b(p):
        return compute_loss_subsampled(p, alive, q, t, gt_tiles, valid,
                                       core, sel, binning, cam, rcfg,
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
        if na == 0 and nb == 0:
            continue
        cos = float(a @ b / (na * nb))
        assert cos > 0.99999, cos
        assert abs(nb / na - 1.0) < 1e-3, (na, nb)


@pytest.mark.parametrize("h", [96, 88])  # 88: gy=6 tiles, bottom row padded
def test_stripe_ssim_matches_full_image_positions(h):
    """Each stripe's SSIM term equals the full-image same-padded ssim_map
    averaged over the stripe's core in-image positions — including
    image-boundary stripes where the halo is one-sided and the zero
    padding must match the full-image filter's."""
    from isogs_slam_tpu.ops.ssim import ssim_map
    cam = _cam(h=h)
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    gt_tiles_all, valid = _subset_inputs(cam, gt_im, gt_depth)
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    key = jax.random.PRNGKey(5)
    # SSIM-only configuration: kill L1/depth/flat/iso contributions
    lcfg = _lcfg(w_im=1.0)._replace(
        calc_iso=False, w_flat=0.0, w_iso=0.0, w_depth=0.0, use_l1=False)
    binning = _binning(cam, params, alive, rcfg)

    # the exact rendered image (the subset render matches it to
    # coordinate-rounding noise; test_all_tiles asserts that part)
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q, t, False, False)
    im_full, _, _, _, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg)
    m_full = np.asarray(ssim_map(im_full, gt_im))        # [3, H, W]

    sub = 3
    gy, gx = cam.tiles_y, cam.tiles_x
    rows_core, rows_w, n_stripes, _ = stripe_shape(gy, gx, sub)
    base = jax.random.PRNGKey(0)
    for visit in range(n_stripes):
        sel, core = select_stripe(base, jnp.asarray(visit), None, gy, gx,
                                  rows_core, rows_w, n_stripes)
        out = compute_loss_subsampled(
            params, alive, q, t, gt_tiles_all[sel], valid[sel], core, sel,
            binning, cam, rcfg, lcfg, key=key)
        # loss_im = 0.8 * 0 (use_l1 False kills depth only; l1 active)...
        # recover the ssim mean from the loss: loss = w_im*(0.8*l1 +
        # 0.2*(1-ssim)). Compute the expected value from m_full instead.
        core_rows = np.asarray(core).reshape(rows_w, gx)[:, 0]
        sel_rows = np.asarray(sel).reshape(rows_w, gx)[:, 0] // gx
        core_pix = []
        for r, is_core in zip(sel_rows, core_rows):
            if not is_core:
                continue
            y0, y1 = r * 16, min((r + 1) * 16, cam.height)
            if y0 < cam.height:
                core_pix.append(m_full[:, y0:y1, :])
        expect = np.concatenate([c.reshape(3, -1) for c in core_pix],
                                axis=1).mean()
        # invert: ssim_mean = 1 - (loss/w_im - 0.8*l1)/0.2; compute l1
        # from the same exact image restricted to core rows
        l1_pix = []
        ga = np.abs(np.asarray(gt_im) - np.asarray(im_full))
        for r, is_core in zip(sel_rows, core_rows):
            if not is_core:
                continue
            y0, y1 = r * 16, min((r + 1) * 16, cam.height)
            if y0 < cam.height:
                l1_pix.append(ga[:, y0:y1, :])
        l1 = np.concatenate([c.reshape(3, -1) for c in l1_pix],
                            axis=1).mean()
        got_ssim = 1.0 - (float(out.loss) / 1.0 - 0.8 * l1) / 0.2
        np.testing.assert_allclose(got_ssim, expect, atol=2e-4)


def test_stripes_average_to_exact():
    """One full cycle of stripes averages to the exact loss: SSIM is an
    exact partition; L1/depth are per-stripe ratio estimators."""
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    gt_im, gt_depth = _gt(cam, params, alive, rcfg)
    gt_tiles_all, valid = _subset_inputs(cam, gt_im, gt_depth)
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    key = jax.random.PRNGKey(5)
    lcfg = _lcfg(w_im=0.5)._replace(calc_iso=False, w_flat=0.0, w_iso=0.0)
    binning = _binning(cam, params, alive, rcfg)

    exact = float(compute_loss(params, alive, q, t, gt_im, gt_depth, cam,
                               rcfg, lcfg, key=key).loss)
    sub = 3
    gy, gx = cam.tiles_y, cam.tiles_x
    rows_core, rows_w, n_stripes, _ = stripe_shape(gy, gx, sub)
    vals = []
    for visit in range(n_stripes):
        sel, core = select_stripe(jax.random.PRNGKey(0),
                                  jnp.asarray(visit), None, gy, gx,
                                  rows_core, rows_w, n_stripes)
        vals.append(float(compute_loss_subsampled(
            params, alive, q, t, gt_tiles_all[sel], valid[sel], core, sel,
            binning, cam, rcfg, lcfg, key=key).loss))
    assert abs(np.mean(vals) - exact) < 0.05 * max(abs(exact), 1e-3), \
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
    ALL tiles selected each iteration. With the stripe estimator the
    per-iteration losses must now MATCH the exact path (only virtual-
    grid f32 coordinate rounding separates them) — this is the
    discriminator that exposed the old per-tile valid-window SSIM."""
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

    # iso off: the two paths derive different iso-sample PRNG keys, which
    # would add ~1% sampling noise and mask the estimator comparison; the
    # remaining terms (L1, depth, SSIM, flat) are all deterministic
    lcfg = _lcfg(w_im=0.5)._replace(calc_iso=False, w_iso=0.0)
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
    # the estimators are now the same function of the same pixels: the
    # only difference is f32 rounding from the virtual-grid u,v shift
    # (whose tiny gradient noise compounds over the Adam steps)
    np.testing.assert_allclose(lf[0], le[0], rtol=1e-4)
    np.testing.assert_allclose(lf, le, rtol=2e-3)


def test_map_frame_exact_polish():
    """mapping.exact_polish_iters: (a) with polish == num_iters the
    subsampled map_frame IS the exact path (every iteration runs the
    full-image loss with the same keys and binnings — losses must match
    to f32 noise); (b) a sub4 phase with a 2-iteration exact tail runs,
    stays finite, and ends with full-image losses (mask_frac column
    reports the whole image, not a stripe)."""
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

    lcfg = _lcfg(w_im=0.5)._replace(calc_iso=False, w_iso=0.0)
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
    # (a) all-polish == exact
    _, log_p, _ = map_frame(mk_state(), *args,
                            base._replace(tile_subsample=2,
                                          exact_polish_iters=8))
    _, log_e, _ = map_frame(mk_state(), *args, base)
    np.testing.assert_allclose(np.asarray(log_p[:, 0]),
                               np.asarray(log_e[:, 0]), rtol=1e-6)
    # (b) sub4 + 2-iteration exact tail
    _, log_t, _ = map_frame(mk_state(), *args,
                            base._replace(tile_subsample=4,
                                          exact_polish_iters=2))
    lt = np.asarray(log_t[:, 0])
    assert np.isfinite(lt).all()
    assert lt[-1] < lt[0]
    # the tail iterations report full-image losses: their im-loss scale
    # matches the exact run's tail, not the stripe runs'
    np.testing.assert_allclose(lt[-1], np.asarray(log_e[:, 0])[-1],
                               rtol=0.25)


@pytest.mark.smoke
def test_stripe_cycle_covers_all_rows_each_cycle():
    """Epoch-cycled stripe selection: within every cycle of n_stripes
    iterations the union of CORE rows is ALL tile rows, every stripe
    carries its halos, and the permutation reshuffles between cycles."""
    base = jax.random.PRNGKey(11)
    for gy, gx, sub in [(6, 8, 3), (43, 75, 4), (7, 3, 3), (5, 4, 8)]:
        rows_core, rows_w, n_stripes, t_sub = stripe_shape(gy, gx, sub)
        assert t_sub == rows_w * gx
        per_cycle = []
        for cycle in range(2):
            seen = set()
            order = []
            for j in range(n_stripes):
                visit = jnp.asarray(cycle * n_stripes + j, jnp.int32)
                sel, core = select_stripe(base, visit, None, gy, gx,
                                          rows_core, rows_w, n_stripes)
                sel, core = np.asarray(sel), np.asarray(core)
                assert sel.shape == (t_sub,)
                assert sel.min() >= 0 and sel.max() < gy * gx
                # contiguous ascending band of whole tile rows
                assert (np.diff(sel) == 1).all()
                assert sel[0] % gx == 0
                rows = sel.reshape(rows_w, gx)[:, 0] // gx
                core_rows = core.reshape(rows_w, gx)[:, 0]
                assert (core.reshape(rows_w, gx)
                        == core_rows[:, None]).all()
                cr = rows[core_rows]
                # halo row present on each side unless at the image edge
                # (the clamped window may carry extra slack rows beyond
                # the one-row halo; they only add window support)
                if cr[0] > 0:
                    assert cr[0] - 1 in rows
                if cr[-1] < gy - 1:
                    assert cr[-1] + 1 in rows
                seen |= set(cr.tolist())
                order.extend(cr.tolist())
            assert seen == set(range(gy)), (gy, sub)
            per_cycle.append(order)
        assert per_cycle[0] != per_cycle[1]   # reshuffled across cycles


@pytest.mark.experimental
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
