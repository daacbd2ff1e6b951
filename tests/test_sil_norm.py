"""Silhouette-normalized tracking render (LossConfig.sil_norm_render).

The composited depth/RGB are unnormalized alpha sums (reference
splatam.py renders [z, 1, z^2] and never divides by the silhouette), so
where the rendered silhouette s < 1 the raw depth underestimates the
alpha-weighted mean depth by exactly the factor s. The IsoGS iso term
pulls opacities (hence s) down, which is the round-3 regularizer quality
cliff's suspected mechanism. These tests pin:

  1. the normalized loss is UNBIASED at the true pose on a
     depressed-opacity scene (raw loss is not),
  2. sil_norm_render nests reference behavior (no-op at s ~ 1),
  3. the slot path (tracking's production path) matches the per-gaussian
     path with the flag on, gradients included.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import (RasterConfig, bin_gaussians,
                                          gather_raw_table,
                                          project_gaussians,
                                          render_rgbd_sil)
from isogs_slam_tpu.slam.losses import (LossConfig, compute_loss,
                                        compute_loss_slots)
from isogs_slam_tpu.utils.transforms import transform_to_frame

pytestmark = pytest.mark.smoke

H, W = 48, 64


def _setup(logit_op=0.8, seed=0, n=400):
    rng = np.random.default_rng(seed)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    pts = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
                    rng.uniform(1.5, 2.5, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(
            rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]), jnp.float32),
        logit_opacities=jnp.full((n, 1), logit_op, jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.06), jnp.float32))
    alive = jnp.ones(n, bool)
    return cam, params, alive


def _lcfg(norm):
    return LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.0, w_depth=1.0, calc_iso=False,
                      sil_norm_render=norm)


def _render_at(cam, params, alive, quat, trans, rcfg):
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, False, False)
    return render_rgbd_sil(mc, qc, params.log_scales,
                           params.logit_opacities, params.rgb_colors,
                           alive, cam, rcfg)


def test_normalized_depth_loss_unbiased_under_depressed_opacity():
    """GT = the alpha-weighted mean depth of the true scene. The
    normalized loss at the true pose is ~0; the raw loss carries the
    (1 - s) bias on every admitted pixel."""
    cam, params, alive = _setup(logit_op=0.6)   # sigmoid = 0.65
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t0 = jnp.zeros(3)
    im, d, sil, _, _ = _render_at(cam, params, alive, q0, t0, rcfg)
    sil = np.asarray(sil)
    # the scene must actually exercise the depressed-silhouette regime
    assert 0.55 < np.median(sil[sil > 0.5]) < 0.98
    gt_depth = jnp.asarray(np.asarray(d) / np.maximum(sil, 1e-6)[None])
    gt_im = im  # unused (w_im = 0)

    raw_out = compute_loss(params, alive, q0, t0, gt_im, gt_depth,
                           cam, rcfg, _lcfg(False))
    norm_out = compute_loss(params, alive, q0, t0, gt_im, gt_depth,
                            cam, rcfg, _lcfg(True))
    # the normalized estimator matches GT bit-for-bit at the true pose;
    # the raw one pays |d - d/s| = d(1-s)/s summed over the mask
    assert float(norm_out.loss) < 1e-3 * float(raw_out.loss)
    assert float(raw_out.loss) > 1.0


def test_nests_reference_behavior_at_saturated_silhouette():
    cam, params, alive = _setup(logit_op=8.0)   # sigmoid ~ 1
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    rng = np.random.default_rng(1)
    q0 = jnp.asarray([1.0, 0.0, 0.01, 0.0])
    t0 = jnp.asarray([0.01, 0.0, 0.0])
    gt_im = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1.0, 3.0, (1, H, W)), jnp.float32)
    # the REFERENCE regime: sil_thres=0.99 admits only pixels whose raw
    # composite is within 1% of the normalized one (this is exactly why
    # the reference gets away with the unnormalized render)
    lcfg_raw = _lcfg(False)._replace(w_im=0.5, sil_thres=0.99)
    lcfg_norm = _lcfg(True)._replace(w_im=0.5, sil_thres=0.99)
    a = compute_loss(params, alive, q0, t0, gt_im, gt_d, cam, rcfg,
                     lcfg_raw)
    b = compute_loss(params, alive, q0, t0, gt_im, gt_d, cam, rcfg,
                     lcfg_norm)
    assert float(a.mask_frac) > 0.2   # the mask is actually populated
    np.testing.assert_allclose(float(b.loss), float(a.loss), rtol=2e-2)


def test_slot_path_matches_gaussian_path_with_norm():
    cam, params, alive = _setup(logit_op=0.6, seed=3)
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    rng = np.random.default_rng(2)
    gt_im = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1.0, 3.0, (1, H, W)), jnp.float32)
    lcfg = _lcfg(True)._replace(w_im=0.5)
    q0 = jnp.asarray([1.0, 0.0, 0.02, 0.0])
    t0 = jnp.asarray([0.01, 0.0, 0.0])

    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q0, t0, False, False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam,
                             margin_px=0.0)
    binning = bin_gaussians(proj, cam, rcfg)
    raw = gather_raw_table(params, binning.tile_gauss)
    p_sg = jax.tree.map(jax.lax.stop_gradient, params)

    def loss_gauss(pose):
        return compute_loss(p_sg, alive, pose[0], pose[1], gt_im, gt_d,
                            cam, rcfg, lcfg, binning=binning).loss

    def loss_slots(pose):
        return compute_loss_slots(raw, binning.tile_count, pose[0],
                                  pose[1], gt_im, gt_d, cam, rcfg,
                                  lcfg).loss

    pose = (q0, t0)
    lg, gg = jax.value_and_grad(loss_gauss)(pose)
    ls, gs = jax.value_and_grad(loss_slots)(pose)
    np.testing.assert_allclose(float(ls), float(lg), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(b, a, rtol=2e-4,
                                   atol=2e-4 * max(np.abs(a).max(), 1e-8))


def test_pipeline_default_and_raw_regime_pins():
    """Round-4 default-flip contract: the pipeline-level tracking loss
    defaults to the normalized render (NOTES round-4, 3-seed verdict),
    the LossConfig dataclass default stays False (library-level
    reference parity), and the raw-regime blame ablation configs pin
    False so their committed artifacts/r4s1 numbers stay reproducible."""
    import os
    from importlib.machinery import SourceFileLoader

    from isogs_slam_tpu.slam.pipeline import _loss_cfg_tracking

    assert LossConfig.__new__.__defaults__ is not None  # dataclass-style
    assert LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0).sil_norm_render is False

    base = dict(tracking=dict(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0)))
    assert _loss_cfg_tracking(base).sil_norm_render is True

    abl = os.path.join(os.path.dirname(__file__), "..", "isogs_slam_tpu",
                       "configs", "synthetic", "ablations")
    for name, want in [("full_res_noreg", False), ("full_res_flatonly", False),
                       ("full_res_isoonly", False),
                       ("full_res_noreg_sil05", False),
                       ("full_res_silnorm", True),
                       ("full_res_fastlegal", None)]:
        mod = SourceFileLoader(
            f"_abl_{name}", os.path.join(abl, f"{name}.py")).load_module()
        got = mod.config["tracking"].get("sil_norm_render")
        if want is None:   # inherits the pipeline default
            assert got is None or got is True
        else:
            assert got is want, name
        # and every ablation run resolves through the pipeline builder
        eff = _loss_cfg_tracking(mod.config).sil_norm_render
        assert eff is (want if want is not None else True), name


def test_adaptive_tile_cap_defaults_on():
    """Round-4 default flip #2 (NOTES r4s3 kcap verdict): the pipeline
    escalates the per-tile compositing cap by default — the reference
    composites every intersection, so a silent >0.5% true-drop was a
    render-semantics deviation. Drives the REAL _check_tile_cap on a
    stub (ADVICE r4: the old test asserted a local dict literal)."""
    import types

    from isogs_slam_tpu.ops.rasterize import RasterConfig
    from isogs_slam_tpu.slam.pipeline import (
        ADAPTIVE_MAX_PER_TILE_DEFAULT, SLAM)

    assert ADAPTIVE_MAX_PER_TILE_DEFAULT is True

    stub = types.SimpleNamespace(
        rcfg=RasterConfig(max_per_tile=512),
        config={"raster": {}},       # no key pinned -> shipped default
        stats={},
        _mv_phase=None,
        _note_isect_demand=lambda self, n: None,
    )
    stub._note_isect_demand = lambda n: None
    # 2% of true candidates dropped -> with the default ON the cap must
    # escalate 512 -> 768
    SLAM._check_tile_cap(stub, np.array([20, 1000, 500], np.int64))
    assert stub.rcfg.max_per_tile == 768
    assert stub.stats["tile_cap_dropped_frac"] == [0.02]
    # pinning the key False must disable escalation (warning path only)
    stub2 = types.SimpleNamespace(
        rcfg=RasterConfig(max_per_tile=512),
        config={"raster": {"adaptive_max_per_tile": False}},
        stats={}, _mv_phase=None, _note_isect_demand=lambda n: None)
    SLAM._check_tile_cap(stub2, np.array([20, 1000, 500], np.int64))
    assert stub2.rcfg.max_per_tile == 512
