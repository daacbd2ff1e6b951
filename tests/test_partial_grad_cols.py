"""Column-masked backward scatter (ops/rasterize._gather_rows_partial_grad).

The render table gather's VJP normally scatter-adds all 12 columns; under
tracking only the pose-coupled columns (u, v, conic, z, z^2) have live
parameter chains, under mapping all but the constant ones-column. These
tests pin that masking dead columns changes NO gradient that anything
downstream can see.
"""
import numpy as np
import jax
import jax.numpy as jnp

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import (MAPPING_LIVE_COLS,
                                          TRACKING_LIVE_COLS, RasterConfig,
                                          render_rgbd_sil)
from isogs_slam_tpu.utils.transforms import transform_to_frame
import pytest

pytestmark = pytest.mark.smoke  # sub-5-min CI subset

H, W = 48, 64


def _setup(seed=0, n=256):
    rng = np.random.default_rng(seed)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    pts = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
                    rng.uniform(1.2, 3.0, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(
            rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(1.0, 0.5, (n, 1)),
                                    jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.05), jnp.float32))
    alive = jnp.ones(n, bool)
    gt_im = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1.0, 3.0, (1, H, W)), jnp.float32)
    return cam, params, alive, gt_im, gt_d


def _loss(im, depth, gt_im, gt_d):
    return jnp.abs(im - gt_im).mean() + jnp.abs(depth - gt_d).mean()


def test_tracking_pose_grads_unchanged():
    cam, params, alive, gt_im, gt_d = _setup()
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    p = jax.tree.map(jax.lax.stop_gradient, params)

    def loss_fn(pose, live):
        quat, trans = pose
        mc, qc = transform_to_frame(p.means3d, p.unnorm_rotations, quat,
                                    trans, gaussians_grad=False,
                                    camera_grad=True)
        im, depth, _, _, _ = render_rgbd_sil(
            mc, qc, p.log_scales, p.logit_opacities, p.rgb_colors, alive,
            cam, rcfg, live_grad_cols=live)
        return _loss(im, depth, gt_im, gt_d)

    pose = (jnp.asarray([1.0, 0.0, 0.02, 0.0]), jnp.asarray([0.01, 0., 0.]))
    g_full = jax.grad(lambda q: loss_fn(q, None))(pose)
    g_mask = jax.grad(lambda q: loss_fn(q, TRACKING_LIVE_COLS))(pose)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_mask)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_mapping_param_grads_unchanged():
    cam, params, alive, gt_im, gt_d = _setup(seed=1)
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    trans = jnp.zeros(3)

    def loss_fn(pp, live):
        mc, qc = transform_to_frame(pp.means3d, pp.unnorm_rotations, quat,
                                    trans, gaussians_grad=True,
                                    camera_grad=False)
        im, depth, _, _, _ = render_rgbd_sil(
            mc, qc, pp.log_scales, pp.logit_opacities, pp.rgb_colors,
            alive, cam, rcfg, live_grad_cols=live)
        return _loss(im, depth, gt_im, gt_d)

    g_full = jax.grad(lambda pp: loss_fn(pp, None))(params)
    g_mask = jax.grad(lambda pp: loss_fn(pp, MAPPING_LIVE_COLS))(params)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_mask)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bf16_scatter_grads_close():
    """grad_scatter_bf16=True (the default) rounds per-tile gradient
    contributions to bfloat16; the total gradient must stay within ~1%
    relative l2 of the f32-scatter gradient."""
    cam, params, alive, gt_im, gt_d = _setup(seed=2)
    quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    trans = jnp.zeros(3)

    def loss_fn(pp, rcfg):
        mc, qc = transform_to_frame(pp.means3d, pp.unnorm_rotations, quat,
                                    trans, gaussians_grad=True,
                                    camera_grad=False)
        im, depth, _, _, _ = render_rgbd_sil(
            mc, qc, pp.log_scales, pp.logit_opacities, pp.rgb_colors,
            alive, cam, rcfg, live_grad_cols=MAPPING_LIVE_COLS)
        return _loss(im, depth, gt_im, gt_d)

    g32 = jax.grad(lambda pp: loss_fn(
        pp, RasterConfig(backend="xla", grad_scatter_bf16=False)))(params)
    g16 = jax.grad(lambda pp: loss_fn(
        pp, RasterConfig(backend="xla", grad_scatter_bf16=True)))(params)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        # floor the denominator: identically-zero leaves (e.g. rotation
        # grads of isotropic Gaussians) are pure float noise
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert rel < 0.01, rel
