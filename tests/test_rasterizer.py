"""Golden-image + gradient tests for the TPU rasterizer vs the numpy oracle.

Mirrors the role of cpp/tests/grad_check.cpp in the reference tree: an
independent implementation of the same math plus finite differences.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.ops.rasterize import RasterConfig, render, render_rgbd_sil
from isogs_slam_tpu.ops.reference_renderer import render_reference


import functools


@functools.lru_cache(maxsize=None)
def jit_render(cam, cfg):
    """Eager per-op dispatch and XLA compiles are slow in this environment;
    always jit and cache the compiled callable per (camera, config)."""
    return jax.jit(lambda m, q, s, o, f, a: render(m, q, s, o, f, a, cam, cfg))


def assert_images_close(actual, desired, atol=3e-4, knife_atol=6e-3,
                        knife_frac=0.02):
    """Allow a small fraction of pixels to differ by up to ~1/255: those are
    alpha-cutoff knife edges where f32 rounding flips a skip test."""
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    diff = np.abs(actual - desired)
    assert diff.max() < knife_atol, f"max diff {diff.max()}"
    frac = (diff > atol).mean()
    assert frac <= knife_frac, f"{frac:.4f} of pixels differ by > {atol}"


def make_scene(n=60, seed=0, width=64, height=48, spread=1.0):
    rng = np.random.default_rng(seed)
    cam = Camera(width=width, height=height, fx=60.0, fy=60.0,
                 cx=width / 2.0, cy=height / 2.0)
    means = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread * 0.7, spread * 0.7, n),
        rng.uniform(1.0, 4.0, n),
    ], axis=-1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.02, 0.15, (n, 3))).astype(np.float32)
    logit_op = rng.normal(size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return cam, means, quats, log_scales, logit_op, colors


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_matches_oracle_f64(seed):
    """Algorithmic equivalence: in float64 the vectorized cumprod compositing
    must match the sequential per-pixel oracle to near machine precision."""
    cam, means, quats, log_scales, logit_op, colors = make_scene(seed=seed)
    n = means.shape[0]
    cfg = RasterConfig(max_per_tile=n, tile_chunk=4)

    with jax.enable_x64(True):
        alive = jnp.ones(n, bool)
        out = jit_render(cam, cfg)(
            jnp.asarray(means, jnp.float64),
            jnp.asarray(quats, jnp.float64),
            jnp.asarray(log_scales, jnp.float64),
            jnp.asarray(logit_op, jnp.float64),
            jnp.asarray(colors, jnp.float64), alive)
        img = np.asarray(out["image"])
        final_t = np.asarray(out["final_T"])
        radii = np.asarray(out["radii"])
    ref_img, ref_radii, ref_t = render_reference(
        means, quats, log_scales, logit_op, colors,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)

    np.testing.assert_allclose(img, ref_img, atol=1e-10)
    np.testing.assert_allclose(final_t, ref_t, atol=1e-10)
    np.testing.assert_array_equal(radii, ref_radii)


def test_forward_f32_smoke():
    """f32 production dtype stays close to the f64 oracle (loose: independent
    f32 op orders resolve alpha-cutoff knife edges differently)."""
    cam, means, quats, log_scales, logit_op, colors = make_scene(seed=0)
    n = means.shape[0]
    alive = jnp.ones(n, bool)
    cfg = RasterConfig(max_per_tile=n, tile_chunk=4)
    out = jit_render(cam, cfg)(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(log_scales),
        jnp.asarray(logit_op), jnp.asarray(colors), alive)
    ref_img, _, _ = render_reference(
        means, quats, log_scales, logit_op, colors,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)
    assert_images_close(out["image"], ref_img, atol=2e-3, knife_atol=2e-2,
                        knife_frac=0.05)


def test_forward_with_dead_padding():
    """Capacity padding (alive=False rows) must not affect the image."""
    cam, means, quats, log_scales, logit_op, colors = make_scene(seed=3)
    n = means.shape[0]
    cap = n + 37
    pad = lambda a: np.concatenate(
        [a, np.zeros((cap - n,) + a.shape[1:], a.dtype)])
    alive = jnp.arange(cap) < n
    cfg = RasterConfig(max_per_tile=n + 8, tile_chunk=4)

    out = jit_render(cam, cfg)(
        jnp.asarray(pad(means)), jnp.asarray(pad(quats)),
        jnp.asarray(pad(log_scales)), jnp.asarray(pad(logit_op)),
        jnp.asarray(pad(colors)), alive)
    ref_img, _, _ = render_reference(
        means, quats, log_scales, logit_op, colors,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)
    assert_images_close(out["image"], ref_img, atol=2e-3, knife_atol=2e-2,
                        knife_frac=0.05)


def test_fused_rgbd_sil_channels():
    """The fused 6-channel render must equal separate renders of rgb and
    [z, 1, z^2] (the reference's two rasterizer calls, splatam.py:529-537):
    compositing weights are identical, so channels must match exactly."""
    cam, means, quats, log_scales, logit_op, colors = make_scene(seed=4, n=40)
    n = means.shape[0]
    alive = jnp.ones(n, bool)
    cfg = RasterConfig(max_per_tile=n, tile_chunk=4)

    margs = (jnp.asarray(means), jnp.asarray(quats), jnp.asarray(log_scales),
             jnp.asarray(logit_op))

    im, depth, sil, depth_sq, aux = jax.jit(
        lambda m, q, s, o, c, a: render_rgbd_sil(m, q, s, o, c, a, cam, cfg))(
        *margs, jnp.asarray(colors), alive)

    rgb_sep = jit_render(cam, cfg)(*margs, jnp.asarray(colors), alive)
    z = jnp.asarray(means[:, 2:3])
    ds_feats = jnp.concatenate([z, jnp.ones_like(z), z * z], axis=-1)
    ds_sep = jit_render(cam, cfg)(*margs, ds_feats, alive)

    np.testing.assert_allclose(np.asarray(im),
                               np.asarray(rgb_sep["image"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth[0]),
                               np.asarray(ds_sep["image"][0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil),
                               np.asarray(ds_sep["image"][1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth_sq[0]),
                               np.asarray(ds_sep["image"][2]), atol=1e-4)


def _fd_check(loss, args, probes_per_arg, eps, rel_tol, abs_tol,
              max_boundary_hits):
    """Central finite differences vs jax.grad in float64.

    The rasterizer (like the CUDA original) is discontinuous at tile-rect
    and alpha-cutoff boundaries; an FD probe that straddles one is not a
    gradient error. With f64 + tiny eps such hits are rare, so we allow at
    most `max_boundary_hits` outliers (grad_check.cpp uses max/rel
    thresholds the same way).
    """
    grads = jax.jit(jax.grad(loss, argnums=tuple(range(len(args)))))(*args)
    rng = np.random.default_rng(0)
    bad = []
    for ai in range(len(args)):
        a = np.asarray(args[ai])
        flat = a.reshape(-1)
        idxs = rng.choice(flat.size, size=min(probes_per_arg, flat.size),
                          replace=False)
        for idx in idxs:
            ap = flat.copy(); ap[idx] += eps
            am = flat.copy(); am[idx] -= eps
            args_p = list(args); args_p[ai] = jnp.asarray(ap.reshape(a.shape))
            args_m = list(args); args_m[ai] = jnp.asarray(am.reshape(a.shape))
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            an = float(np.asarray(grads[ai]).reshape(-1)[idx])
            if abs(fd - an) > max(rel_tol * max(abs(fd), abs(an)), abs_tol):
                bad.append((ai, int(idx), fd, an))
    assert len(bad) <= max_boundary_hits, bad


def test_gradients_finite_difference():
    """jax.grad through the full render vs float64 central differences,
    following the pass criteria of cpp/tests/grad_check.cpp:54-89."""
    cam, means, quats, log_scales, logit_op, colors = make_scene(
        seed=5, n=12, width=32, height=32)
    n = means.shape[0]
    cfg = RasterConfig(max_per_tile=n, tile_chunk=2)

    with jax.enable_x64(True):
        alive = jnp.ones(n, bool)
        target = jnp.zeros((3, cam.height, cam.width), jnp.float64)

        @jax.jit
        def loss(means, quats, log_scales, logit_op, colors):
            out = render(means, quats, log_scales, logit_op, colors, alive,
                         cam, cfg)
            return jnp.sum((out["image"] - target) ** 2)

        args = [jnp.asarray(a, jnp.float64)
                for a in (means, quats, log_scales, logit_op, colors)]
        _fd_check(loss, args, probes_per_arg=6, eps=1e-6, rel_tol=1e-3,
                  abs_tol=1e-6, max_boundary_hits=2)


def test_pose_gradient_through_transform():
    """Gradient wrt camera pose (tracking path) matches float64 finite
    differences."""
    from isogs_slam_tpu.utils.transforms import transform_to_frame

    cam, means, quats, log_scales, logit_op, colors = make_scene(
        seed=6, n=20, width=32, height=32)
    n = means.shape[0]
    cfg = RasterConfig(max_per_tile=n, tile_chunk=2)

    with jax.enable_x64(True):
        alive = jnp.ones(n, bool)
        gt = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (3, cam.height, cam.width)))
        margs = [jnp.asarray(a, jnp.float64)
                 for a in (means, quats, log_scales, logit_op, colors)]

        @jax.jit
        def loss(cam_quat, cam_trans):
            mc, qc = transform_to_frame(margs[0], margs[1], cam_quat,
                                        cam_trans, gaussians_grad=False,
                                        camera_grad=True)
            out = render(mc, qc, margs[2], margs[3], margs[4], alive, cam,
                         cfg)
            return jnp.abs(out["image"] - gt).sum()

        q0 = jnp.asarray([1.0, 0.01, -0.02, 0.005], jnp.float64)
        t0 = jnp.asarray([0.01, -0.01, 0.02], jnp.float64)
        _fd_check(lambda q, t: loss(q, t), [q0, t0], probes_per_arg=4,
                  eps=1e-7, rel_tol=1e-3, abs_tol=1e-5, max_boundary_hits=1)


def test_true_overflow_counter():
    """Binning.n_true_overflow counts margin-free intersections dropped by
    the per-tile cap: zero when K is ample, positive when K strangles a
    dense tile, and margin-only candidates never count."""
    import jax.numpy as jnp
    from isogs_slam_tpu.core.camera import Camera
    from isogs_slam_tpu.ops.rasterize import (RasterConfig, bin_gaussians,
                                              project_gaussians)
    rng = np.random.default_rng(0)
    n = 64
    cam = Camera(width=32, height=32, fx=32.0, fy=32.0, cx=15.5, cy=15.5)
    # all Gaussians piled on the central tile
    pts = np.concatenate([rng.normal(0, 0.02, (n, 2)),
                          rng.uniform(1.9, 2.1, (n, 1))], axis=1)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    ls = np.full((n, 3), np.log(0.01), np.float32)
    alive = jnp.ones(n, bool)
    proj = project_gaussians(jnp.asarray(pts, jnp.float32),
                             jnp.asarray(quats), jnp.asarray(ls), alive,
                             cam, margin_px=0.0)
    b_small = bin_gaussians(proj, cam, RasterConfig(max_per_tile=16))
    b_large = bin_gaussians(proj, cam, RasterConfig(max_per_tile=256))
    assert int(b_small.n_true_overflow) > 0
    assert int(b_large.n_true_overflow) == 0
    # margin-only candidates are excluded from the true counter
    proj_m = project_gaussians(jnp.asarray(pts, jnp.float32),
                               jnp.asarray(quats), jnp.asarray(ls), alive,
                               cam, margin_px=64.0)
    b_margin = bin_gaussians(proj_m, cam, RasterConfig(max_per_tile=256))
    assert int(b_margin.n_true_overflow) == 0
