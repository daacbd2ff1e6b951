"""Degree-3 spherical-harmonics color evaluation (ops/sh.py) — the TPU
equivalent of the C++ renderer's SH path (renderer.cpp:130-145)."""
import numpy as np
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.ops.sh import (C0, C1, eval_sh, rgb_to_sh0,
                                   sh_colors_for_pose)

pytestmark = pytest.mark.smoke


def test_sh0_roundtrips_rgb_at_any_direction_and_degree():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)
    sh = rgb_to_sh0(rgb)
    dirs = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    for deg in range(4):
        np.testing.assert_allclose(np.asarray(eval_sh(sh, dirs, deg)),
                                   np.asarray(rgb), atol=1e-6)


def test_band1_directionality_matches_basis():
    """Only the y-band coefficient set: eval at +y/-y differs by the
    analytic basis value -C1*y, shifted by the C0 DC + 0.5."""
    n = 4
    sh = np.zeros((n, 48), np.float32)
    sh[:, 0:3] = 0.9 / C0            # DC -> 0.9 before the +0.5 shift
    sh[:, 3:6] = 0.2                 # coeff 1 (the -C1*y basis), all ch.
    sh = jnp.asarray(sh)
    up = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (n, 1))
    dn = -up
    got_up = np.asarray(eval_sh(sh, up, 3))
    got_dn = np.asarray(eval_sh(sh, dn, 3))
    expect_up = 0.9 + 0.5 - C1 * 0.2
    expect_dn = 0.9 + 0.5 + C1 * 0.2
    np.testing.assert_allclose(got_up, expect_up, atol=1e-6)
    np.testing.assert_allclose(got_dn, expect_dn, atol=1e-6)


def test_direction_scale_invariance_and_clamp():
    rng = np.random.default_rng(1)
    sh = jnp.asarray(rng.normal(0, 0.3, (32, 48)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    a = np.asarray(eval_sh(sh, dirs, 3))
    b = np.asarray(eval_sh(sh, dirs * 7.3, 3))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert (a >= 0).all()            # non-negative clamp


def test_sh_colors_for_pose_uses_world_direction():
    """Gaussians straight above vs below the camera center see opposite
    y-band contributions."""
    sh = np.zeros((2, 48), np.float32)
    sh[:, 0:3] = 0.5 / C0
    sh[:, 3:6] = 0.3
    means = jnp.asarray([[0.0, 2.0, 0.0], [0.0, -2.0, 0.0]], jnp.float32)
    center = jnp.zeros(3)
    c = np.asarray(sh_colors_for_pose(jnp.asarray(sh), means, center))
    assert c[0, 0] < c[1, 0]         # -C1*y flips sign with direction


def test_viz_render_w2c_sh_substitution(tmp_path):
    """render_w2c with sh_flat substitutes view-dependent colors: a
    checkpoint whose SH carries higher bands renders different images
    from opposite sides of the scene at the same geometry."""
    from tests.test_viz import _toy_checkpoint
    from isogs_slam_tpu.ops.rasterize import RasterConfig
    from isogs_slam_tpu.viz_scripts.common import (load_scene,
                                                   make_render_fn,
                                                   render_w2c)
    run_dir = str(tmp_path / "run")
    _toy_checkpoint(run_dir)
    # graft higher-band SH onto the checkpoint
    import glob
    import numpy as _np
    path = sorted(glob.glob(run_dir + "/params*.npz"))[-1]
    data = dict(_np.load(path))
    n = data["means3D"].shape[0]
    rng = _np.random.default_rng(2)
    sh = _np.zeros((n, 48), _np.float32)
    sh[:, 0:3] = (data["rgb_colors"] - 0.5) / C0
    sh[:, 3:12] = rng.normal(0, 0.25, (n, 9))
    data["sh_coeffs_flat"] = sh
    _np.savez(path, **data)

    state, cam, est, gt, _, sh_flat = load_scene(run_dir, return_sh=True)
    assert sh_flat is not None and sh_flat.shape[1] == 48
    fn = make_render_fn(cam, RasterConfig(max_per_tile=64, tile_chunk=16))
    im_a, _, _ = render_w2c(fn, state, est[0], sh_flat=sh_flat)
    im_plain, _, _ = render_w2c(fn, state, est[0])
    assert np.isfinite(np.asarray(im_a)).all()
    assert float(np.abs(np.asarray(im_a) - np.asarray(im_plain)).max()) \
        > 1e-3  # higher bands actually change the render
