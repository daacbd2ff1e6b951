"""Opacity-aware exact-ellipse binning rects (RasterConfig.tight_rect).

The CUDA-parity rect expansion is the square AABB of the 3-sigma
MAJOR-axis radius — opacity-blind and hugely over-covering for the
anisotropic flakes the IsoGS flat loss drives toward. tight_rect bins
with the per-axis AABB of the contribution ellipse q <= qmax,
qmax = 2*ln(op/ALPHA_MIN), intersected with the radius rect. Any pixel
with alpha >= ALPHA_MIN lies inside that AABB, so with zero drift
budgets the render output and every parameter gradient are IDENTICAL —
it only removes provably-zero intersections (before the expansion sort,
unlike cull_tile_slots which prunes after).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.ops.rasterize import (RasterConfig, bin_gaussians,
                                          project_gaussians, render_rgbd_sil)

# adjudicated-loser knob surface (slam/experimental.py): out of
# the default suite, runnable with `pytest -m experimental` for
# re-adjudication with new evidence (VERDICT r4 item 8)
pytestmark = pytest.mark.experimental


def _scene(n=500, seed=11, aniso=True, dim_ops=False):
    rng = np.random.default_rng(seed)
    cam = Camera(width=96, height=64, fx=70.0, fy=70.0, cx=48.0, cy=32.0)
    means = jnp.asarray(rng.normal(size=(n, 3)) * np.array([0.9, 0.6, 0.4])
                        + np.array([0, 0, 2.2]), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    s = rng.uniform(0.05, 0.35, size=(n, 3))
    if aniso:
        s[:, 0] *= 0.05
    log_scales = jnp.asarray(np.log(s), jnp.float32)
    logit_op = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    if dim_ops:
        # post-opacity-reset regime: sigmoid -> 0.01, a few transparent
        # rows below ALPHA_MIN (zero contribution anywhere)
        logit_op = jnp.full((n, 1), np.log(0.01 / 0.99), jnp.float32)
        logit_op = logit_op.at[::7].set(-6.5)   # sigmoid ~ 0.0015 < 1/255
    rgb = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    alive = jnp.arange(n) < (n - 5)
    return cam, (means, quats, log_scales, logit_op, rgb), alive


def _bin(cam, params, alive, cfg, **kw):
    means, quats, log_scales, logit_op, _ = params
    proj = project_gaussians(means, quats, log_scales, alive, cam)
    op = jax.nn.sigmoid(logit_op[:, 0])
    return bin_gaussians(proj, cam, cfg, opacity=op, **kw)


@pytest.mark.parametrize("bwd_mode", ["scatter", "segreduce"])
@pytest.mark.parametrize("dim_ops", [False, True])
def test_tight_rect_preserves_forward_and_grads(bwd_mode, dim_ops):
    """Frozen-binning contract: rendering against a tight-rect binning
    must produce the same loss and parameter gradients as the radius-rect
    one (drift budgets zero, q-slack 1)."""
    cam, params, alive = _scene(dim_ops=dim_ops)

    def loss(params, tight):
        # ample caps: the equality contract needs zero K-cap truncation
        # and no isect-capacity overflow in EITHER binning (under
        # truncation, tight rects keep MORE real content — loose drops
        # true candidates for margin junk; see
        # test_tight_rect_reduces_true_truncation)
        cfg = RasterConfig(max_per_tile=512, isect_per_gaussian=24.0,
                           backend="xla",
                           bwd_mode=bwd_mode, grad_scatter_bf16=False,
                           tight_rect=tight, cull_q_slack=1.0)
        binning = _bin(cam, jax.tree.map(jax.lax.stop_gradient, params),
                       alive, cfg, emit_exp=(bwd_mode == "segreduce"))
        im, depth, sil, dsq, _ = render_rgbd_sil(*params, alive, cam, cfg,
                                                 binning=binning)
        return (jnp.sum(im * im) + jnp.sum(jnp.abs(depth))
                + jnp.sum(sil ** 3) + jnp.sum(dsq))

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # identical included-contribution sets; the smaller tile lists change
    # the scatter-add ORDER of per-tile contributions (float add-order
    # noise ~1e-4 relative), unlike the cull which keeps slot order
    for a, b, name in zip(g0, g1, ["means", "quats", "scales", "op", "rgb"]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-4, atol=2e-6, err_msg=name)
    if not dim_ops:
        assert float(jnp.abs(g1[0]).sum()) > 0


def test_tight_rect_reduces_isects():
    """Anisotropic flakes: the ellipse AABB must generate substantially
    fewer intersections than the major-axis square, BEFORE the expansion
    sort (n_isect, not just post-hoc tile_count)."""
    cam, params, alive = _scene()
    cfg = RasterConfig(max_per_tile=128, isect_per_gaussian=24.0)
    b0 = _bin(cam, params, alive, cfg)
    b1 = _bin(cam, params, alive, cfg._replace(tight_rect=True,
                                               cull_q_slack=1.0))
    n0, n1 = int(b0.n_isect), int(b1.n_isect)
    assert n1 < n0 * 0.7, (n0, n1)
    # true-candidate K-cap pressure also drops (quality knob)
    assert int(jnp.sum(b1.tile_count)) <= int(jnp.sum(b0.tile_count))


def test_tight_rect_reduces_true_truncation():
    """Under per-tile K-cap pressure the loose binning truncates REAL
    contributors (the deviation VERDICT.md flags); tight rects spend the
    cap on actual content."""
    cam, params, alive = _scene()
    cfg = RasterConfig(max_per_tile=256, isect_per_gaussian=24.0)
    b0 = _bin(cam, params, alive, cfg)
    b1 = _bin(cam, params, alive, cfg._replace(tight_rect=True,
                                               cull_q_slack=1.0))
    assert int(b0.n_true_overflow) > 50
    assert int(b1.n_true_overflow) == 0


def test_tight_rect_dim_opacity_regime():
    """Post-opacity-reset (op=0.01) the contribution ellipse is far
    smaller than 3 sigma; rows under ALPHA_MIN get ZERO tiles while
    their geometric Projected stats (radius/valid) are untouched."""
    cam, params, alive = _scene(dim_ops=True, aniso=False)
    cfg = RasterConfig(max_per_tile=128, isect_per_gaussian=24.0)
    b0 = _bin(cam, params, alive, cfg)
    b1 = _bin(cam, params, alive, cfg._replace(tight_rect=True,
                                               cull_q_slack=1.0))
    assert int(b1.n_isect) < int(b0.n_isect) * 0.7, (int(b0.n_isect),
                                                     int(b1.n_isect))
    # transparent rows still project (bookkeeping parity)
    means, quats, log_scales, logit_op, _ = params
    proj = project_gaussians(means, quats, log_scales, alive, cam)
    op = np.asarray(jax.nn.sigmoid(logit_op[:, 0]))
    radii = np.asarray(proj.radius)
    assert (radii[(op < 1.0 / 255.0) & np.asarray(alive)] > 0).any()


def test_tight_rect_budgets_are_monotone():
    """More pixel slack / opacity drift / q-slack => no fewer
    intersections (budgets only widen coverage)."""
    cam, params, alive = _scene(seed=3)
    cfg = RasterConfig(max_per_tile=128, isect_per_gaussian=24.0,
                       tight_rect=True, cull_q_slack=1.0)
    base = int(_bin(cam, params, alive, cfg).n_isect)
    slack = int(_bin(cam, params, alive, cfg,
                     cull_slack_px=8.0).n_isect)
    drift = int(_bin(cam, params, alive, cfg,
                     cull_logit_drift=2.0).n_isect)
    qs = int(_bin(cam, params, alive,
                  cfg._replace(cull_q_slack=3.0)).n_isect)
    notight = int(_bin(cam, params, alive,
                       cfg._replace(tight_rect=False)).n_isect)
    assert base <= slack <= notight
    assert base <= drift <= notight
    assert base <= qs <= notight
    assert base < notight


def test_tight_rect_stacks_with_tile_cull():
    """tight_rect prunes pre-sort, cull_tile_slots post-sort (exact
    per-tile min-q); together they must still render identically."""
    cam, params, alive = _scene(seed=5)
    outs = []
    for on in (False, True):
        cfg = RasterConfig(max_per_tile=512, isect_per_gaussian=24.0,
                           backend="xla",
                           tight_rect=on, tile_cull=on, cull_q_slack=1.0)
        binning = _bin(cam, params, alive, cfg)
        outs.append(render_rgbd_sil(*params, alive, cam, cfg,
                                    binning=binning)[:4])
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
