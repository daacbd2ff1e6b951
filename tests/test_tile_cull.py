"""Zero-contribution slot culling (rasterize.cull_tile_slots).

The rect expansion keeps every tile in the radius AABB (CUDA getRect
parity); the cull drops slots whose EXACT min of the conic quadratic over
the tile box proves alpha < ALPHA_MIN at every pixel. With zero slack the
render output and every parameter gradient must be IDENTICAL with the
cull on — it only removes provably-zero work.
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


def _scene(n=500, seed=11, aniso=True):
    """Camera-frame scene; aniso=True makes flake-like splats (one axis
    ~20x smaller — the shape the IsoGS flat loss drives toward), whose
    projected conics waste most of their radius AABB."""
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
    rgb = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    alive = jnp.arange(n) < (n - 5)
    return cam, (means, quats, log_scales, logit_op, rgb), alive


def _bin(cam, params, alive, cfg, **kw):
    means, quats, log_scales, logit_op, _ = params
    proj = project_gaussians(means, quats, log_scales, alive, cam)
    op = jax.nn.sigmoid(logit_op[:, 0])
    return bin_gaussians(proj, cam, cfg, opacity=op, **kw)


@pytest.mark.parametrize("bwd_mode", ["scatter", "segreduce"])
def test_cull_preserves_forward_and_grads(bwd_mode):
    """Frozen-binning contract (how mapping/tracking consume the cull):
    rendering against a culled binning must produce the same loss and
    parameter gradients as against the uncull'd one."""
    cam, params, alive = _scene()

    def loss(params, cull):
        cfg = RasterConfig(max_per_tile=128, backend="xla",
                           bwd_mode=bwd_mode, grad_scatter_bf16=False,
                           tile_cull=cull, cull_q_slack=1.0)
        binning = _bin(cam, jax.tree.map(jax.lax.stop_gradient, params),
                       alive, cfg, emit_exp=(bwd_mode == "segreduce"))
        im, depth, sil, dsq, _ = render_rgbd_sil(*params, alive, cam, cfg,
                                                 binning=binning)
        return (jnp.sum(im * im) + jnp.sum(jnp.abs(depth))
                + jnp.sum(sil ** 3) + jnp.sum(dsq))

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    # identical included-contribution sets; only chunk grouping in the
    # compositing sums can reorder float adds
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b, name in zip(g0, g1, ["means", "quats", "scales", "op", "rgb"]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    assert float(jnp.abs(g1[0]).sum()) > 0


def test_cull_reduces_counts_and_is_exact_per_slot():
    """Anisotropic splats: a substantial fraction of rect slots must cull,
    and every culled slot must be provably silent (max alpha over its
    tile's pixels < ALPHA_MIN)."""
    from isogs_slam_tpu.core.camera import TILE
    from isogs_slam_tpu.ops.rasterize import ALPHA_MIN
    cam, params, alive = _scene()
    cfg = RasterConfig(max_per_tile=128)
    b0 = _bin(cam, params, alive, cfg)
    b1 = _bin(cam, params, alive, cfg._replace(tile_cull=True,
                                               cull_q_slack=1.0))
    n0 = int(jnp.sum(b0.tile_count))
    n1 = int(jnp.sum(b1.tile_count))
    assert n1 < n0 * 0.8, (n0, n1)   # flakes: expect >20% of slots culled

    # exactness: slots in b0 but compacted out of b1 contribute nothing
    means, quats, log_scales, logit_op, _ = params
    proj = project_gaussians(means, quats, log_scales, alive, cam)
    u, v = np.asarray(proj.u), np.asarray(proj.v)
    A, B, C = [np.asarray(proj.conic[:, i]) for i in range(3)]
    op = np.asarray(jax.nn.sigmoid(logit_op[:, 0]))
    tg0, tc0 = np.asarray(b0.tile_gauss), np.asarray(b0.tile_count)
    tg1, tc1 = np.asarray(b1.tile_gauss), np.asarray(b1.tile_count)
    checked = 0
    for t in range(tg0.shape[0]):
        kept = set(tg1[t, :tc1[t]].tolist())
        x0, y0 = (t % cam.tiles_x) * TILE, (t // cam.tiles_x) * TILE
        px, py = np.meshgrid(np.arange(x0, x0 + TILE),
                             np.arange(y0, y0 + TILE))
        for g in tg0[t, :tc0[t]]:
            if int(g) in kept:
                continue
            dx, dy = u[g] - px, v[g] - py
            q = A[g] * dx * dx + 2 * B[g] * dx * dy + C[g] * dy * dy
            amax = op[g] * np.exp(-0.5 * q.min())
            assert amax < ALPHA_MIN, (t, int(g), amax)
            checked += 1
        if checked > 400:
            break
    assert checked > 50   # the assertion actually exercised


def test_cull_budgets_are_monotone():
    """More pixel slack / opacity drift / q-slack => culls no more slots
    (the budgets only widen what is kept)."""
    cam, params, alive = _scene(seed=3)
    cfg = RasterConfig(max_per_tile=128, tile_cull=True, cull_q_slack=1.0)
    base = int(jnp.sum(_bin(cam, params, alive, cfg).tile_count))
    slack = int(jnp.sum(_bin(cam, params, alive, cfg,
                             cull_slack_px=8.0).tile_count))
    drift = int(jnp.sum(_bin(cam, params, alive, cfg,
                             cull_logit_drift=2.0).tile_count))
    qs = int(jnp.sum(_bin(cam, params, alive,
                          cfg._replace(cull_q_slack=3.0)).tile_count))
    nocull = int(jnp.sum(_bin(cam, params, alive,
                              cfg._replace(tile_cull=False)).tile_count))
    assert base <= slack <= nocull
    assert base <= drift <= nocull
    assert base <= qs <= nocull
    assert base < nocull


def test_cull_isotropic_scene_still_exact():
    """Spherical splats (the default gaussian_distribution): modest cull,
    but the render must still match exactly. High opacities included —
    the alpha clamp (ALPHA_MAX) must NOT tighten the cull cut (the
    compositor's contrib test is clamp-invariant)."""
    cam, params, alive = _scene(seed=5, aniso=False)
    # saturate some opacities near 1 (converged opaque surfels)
    means, quats, log_scales, logit_op, rgb = params
    logit_op = logit_op.at[::3].set(7.0)       # sigmoid -> 0.999
    params = (means, quats, log_scales, logit_op, rgb)
    outs = []
    for cull in (False, True):
        cfg = RasterConfig(max_per_tile=128, backend="xla",
                           tile_cull=cull, cull_q_slack=1.0)
        binning = _bin(cam, params, alive, cfg)
        outs.append(render_rgbd_sil(*params, alive, cam, cfg,
                                    binning=binning)[:4])
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
