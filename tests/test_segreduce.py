"""Expansion-order backward (ops/segreduce + rasterize._gather_rows_segreduce).

The mapping backward's d_table aggregation: duplicate-free scatter into
expansion order + Pallas contiguous-segment reduction must equal the plain
XLA scatter-add path exactly (f32) on real render gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.ops.rasterize import RasterConfig, render_rgbd_sil
from isogs_slam_tpu.ops.segreduce import LANES, W, segment_reduce_rows

pytestmark = pytest.mark.smoke  # sub-5-min CI subset


def test_segment_reduce_rows_matches_numpy():
    rng = np.random.default_rng(0)
    n_out = 70
    # segment lengths incl. empties and one long segment spanning >2 chunks
    lens = rng.integers(0, 9, size=n_out)
    lens[13] = 0
    lens[40] = int(2.5 * W)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    m = int(offs[-1])
    d = rng.normal(size=(m, 10)).astype(np.float32)
    d_exp = np.zeros((m + W, LANES), np.float32)
    d_exp[:m, :10] = d

    out = segment_reduce_rows(jnp.asarray(d_exp), jnp.asarray(offs), n_out,
                              10, interpret=True)       # planar [10, n_out]
    expect = np.stack([d[offs[i]:offs[i + 1]].sum(axis=0)
                       for i in range(n_out)]).T
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def _scene(n=400, seed=3):
    rng = np.random.default_rng(seed)
    cam = Camera(width=64, height=48, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
    means = jnp.asarray(rng.normal(size=(n, 3)) * np.array([0.8, 0.6, 0.3])
                        + np.array([0, 0, 2.0]), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    log_scales = jnp.asarray(np.log(rng.uniform(0.02, 0.12, size=(n, 3))),
                             jnp.float32)
    logit_op = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    alive = jnp.arange(n) < (n - 7)      # a few dead rows
    return cam, (means, quats, log_scales, logit_op, rgb), alive


@pytest.mark.parametrize("live_cols", [None, (0, 1, 2, 3, 4, 9)])
def test_segreduce_grads_match_scatter(live_cols):
    cam, params, alive = _scene()

    def loss(params, bwd_mode):
        cfg = RasterConfig(max_per_tile=128, backend="xla",
                           bwd_mode=bwd_mode, grad_scatter_bf16=False)
        im, depth, sil, dsq, _ = render_rgbd_sil(
            *params, alive, cam, cfg, live_grad_cols=live_cols)
        return (jnp.sum(im * im) + jnp.sum(jnp.abs(depth))
                + jnp.sum(sil ** 3) + jnp.sum(dsq))

    g_ref = jax.grad(lambda p: loss(p, "scatter"))(params)
    g_new = jax.grad(lambda p: loss(p, "segreduce"))(params)
    for a, b, name in zip(g_ref, g_new,
                          ["means", "quats", "scales", "op", "rgb"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
    # sanity: gradients are non-trivial
    assert float(jnp.abs(g_new[0]).sum()) > 0


def test_fused_composite_table_grads_match_scatter():
    """The fully fused TPU mapping path (_composite_table_fused: planar
    table -> gather -> Pallas composite, bwd = bf16 kernel output ->
    expansion scatter -> planar segreduce) must match the plain XLA
    scatter path. bf16 off so the comparison is exact-tolerance."""
    cam, params, alive = _scene(seed=7)

    def loss(params, backend, bwd_mode):
        cfg = RasterConfig(max_per_tile=128, backend=backend,
                           bwd_mode=bwd_mode, grad_scatter_bf16=False)
        im, depth, sil, dsq, _ = render_rgbd_sil(
            *params, alive, cam, cfg)
        return (jnp.sum(im * im) + jnp.sum(jnp.abs(depth))
                + jnp.sum(sil ** 3) + jnp.sum(dsq))

    l_ref, g_ref = jax.value_and_grad(
        lambda p: loss(p, "xla", "scatter"))(params)
    l_new, g_new = jax.value_and_grad(
        lambda p: loss(p, "pallas-interpret", "segreduce"))(params)
    np.testing.assert_allclose(float(l_ref), float(l_new), rtol=1e-5)
    for a, b, name in zip(g_ref, g_new,
                          ["means", "quats", "scales", "op", "rgb"]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_segreduce_forward_matches_scatter():
    cam, params, alive = _scene(seed=5)
    outs = []
    for mode in ["scatter", "segreduce"]:
        cfg = RasterConfig(max_per_tile=128, backend="xla", bwd_mode=mode)
        im, depth, sil, dsq, _ = render_rgbd_sil(*params, alive, cam, cfg)
        outs.append((im, depth, sil, dsq))
    for a, b in zip(*outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
