"""Tile-sharded rendering over an 8-device mesh matches the serial path,
forward and backward (psum of per-device Gaussian gradients)."""
import numpy as np
import jax
import jax.numpy as jnp

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.ops.rasterize import RasterConfig, render
from isogs_slam_tpu.parallel.tile_sharded import (make_tile_mesh,
                                                  render_tiles_sharded)


def test_tile_sharded_render_matches_serial():
    assert jax.device_count() >= 8
    rng = np.random.default_rng(0)
    n = 2000
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    means[:, 2] += 2.5
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    logs = np.log(rng.uniform(0.02, 0.1, (n, 3))).astype(np.float32)
    ops = rng.uniform(-2, 3, (n, 1)).astype(np.float32)
    alive = np.ones(n, bool)
    alive[-100:] = False
    cam = Camera(width=128, height=96, fx=96., fy=96., cx=63.5, cy=47.5)
    cfg = RasterConfig(max_per_tile=128, tile_chunk=12, backend="xla")
    args = [jnp.asarray(x) for x in (means, quats, logs, ops)]
    feats = jnp.concatenate(
        [jnp.asarray(rgb), args[0][:, 2:3],
         jnp.ones_like(args[0][:, 2:3]), args[0][:, 2:3] ** 2], axis=-1)
    aj = jnp.asarray(alive)

    def serial_loss(m, q, s, o):
        f = jnp.concatenate([jnp.asarray(rgb), m[:, 2:3],
                             jnp.ones_like(m[:, 2:3]), m[:, 2:3] ** 2],
                            axis=-1)
        out = render(m, q, s, o, f, aj, cam, cfg)
        return jnp.sum(out["image"] ** 2), out["image"]

    mesh = make_tile_mesh(8)

    def sharded_loss(m, q, s, o):
        f = jnp.concatenate([jnp.asarray(rgb), m[:, 2:3],
                             jnp.ones_like(m[:, 2:3]), m[:, 2:3] ** 2],
                            axis=-1)
        img, ft = render_tiles_sharded(mesh, m, q, s, o, f, aj, cam, cfg)
        return jnp.sum(img ** 2), img

    (l1, im1), g1 = jax.value_and_grad(serial_loss, argnums=(0, 1, 2, 3),
                                       has_aux=True)(*args)
    (l2, im2), g2 = jax.value_and_grad(sharded_loss, argnums=(0, 1, 2, 3),
                                       has_aux=True)(*args)
    assert float(jnp.max(jnp.abs(im1 - im2))) < 1e-5
    assert abs(float(l1) - float(l2)) / max(abs(float(l1)), 1e-9) < 1e-6
    for a, b in zip(g1, g2):
        scale = float(jnp.max(jnp.abs(a)))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale + 1e-7


def test_gauss_sharded_iso_density_matches_serial():
    from isogs_slam_tpu.ops.iso_loss import knn_blocked
    from isogs_slam_tpu.parallel.gauss_sharded import (
        iso_density_gauss_sharded, make_gauss_mesh)
    from isogs_slam_tpu.utils.transforms import normalize, quat_to_rotmat

    rng = np.random.default_rng(0)
    n, Q, k = 3000, 128, 16
    means = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32))
    logs = jnp.asarray(np.log(rng.uniform(0.02, 0.08, (n, 3))).astype(
        np.float32))
    ops = jnp.asarray(rng.uniform(-1, 2, (n, 1)).astype(np.float32))
    alive = np.ones(n, bool)
    alive[-200:] = False
    aj = jnp.asarray(alive)
    queries = means[jnp.asarray(
        rng.choice(np.where(alive)[0], Q, replace=False))]

    def serial_density(means_, ops_):
        d2, nbr = knn_blocked(queries, jax.lax.stop_gradient(means_), aj,
                              k, 8192)
        nm = means_[nbr]
        nq = normalize(quats[nbr])
        ns = jnp.maximum(jnp.exp(logs[nbr]), 1e-5)
        no = jax.nn.sigmoid(ops_[nbr][..., 0])
        valid = aj[nbr] & jnp.isfinite(d2)
        R = quat_to_rotmat(nq)
        sinv = 1.0 / (ns ** 2 + 1e-8)
        delta = queries[:, None, :] - nm
        rtd = jnp.einsum("qkij,qkj->qki", jnp.swapaxes(R, -1, -2), delta)
        quad = jnp.sum(sinv * rtd * rtd, -1)
        return jnp.sum(jnp.where(valid, no * jnp.exp(-0.5 * quad), 0.0),
                       -1)

    mesh = make_gauss_mesh(8)
    d_ref = serial_density(means, ops)
    d_sh = iso_density_gauss_sharded(mesh, queries, means, quats, logs,
                                     ops, aj, k)
    assert float(jnp.max(jnp.abs(d_ref - d_sh))) < 1e-5
    g_ref = jax.grad(lambda m, o: jnp.sum(serial_density(m, o) ** 2),
                     argnums=(0, 1))(means, ops)
    g_sh = jax.grad(
        lambda m, o: jnp.sum(iso_density_gauss_sharded(
            mesh, queries, m, quats, logs, o, aj, k) ** 2),
        argnums=(0, 1))(means, ops)
    for a, b in zip(g_sh, g_ref):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale + 1e-7
