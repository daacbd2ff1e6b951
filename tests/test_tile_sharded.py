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
