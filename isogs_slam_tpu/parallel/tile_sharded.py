"""Tile-parallel rasterization over a device mesh (shard_map).

SURVEY.md §2.3: the natural multi-chip axes for this workload are pixels/
tiles and Gaussians — pure data parallelism. This module shards the TILE
axis of the compositing stage across devices: every device holds the full
(replicated) Gaussian table, projection and binning run replicated (they
are a small fraction of the render), and each device composites its block
of tiles. Reverse-mode AD through `shard_map` inserts the ICI `psum` that
accumulates the per-device partial Gaussian gradients.

Use case: very large frames (the compositing work and its backward scale
with pixel count) and multi-chip offline refinement; single-chip SLAM uses
the unsharded path.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.camera import Camera, TILE
from ..ops.rasterize import (Binning, RasterConfig, bin_gaussians,
                             project_gaussians)

TILE_AXIS = "tile"


def make_tile_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def render_tiles_sharded(mesh: Mesh, means_cam, quats_cam, log_scales,
                         logit_opacities, features, alive, cam: Camera,
                         cfg: RasterConfig):
    """Differentiable render with the compositing tile axis sharded over
    `mesh`. Returns (image [F, H, W], final_T [H, W]) exactly as the
    unsharded path (ops/rasterize.render)."""
    from ..ops.rasterize import composite

    n_dev = mesh.devices.size
    F = features.shape[-1]
    num_tiles = cam.num_tiles

    opacity = jax.nn.sigmoid(logit_opacities[:, 0])
    proj = project_gaussians(means_cam, quats_cam, log_scales, alive, cam)
    binning = bin_gaussians(proj, cam, cfg)

    # pad the tile axis to a multiple of the mesh and shard the per-tile
    # gather inputs; the table stays replicated
    table = jnp.concatenate(
        [proj.u[:, None], proj.v[:, None], proj.conic,
         opacity[:, None], features], axis=-1)                 # [N, 6+F]
    K = binning.tile_gauss.shape[1]
    pad = (-num_tiles) % n_dev
    tile_gauss = jnp.concatenate(
        [binning.tile_gauss,
         jnp.zeros((pad, K), binning.tile_gauss.dtype)])
    counts = jnp.concatenate(
        [binning.tile_count, jnp.zeros((pad,), binning.tile_count.dtype)])
    tx = jnp.arange(num_tiles + pad, dtype=jnp.int32) % cam.tiles_x
    ty = jnp.arange(num_tiles + pad, dtype=jnp.int32) // cam.tiles_x
    origins = jnp.stack([tx * TILE, ty * TILE], axis=-1)

    def shard_fn(table_rep, tg_shard, cnt_shard, org_shard):
        from ..ops.pallas_composite import CHUNK, composite_tiles
        gdata = table_rep[tg_shard]                            # [Ts, K, 6+F]
        backend = cfg.resolve_backend()
        if backend in ("pallas", "pallas-interpret"):
            shift = jnp.concatenate(
                [org_shard.astype(gdata.dtype),
                 jnp.zeros((org_shard.shape[0], 4 + F), gdata.dtype)],
                axis=-1)
            gdata = gdata - shift[:, None, :]
            pad_k = (-K) % CHUNK
            if pad_k:
                gdata = jnp.concatenate(
                    [gdata, jnp.zeros((gdata.shape[0], pad_k, 6 + F),
                                      gdata.dtype)], axis=1)
            # tiles_x=None: shard tile offsets are not static, so u,v stay
            # pre-shifted to tile-local coordinates here
            out, final_t = composite_tiles(
                gdata, cnt_shard, F, None, backend == "pallas-interpret")
        else:
            from ..ops.rasterize import _composite_chunk
            out, final_t = _composite_chunk(gdata, cnt_shard, org_shard, F)
        return out, final_t

    # jit wraps the shard_map so inputs are resharded onto the mesh
    sharded = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS))))
    tiles_out, tiles_t = sharded(table, tile_gauss, counts, origins)
    tiles_out = tiles_out[:num_tiles]
    tiles_t = tiles_t[:num_tiles]

    gx, gy = cam.tiles_x, cam.tiles_y
    img = tiles_out.reshape(gy, gx, TILE, TILE, F)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE, gx * TILE, F)
    img = img[: cam.height, : cam.width]
    final_t = tiles_t.reshape(gy, gx, TILE, TILE)
    final_t = final_t.transpose(0, 2, 1, 3).reshape(gy * TILE, gx * TILE)
    final_t = final_t[: cam.height, : cam.width]
    return jnp.moveaxis(img, -1, 0), final_t
