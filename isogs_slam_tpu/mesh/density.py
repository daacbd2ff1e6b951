"""Block-tiled Gaussian density grid — the TPU analog of the reference's
"push" mesh-density algorithm (`scripts/extract_mesh_fast.py:191-386` and the
C++ `MeshExtractor`, cpp/src/meshing/mesh_extractor.cpp:130-181, whose
voxel-by-voxel KNN loop was CPU-bound).

Reference semantics reproduced:
  * Sigma^{-1} = R S^{-2} R^T with scales clamped to >= 1e-5 and optionally
    >= voxel/2 (anti-pancaking, extract_mesh_fast.py:479-484)
  * density(p) = sum_g sigmoid(op_g) * exp(-0.5 (p-mu)^T Sigma^{-1} (p-mu))
    truncated to ||p-mu|| < truncate_sigma * max_scale_g
  * voxel grid: linspace over the padded bbox, C-order (x, y, z), z fastest

TPU-first design instead of the reference's host loop over blocks with
dynamic candidate tensors:
  * per-Gaussian 3D AABBs are expanded into fixed-capacity per-block
    candidate lists with the same static-shape sort pipeline as the
    rasterizer's tile binning (ops/rasterize.bin_gaussians);
  * the quadratic form is evaluated as ONE matmul per block:
    density feature lift  phi(p) = [x^2 y^2 z^2 xy xz yz x y z 1]  gives
    (p-mu)^T A (p-mu) = phi(p) . coeff(A, mu), so a block of 16^3 voxels
    against K candidates is a [4096, 10] @ [10, K] MXU contraction (the
    Euclidean truncation ball is a second coeff vector of the same lift).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.transforms import normalize, quat_to_rotmat


class GridSpec(NamedTuple):
    """Static voxel-grid geometry (host-computed, hashable for jit)."""

    origin: tuple          # (3,) world position of voxel (0,0,0)
    spacing: tuple         # (3,) voxel edge lengths
    dims: tuple            # (3,) voxel counts
    block: int = 16        # voxels per block edge

    @property
    def block_dims(self):
        return tuple(-(-d // self.block) for d in self.dims)

    @property
    def num_blocks(self):
        bd = self.block_dims
        return bd[0] * bd[1] * bd[2]


def make_grid(means: np.ndarray, voxel_size: float, padding: float = 0.5,
              block: int = 16) -> GridSpec:
    """Padded bbox -> linspace grid (create_voxel_grid semantics: linspace
    endpoints inclusive, so actual spacing = size/(dims-1))."""
    finite = np.isfinite(means).all(axis=1)
    if not finite.all():
        print(f"[mesh] dropping {int((~finite).sum())} non-finite Gaussians"
              " from the bounding box")
    means = means[finite]
    if means.shape[0] == 0:
        raise ValueError("no finite Gaussian centers; cannot build a grid")
    mn = means.min(axis=0) - padding
    mx = means.max(axis=0) + padding
    size = mx - mn
    dims = np.maximum(np.ceil(size / voxel_size).astype(int), 2)
    spacing = size / (dims - 1)
    return GridSpec(origin=tuple(float(v) for v in mn),
                    spacing=tuple(float(v) for v in spacing),
                    dims=tuple(int(v) for v in dims), block=block)


def density_coefficients(means, log_scales, unnorm_rotations,
                         logit_opacities, min_scale: float = 1e-5):
    """Per-Gaussian data for the quadratic-form matmul.

    Returns (coeff [N,10], op [N], trunc [N], max_scale [N]) where
    phi(p) . coeff = (p-mu)^T Sigma^{-1} (p-mu) for
    phi(p) = [x^2, y^2, z^2, xy, xz, yz, x, y, z, 1].
    """
    if log_scales.shape[1] == 1:
        log_scales = jnp.tile(log_scales, (1, 3))
    scales = jnp.maximum(jnp.exp(log_scales), min_scale)
    R = quat_to_rotmat(normalize(unnorm_rotations))
    s_inv_sq = 1.0 / (scales ** 2 + 1e-8)
    A = jnp.einsum("nij,nj,nkj->nik", R, s_inv_sq, R)       # [N,3,3]
    mu = means
    Amu = jnp.einsum("nij,nj->ni", A, mu)                    # [N,3]
    coeff = jnp.stack([
        A[:, 0, 0], A[:, 1, 1], A[:, 2, 2],
        2.0 * A[:, 0, 1], 2.0 * A[:, 0, 2], 2.0 * A[:, 1, 2],
        -2.0 * Amu[:, 0], -2.0 * Amu[:, 1], -2.0 * Amu[:, 2],
        jnp.einsum("ni,ni->n", mu, Amu)], axis=-1)           # [N,10]
    op = jax.nn.sigmoid(logit_opacities[:, 0])
    max_scale = jnp.max(scales, axis=1)
    return coeff, op, max_scale


def _bin_to_blocks(means, trunc, spec: GridSpec, max_isect: int,
                   max_per_block: int):
    """Fixed-capacity per-block Gaussian candidate lists (3D analog of
    rasterizer tile binning)."""
    origin = jnp.asarray(spec.origin)
    spacing = jnp.asarray(spec.spacing)
    bd = spec.block_dims
    bsize = spacing * spec.block
    lo = jnp.floor((means - trunc[:, None] - origin) / bsize).astype(jnp.int32)
    hi = jnp.floor((means + trunc[:, None] - origin) / bsize).astype(jnp.int32)
    lo = jnp.clip(lo, 0, jnp.asarray(bd) - 1)
    hi = jnp.clip(hi + 1, 1, jnp.asarray(bd))
    span = jnp.maximum(hi - lo, 0)                           # [N,3]
    counts = (span[:, 0] * span[:, 1] * span[:, 2]).astype(jnp.int32)
    offs = jnp.cumsum(counts) - counts
    total = offs[-1] + counts[-1]

    N = means.shape[0]
    M = max_isect
    src = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                     total_repeat_length=M)
    pos = jnp.arange(M, dtype=jnp.int32)
    local = pos - offs[src]
    sx = jnp.maximum(span[src, 0], 1)
    sy = jnp.maximum(span[src, 1], 1)
    bx = lo[src, 0] + local % sx
    by = lo[src, 1] + (local // sx) % sy
    bz = lo[src, 2] + local // (sx * sy)
    nb = spec.num_blocks
    block_id = (bx * bd[1] + by) * bd[2] + bz
    in_range = pos < jnp.minimum(total, M)
    block_id = jnp.where(in_range, block_id, nb).astype(jnp.int32)

    order = jnp.argsort(block_id)
    sorted_block = block_id[order]
    sorted_gauss = src[order]
    bids = jnp.arange(nb, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_block, bids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_block, bids, side="right").astype(jnp.int32)
    count = jnp.minimum(ends - starts, max_per_block)
    slots = starts[:, None] + jnp.arange(max_per_block, dtype=jnp.int32)
    slots = jnp.clip(slots, 0, M - 1)
    lists = sorted_gauss[slots]                              # [NB, K]
    overflow = jnp.maximum(total - M, 0) + jnp.sum((ends - starts) - count)
    return lists, count, overflow


def _prep_density_table(means, log_scales, unnorm_rotations,
                        logit_opacities, alive, spec, max_isect,
                        max_per_block, truncate_sigma, min_scale):
    """Shared input prep for the serial and sharded density passes:
    coefficient table [N, 21] (quadratic + Euclid-ball + opacity) and the
    per-block Gaussian lists. Kept in ONE place so the sharded path stays
    bit-equal to the serial one."""
    coeff, op, max_scale = density_coefficients(
        means, log_scales, unnorm_rotations, logit_opacities, min_scale)
    trunc = truncate_sigma * max_scale
    op = jnp.where(alive, op, 0.0)
    trunc = jnp.where(alive, trunc, 0.0)
    lists, count, overflow = _bin_to_blocks(
        means, trunc, spec, max_isect, max_per_block)
    # Euclid-ball coeffs: phi(p).eucl = ||p - mu||^2 - trunc^2
    eucl = jnp.stack([
        jnp.ones_like(op), jnp.ones_like(op), jnp.ones_like(op),
        jnp.zeros_like(op), jnp.zeros_like(op), jnp.zeros_like(op),
        -2.0 * means[:, 0], -2.0 * means[:, 1], -2.0 * means[:, 2],
        jnp.sum(means * means, axis=1) - trunc * trunc], axis=-1)
    table = jnp.concatenate([coeff, eucl, op[:, None]], axis=-1)
    return table, lists, count, overflow


@functools.partial(jax.jit,
                   static_argnames=("spec", "max_isect", "max_per_block",
                                    "truncate_sigma", "block_chunk"))
def density_grid(means, log_scales, unnorm_rotations, logit_opacities,
                 alive, spec: GridSpec, max_isect: int,
                 max_per_block: int = 256, truncate_sigma: float = 3.0,
                 min_scale: float = 1e-5, block_chunk: int = 32):
    """Returns (density [dims], n_overflow). All-jit, differentiable-free."""
    table, lists, count, overflow = _prep_density_table(
        means, log_scales, unnorm_rotations, logit_opacities, alive, spec,
        max_isect, max_per_block, truncate_sigma, min_scale)
    dens = _dens_for_blocks(table, lists, count, spec, block_chunk)
    return _assemble(dens, spec), overflow


def _dens_for_blocks(table, lists, count, spec: GridSpec, block_chunk: int,
                     base_block: int = 0):
    """Density of blocks [base_block, base_block + lists.shape[0]), one
    [P, 10] @ [10, K] MXU contraction per block, lax.map'ed in chunks of
    block_chunk. Shared by the serial path and the shard_map'ed path
    (where each device owns a contiguous block range)."""
    B = spec.block
    P = B * B * B
    bd = spec.block_dims
    # voxel offsets within a block, C-order (x, y, z)
    ox = jax.lax.broadcasted_iota(jnp.int32, (B, B, B), 0).reshape(-1)
    oy = jax.lax.broadcasted_iota(jnp.int32, (B, B, B), 1).reshape(-1)
    oz = jax.lax.broadcasted_iota(jnp.int32, (B, B, B), 2).reshape(-1)
    origin = jnp.asarray(spec.origin)
    spacing = jnp.asarray(spec.spacing)

    def block_density(bidx, glist, gcount):
        bx = bidx // (bd[1] * bd[2])
        by = (bidx // bd[2]) % bd[1]
        bz = bidx % bd[2]
        vx = bx * B + ox
        vy = by * B + oy
        vz = bz * B + oz
        px = origin[0] + vx.astype(jnp.float32) * spacing[0]
        py = origin[1] + vy.astype(jnp.float32) * spacing[1]
        pz = origin[2] + vz.astype(jnp.float32) * spacing[2]
        one = jnp.ones_like(px)
        phi = jnp.stack([px * px, py * py, pz * pz, px * py, px * pz,
                         py * pz, px, py, pz, one], axis=-1)  # [P,10]
        data = table[glist]                                   # [K,21]
        # HIGHEST precision is load-bearing: the phi expansion uses
        # ABSOLUTE coordinates, so the products reach |A|*|p|^2 ~ 1e6-1e7
        # while the true centered value (p-mu)^T A (p-mu) is O(1). At TPU
        # default precision the operands truncate to bf16 (~0.8% rel) and
        # the cancellation error reaches ~1e4 absolute — quad went below
        # -176, exp overflowed to inf, and marching tets interpolated the
        # inf corners into NaN vertices (r5s6 chain, 1.1M-Gaussian mesh).
        hp = jax.lax.Precision.HIGHEST
        quad = jnp.matmul(phi, data[:, 0:10].T, precision=hp)  # [P,K] MXU
        ball = jnp.matmul(phi, data[:, 10:20].T, precision=hp)
        # the form is PSD: clamp away residual f32 cancellation noise so
        # exp <= 1 always (true density at the center is op * 1)
        quad = jnp.maximum(quad, 0.0)
        valid = (jnp.arange(glist.shape[0])[None, :] < gcount) & (ball < 0.0)
        dens = jnp.where(valid, data[None, :, 20] * jnp.exp(-0.5 * quad), 0.0)
        return jnp.sum(dens, axis=-1)                         # [P]

    nb = lists.shape[0]
    pad = (-nb) % block_chunk
    bidxs = base_block + jnp.arange(nb + pad, dtype=jnp.int32)
    glists = jnp.concatenate(
        [lists, jnp.zeros((pad,) + lists.shape[1:], lists.dtype)])
    gcounts = jnp.concatenate([count, jnp.zeros((pad,), count.dtype)])
    n_chunks = (nb + pad) // block_chunk

    dens = jax.lax.map(
        lambda args: jax.vmap(block_density)(*args),
        (bidxs.reshape(n_chunks, block_chunk),
         glists.reshape(n_chunks, block_chunk, -1),
         gcounts.reshape(n_chunks, block_chunk)))
    return dens.reshape(nb + pad, P)[:nb]


def _assemble(dens, spec: GridSpec):
    """[num_blocks, P] block densities -> [dims] grid (pad-cropped)."""
    B = spec.block
    bd = spec.block_dims
    full = dens.reshape(bd[0], bd[1], bd[2], B, B, B)
    full = full.transpose(0, 3, 1, 4, 2, 5).reshape(
        bd[0] * B, bd[1] * B, bd[2] * B)
    return full[: spec.dims[0], : spec.dims[1], : spec.dims[2]]


@functools.partial(jax.jit,
                   static_argnames=("spec", "max_isect", "max_per_block",
                                    "truncate_sigma", "block_chunk",
                                    "n_devices"))
def density_grid_sharded(means, log_scales, unnorm_rotations,
                         logit_opacities, alive, spec: GridSpec,
                         max_isect: int, n_devices: int,
                         max_per_block: int = 256,
                         truncate_sigma: float = 3.0,
                         min_scale: float = 1e-5, block_chunk: int = 32):
    """density_grid with the block axis shard_map'ed over an n_devices
    mesh: blocks are embarrassingly parallel (the reference's per-block
    host loop, extract_mesh_fast.py:191-386), so each device evaluates a
    contiguous block range against the replicated coefficient table and
    the grid is reassembled from the all-gathered shards. Binning runs
    replicated (one sort; it is a small fraction of the density pass)."""
    from jax.sharding import Mesh, PartitionSpec as PS
    from jax.experimental.shard_map import shard_map

    table, lists, count, overflow = _prep_density_table(
        means, log_scales, unnorm_rotations, logit_opacities, alive, spec,
        max_isect, max_per_block, truncate_sigma, min_scale)

    nb = spec.num_blocks
    pad = (-nb) % (n_devices * block_chunk)
    lists_p = jnp.concatenate(
        [lists, jnp.zeros((pad,) + lists.shape[1:], lists.dtype)])
    # padding blocks carry count 0 -> density 0; their bidx aliases block
    # coordinates past bd, which only affects their (discarded) voxels
    count_p = jnp.concatenate([count, jnp.zeros((pad,), count.dtype)])
    per_dev = (nb + pad) // n_devices

    avail = len(jax.devices())
    if n_devices > avail:
        raise ValueError(f"density_grid_sharded: n_devices={n_devices} "
                         f"but only {avail} device(s) are visible")
    mesh = Mesh(np.array(jax.devices()[:n_devices]), ("blocks",))

    def shard_fn(tbl, ls, ct, base):
        return _dens_for_blocks(tbl, ls, ct, spec, block_chunk,
                                base_block=base[0])

    bases = jnp.arange(n_devices, dtype=jnp.int32) * per_dev
    dens = shard_map(shard_fn, mesh=mesh,
                     in_specs=(PS(), PS("blocks"), PS("blocks"),
                               PS("blocks")),
                     out_specs=PS("blocks"))(table, lists_p, count_p, bases)
    return _assemble(dens[:nb], spec), overflow


def compute_density(params_np: dict, voxel_size: float = 0.02,
                    padding: float = 0.5, block_size: int = 16,
                    truncate_sigma: float = 3.0,
                    min_scale_limit: float = 0.0,
                    max_per_block: int = 256,
                    isect_per_gaussian: float = 16.0,
                    shard_devices: int = 0):
    """Host-facing wrapper: checkpoint params dict -> (density np [dims],
    GridSpec). Mirrors the reference main() flow (extract_mesh_fast.py:469+).
    shard_devices > 1 shards the block axis over that many devices
    (density_grid_sharded); clamped to the devices actually present.
    """
    means = np.asarray(params_np["means3D"], np.float32)
    spec = make_grid(means, voxel_size, padding, block_size)
    n = means.shape[0]
    max_isect = int(max(4096, (n * isect_per_gaussian + 1023) // 1024 * 1024))
    nd = min(int(shard_devices), len(jax.devices()))
    fn = (functools.partial(density_grid_sharded, n_devices=nd) if nd > 1
          else density_grid)
    args = (jnp.asarray(means),
            jnp.asarray(params_np["log_scales"], jnp.float32),
            jnp.asarray(params_np["unnorm_rotations"], jnp.float32),
            jnp.asarray(params_np["logit_opacities"], jnp.float32),
            jnp.ones((n,), bool))
    min_scale = max(1e-5, min_scale_limit)
    dens, overflow = fn(*args, spec, max_isect,
                        max_per_block=max_per_block,
                        truncate_sigma=truncate_sigma, min_scale=min_scale)
    # demand-driven capacity (same contract as the raster isect cap):
    # truncated block lists under-report density near block borders and
    # the marching pass then opens seams there — pay a recompile instead
    # (the density pass itself is ~0.5 s steady-state at 500k). The
    # scalar overflow conflates expansion-slot (max_isect) and per-block
    # (max_per_block) truncation, so grow both geometrically; bounded in
    # case the scene genuinely cannot fit.
    for _ in range(6):
        if int(overflow) <= 0:
            break
        max_isect = (int((max_isect + int(overflow)) * 1.25) + 1023) \
            // 1024 * 1024
        max_per_block = max_per_block * 2
        print(f"[mesh] {int(overflow)} block-candidate slots overflowed; "
              f"growing max_isect -> {max_isect}, max_per_block -> "
              f"{max_per_block} (recompiling)")
        dens, overflow = fn(*args, spec, max_isect,
                            max_per_block=max_per_block,
                            truncate_sigma=truncate_sigma,
                            min_scale=min_scale)
    if int(overflow) > 0:
        print(f"[mesh] WARNING: {int(overflow)} slots still overflow "
              f"after growth; density is truncated near block borders")
    return np.asarray(dens), spec
