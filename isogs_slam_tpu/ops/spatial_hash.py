"""Uniform-grid spatial hash KNN — the TPU-native analog of the reference's
CUDA spatial hash (`cpp/cuda/kernels/spatial_hash.cu`: grid build kernel +
27-cell KNN query with a candidate cap, `cpp/src/utils/spatial_hash.cpp`).

The streaming exact KNN in `ops/iso_loss.knn_blocked` is O(Q * C) with a
top_k merge per block — on TPU each merge lowers to a full sort, which made
the iso loss the dominant cost of a mapping iteration at C ~ 10^6. This
module replaces it with the classic O(Q * 27 * cap) uniform-grid query:

  build:  hash each point's integer cell to a power-of-two table, argsort
          point ids by hash (one sort of C keys), bucket ranges via
          searchsorted — all static shapes.
  query:  gather up to `cap` candidates from each of the 27 neighboring
          cells, reject hash collisions by comparing exact cell coords,
          exact top-k over the [Q, 27*cap] candidate distances.

Approximation (same as the CUDA kernel's candidate cap 256): cells holding
more than `cap` points contribute only their first `cap` (in hash-sorted
order). For the stochastic iso-surface regularizer this is benign; tests
check recall against brute force.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gather import gather_slices

_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


class HashGrid(NamedTuple):
    order: jnp.ndarray       # [C] int32 point ids sorted by hash bucket
    cell_of: jnp.ndarray     # [C] int32 PACKED cell coords (10b/axis,
    #                          offset +512) per *sorted* point
    starts: jnp.ndarray      # [H] int32 bucket start in `order`
    ends: jnp.ndarray        # [H] int32 bucket end
    cell_size: jnp.ndarray   # [] f32
    table_size: int          # static, power of two
    # fused per-sorted-point record [C, 5]: (bitcast cell_of, bitcast
    # orig id, x, y, z). TPU random access is index-serial (~8 ns/row,
    # columns amortized) — the query's three [Q, 27*cap] gathers
    # (cell_of, order, points) fused into ONE row gather cut the
    # 32k-query pool build ~3x.
    rec: jnp.ndarray | None = None


def _cell_coords(points, cell_size):
    return jnp.floor(points / cell_size).astype(jnp.int32)


def _hash_cells(cells, table_size):
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return (h & (table_size - 1)).astype(jnp.int32)


def _pack_cells(cells):
    """[..., 3] int cell coords -> [...] packed int32 (10 bits per axis,
    +512 offset; one gather instead of three at query time). Cells outside
    [-512, 511] alias — at cell_size ~ 3 point spacings that is a >1500x
    scene extent, far beyond any map."""
    c = jnp.clip(cells + 512, 0, 1023)
    return (c[..., 0] | (c[..., 1] << 10) | (c[..., 2] << 20)).astype(
        jnp.int32)


def median_alive(values: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """Median of values[alive] with static shapes (dead sort to +inf)."""
    v = jnp.where(alive, values, jnp.inf)
    v = jnp.sort(v)
    n = jnp.sum(alive.astype(jnp.int32))
    idx = jnp.maximum(n // 2, 0)
    return v[jnp.clip(idx, 0, values.shape[0] - 1)]


def default_cell_size(log_scales, alive, factor: float = 2.5):
    """Heuristic: gaussian scales track local point spacing (init sets
    scale = depth/f = pixel footprint, splatam.py:326-338), so a cell of a
    few spacings holds ~K surface points."""
    mean_scale = jnp.exp(jnp.mean(log_scales, axis=1))
    med = median_alive(mean_scale, alive)
    return jnp.clip(factor * med, 1e-4, 1e3)


def auto_table_size(n_points: int) -> int:
    """Hash table slots scaled to the point-array capacity.

    A fixed 2^16 table collides badly past ~10^5 points: occupied-cell
    count approaches/exceeds the table, colliding cells share one
    bucket, and the per-cell candidate cap then scans the WRONG cell's
    points (measured: pool recall 0.88 at 500k points vs 0.98 with a
    scaled table). One slot per point (next power of two, clamped to
    [2^16, 2^21]) keeps the per-bucket load ~1 occupied cell."""
    n = max(min(int(n_points), 1 << 21), 1 << 16)
    return 1 << (n - 1).bit_length()


def build_hash_grid(points, alive, cell_size, table_size: int = 0
                    ) -> HashGrid:
    """table_size 0 = auto (auto_table_size of the point capacity)."""
    if not table_size:
        table_size = auto_table_size(points.shape[0])
    cells = _cell_coords(points, cell_size)
    h = _hash_cells(cells, table_size)
    h = jnp.where(alive, h, table_size)  # dead points sort past every bucket
    order = jnp.argsort(h).astype(jnp.int32)
    # Bucket ranges over the hash-sorted order. NOT searchsorted: XLA
    # lowers searchsorted(h_sorted, arange(H)) to a binary-search while
    # loop — H random gathers x log2(C) steps; MEASURED 315 ms per call
    # (+314 ms of helper fusions) at H=2^21, C=1.2M on v5e, i.e. ~1.26
    # s/phase for the left+right pair. A bucket histogram via ONE 1D
    # scatter-add + cumsum gives the identical starts/ends in ~15 ms:
    # ends[b] = #points with h <= b, starts[b] = ends[b] - counts[b].
    counts = jnp.zeros((table_size,), jnp.int32).at[h].add(
        1, mode="drop")  # dead points carry h == table_size -> dropped
    ends = jnp.cumsum(counts, dtype=jnp.int32)
    starts = ends - counts
    cell_of = _pack_cells(cells)[order]
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    rec = jnp.concatenate(
        [bc(cell_of)[:, None], bc(order)[:, None],
         points[order].astype(jnp.float32)], axis=1)           # [C, 5]
    return HashGrid(order=order, cell_of=cell_of,
                    starts=starts, ends=ends, cell_size=cell_size,
                    table_size=table_size, rec=rec)


def knn_hash(grid: HashGrid, points, queries, k: int, cap: int = 24):
    """K nearest neighbors of queries [Q,3] among the hashed points [C,3].

    Returns (sq_dists [Q,k], indices [Q,k] into the original point array).
    Missing neighbors (sparse regions) have sq_dist = +inf.

    Candidate positions come from the grid's fused record (positions AT
    BUILD time) — when the grid is reused across a mapping phase the
    candidate ranking uses phase-start positions, the same staleness the
    frozen cells already carry; density values always use current params.
    """
    qcells = _cell_coords(queries, grid.cell_size)            # [Q,3]
    # 27 neighbor cells
    d = jnp.arange(-1, 2, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"),
                    axis=-1).reshape(-1, 3)                   # [27,3]
    ncells = qcells[:, None, :] + off[None, :, :]             # [Q,27,3]
    nh = _hash_cells(ncells, grid.table_size)                 # [Q,27]

    s = grid.starts[nh]                                       # [Q,27]
    e = grid.ends[nh]
    slots = s[..., None] + jnp.arange(cap, dtype=jnp.int32)   # [Q,27,cap]
    in_bucket = slots < e[..., None]

    # Each bucket's `cap` candidate rows are CONSECUTIVE in the hash-sorted
    # record table, so fetch them as Q*27 slice-windows (one index per
    # bucket) instead of Q*27*cap row indices — random access is index-
    # serial on TPU (ops/gather.gather_slices). The `cap` sentinel pad rows
    # keep end-of-array buckets from clamping onto real rows (their cell
    # field -1 never matches a packed cell, which is >= 0).
    pad = jnp.zeros((cap, 5), grid.rec.dtype)
    pad = pad.at[:, 0].set(
        jax.lax.bitcast_convert_type(jnp.int32(-1), jnp.float32))
    recs = gather_slices(jnp.concatenate([grid.rec, pad]), s, cap)
    #                                                   [Q,27,cap,5]
    bci = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    cand_cell = bci(recs[..., 0])                             # [Q,27,cap]
    # exact-cell check kills hash collisions AND duplicate candidates
    same_cell = cand_cell == _pack_cells(ncells)[:, :, None]
    valid = in_bucket & same_cell                             # [Q,27,cap]

    cand_idx = bci(recs[..., 1]).reshape(queries.shape[0], -1)  # [Q,27*cap]
    valid = valid.reshape(queries.shape[0], -1)
    cand_pts = recs[..., 2:5].reshape(queries.shape[0], -1, 3)
    diff = cand_pts - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)

    # approx_max_k lowers to the TPU PartialReduce op — far cheaper than
    # the full per-row sort of top_k. The hash KNN is already approximate
    # (cell cap, collision culling), and neighbor sets only feed the
    # stochastic iso density, so 0.99 recall among candidates is free.
    neg_top, arg = jax.lax.approx_max_k(-d2, k, recall_target=0.99)
    idx = jnp.take_along_axis(cand_idx, arg, axis=1)
    return -neg_top, idx
