"""Gaussian-axis sharding for the iso-surface loss (shard_map).

The second data-parallel axis SURVEY.md §2.3 identifies: the iso-loss KNN
and density are embarrassingly parallel over the Gaussian count N. Each
device holds a shard of the Gaussian arrays, finds the per-shard top-K
neighbors of the (replicated) query set with the exact blocked KNN, and
computes their density contributions locally; a tiny all-gather of
[n_dev, Q, K] (distance, contribution) pairs and a global top-K merge give
EXACTLY the serial K-nearest density. Gradients flow into each shard from
its own contributions (selection is an order statistic, stop-gradient).

Communication per evaluation: n_dev * Q * K * 2 floats (a few MB) over ICI
— negligible next to the O(Q * N / n_dev) local distance work.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..utils.transforms import normalize, quat_to_rotmat

GAUSS_AXIS = "gauss"


def make_gauss_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (GAUSS_AXIS,))


def _local_knn_contrib(queries, means, quats, log_scales, logit_ops,
                       alive, k):
    """Per-shard: for each query, the k nearest LOCAL Gaussians' squared
    distances and density contributions alpha * exp(-0.5 d^T Sigma^-1 d)."""
    d2_full = (jnp.sum(queries ** 2, -1, keepdims=True)
               + jnp.sum(means ** 2, -1)[None, :]
               - 2.0 * (queries @ means.T))                    # [Q, Ns]
    d2_full = jnp.where(alive[None, :], d2_full, jnp.inf)
    neg_top, idx = jax.lax.top_k(-jax.lax.stop_gradient(d2_full), k)
    d2 = -neg_top                                              # [Q, k]

    n_means = means[idx]                                       # [Q,k,3]
    n_quats = normalize(quats[idx])
    n_scales = jnp.maximum(jnp.exp(log_scales[idx]), 1e-5)
    n_op = jax.nn.sigmoid(logit_ops[idx][..., 0])
    valid = alive[idx] & jnp.isfinite(d2)

    R = quat_to_rotmat(n_quats)
    s_inv_sq = 1.0 / (n_scales ** 2 + 1e-8)
    delta = queries[:, None, :] - n_means
    rtd = jnp.einsum("qkij,qkj->qki", jnp.swapaxes(R, -1, -2), delta)
    quad = jnp.sum(s_inv_sq * rtd * rtd, axis=-1)
    contrib = jnp.where(valid, n_op * jnp.exp(-0.5 * quad), 0.0)
    d2 = jnp.where(valid, d2, jnp.inf)
    return d2, contrib


def iso_density_gauss_sharded(mesh: Mesh, queries, means, quats,
                              log_scales, logit_opacities, alive,
                              k: int = 16):
    """Density at `queries` [Q,3] from the K globally-nearest Gaussians,
    with the Gaussian arrays sharded over `mesh`. Exact (matches the
    serial K-NN density); differentiable into all Gaussian parameters."""
    n_dev = mesh.devices.size
    C = means.shape[0]
    pad = (-C) % n_dev

    def pad0(a):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])

    def shard_fn(q, m, qt, ls, lo, al):
        d2, contrib = _local_knn_contrib(q, m, qt, ls, lo, al[:, 0], k)
        # ranking is global: gather every shard's candidate DISTANCES
        # (order statistics only — stop-gradient), pick the global top-k,
        # then each device sums the selected contributions it OWNS and a
        # psum combines the partials. Gradients flow only from a device's
        # own contributions; no cotangent double counting.
        d2_all = jax.lax.all_gather(jax.lax.stop_gradient(d2), GAUSS_AXIS,
                                    axis=1, tiled=True)        # [Q, D*k]
        _, arg = jax.lax.top_k(-d2_all, k)
        owner = arg // k
        local_slot = arg % k
        mine = owner == jax.lax.axis_index(GAUSS_AXIS)
        sel_local = jnp.take_along_axis(contrib, local_slot, axis=1)
        partial = jnp.sum(jnp.where(mine, sel_local, 0.0), axis=-1)
        return jax.lax.psum(partial, GAUSS_AXIS)               # [Q]

    density = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS),
                  P(GAUSS_AXIS), P(GAUSS_AXIS)),
        out_specs=P(),
        check_rep=False))(
        queries, pad0(means), pad0(quats), pad0(log_scales),
        pad0(logit_opacities), pad0(alive[:, None]))
    return density
