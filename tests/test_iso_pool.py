"""Per-phase frozen iso-KNN pool (ops/iso_loss.build_iso_knn_pool).

The pool freezes neighbor INDICES for a mapping phase; density values and
gradients are always evaluated at current params. Pins: pool neighbor sets
match brute force (modulo hash-cap recall), and the pooled loss estimates
the same quantity as the fresh-KNN loss.
"""
import numpy as np
import jax
import jax.numpy as jnp

from isogs_slam_tpu.ops.iso_loss import (build_iso_knn_pool,
                                         iso_surface_loss, knn_blocked)
import pytest

pytestmark = pytest.mark.smoke  # sub-5-min CI subset


def _cloud(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.stack([uv[:, 0], uv[:, 1],
                    0.3 * np.sin(2 * uv[:, 0]) + 0.01 * rng.normal(size=n)],
                   axis=1)
    means = jnp.asarray(pts, jnp.float32)
    quats = jnp.asarray(rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]),
                        jnp.float32)
    ls = jnp.full((n, 3), np.log(0.05), jnp.float32)
    op = jnp.asarray(rng.normal(0.5, 0.3, (n, 1)), jnp.float32)
    alive = jnp.ones(n, bool).at[-64:].set(False)
    return means, quats, ls, op, alive


def test_pool_neighbors_match_bruteforce():
    means, quats, ls, op, alive = _cloud()
    key = jax.random.PRNGKey(1)
    k = 8
    pool = build_iso_knn_pool(means, ls, alive, key, pool_size=256, k=k,
                              knn_method="hash", hash_cap=24)
    d2_bf, nbr_bf = knn_blocked(means[pool.q_idx], means, alive, k,
                                block=2048)
    hits = 0
    for i in range(pool.q_idx.shape[0]):
        got = set(np.asarray(pool.nbr[i])[np.asarray(pool.nbr_ok[i])])
        want = set(np.asarray(nbr_bf[i]))
        hits += len(got & want)
    recall = hits / (pool.q_idx.shape[0] * k)
    assert recall > 0.95, recall


def test_pooled_loss_estimates_fresh_loss():
    means, quats, ls, op, alive = _cloud(seed=2)
    key = jax.random.PRNGKey(3)
    kw = dict(sample_size=1024, k=8, knn_method="exact", knn_block=2048)
    l_fresh, md_fresh = iso_surface_loss(means, quats, ls, op, alive, key,
                                         **kw)
    pool = build_iso_knn_pool(means, ls, alive, jax.random.PRNGKey(7),
                              pool_size=1984, k=8, knn_method="exact",
                              knn_block=2048)
    l_pool, md_pool = iso_surface_loss(means, quats, ls, op, alive, key,
                                       pool=pool, **kw)
    # same estimand, different sampling -> agree within stochastic error
    assert abs(float(l_pool) - float(l_fresh)) / float(l_fresh) < 0.15, \
        (float(l_pool), float(l_fresh))
    assert abs(float(md_pool) - float(md_fresh)) / float(md_fresh) < 0.15

    # gradients flow to current params through the pooled path
    def loss(m):
        return iso_surface_loss(m, quats, ls, op, alive, key, pool=pool,
                                **kw)[0]
    g = jax.grad(loss)(means)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0
