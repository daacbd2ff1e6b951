"""Minimal Adam with torch.optim.Adam semantics and per-leaf learning rates.

Mirrors `initialize_optimizer` (scripts/splatam.py:402-408): per-parameter
learning rates, betas (0.9, 0.999), eps 1e-8 (tracking) / 1e-15 (mapping),
bias correction, and eps added *after* sqrt of the bias-corrected second
moment — the exact torch update rule, so step-for-step trajectories match.

Written by hand instead of optax because the SLAM loop re-creates the
optimizer per frame and performs Adam-state surgery on densify/prune
(slam_external.py:107-160); with the state as a plain pytree those surgeries
are one-line tree ops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: object   # pytree like params
    nu: object   # pytree like params
    count: jnp.ndarray  # [] int32


def init(params) -> AdamState:
    z = lambda p: jnp.zeros_like(p)
    return AdamState(mu=jax.tree.map(z, params), nu=jax.tree.map(z, params),
                     count=jnp.zeros((), jnp.int32))


def step(params, grads, state: AdamState, lrs, eps: float = 1e-8,
         b1: float = 0.9, b2: float = 0.999):
    """One Adam step. `lrs` is a pytree of scalars matching `params`
    (per-param-group lr, splatam.py:404)."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    # 1 - b^c via expm1/log1p: avoids f32 cancellation (torch computes the
    # bias corrections in float64 python scalars; this matches to ~1 ulp)
    bc1 = -jnp.expm1(c * jnp.log1p(jnp.float32(b1 - 1.0)))
    bc2 = -jnp.expm1(c * jnp.log1p(jnp.float32(b2 - 1.0)))

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def upd(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree.map(upd, params, mu, nu, lrs)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def mask_rows(state: AdamState, keep_order: jnp.ndarray) -> AdamState:
    """Row-gather the moments (the pytree analog of exp_avg surgery in
    remove_points/cat_params_to_optimizer, slam_external.py:122-160)."""
    g = lambda a: a[keep_order] if a.ndim >= 1 else a
    return AdamState(mu=jax.tree.map(g, state.mu),
                     nu=jax.tree.map(g, state.nu), count=state.count)


def zero_rows(state: AdamState, rows: jnp.ndarray) -> AdamState:
    """Zero moments for given row mask (update_params_and_optimizer semantics
    when a param is replaced wholesale, slam_external.py:107-119)."""
    def z(a):
        if a.ndim >= 1 and a.shape[0] == rows.shape[0]:
            return jnp.where(rows.reshape((-1,) + (1,) * (a.ndim - 1)),
                             jnp.zeros_like(a), a)
        return a
    return AdamState(mu=jax.tree.map(z, state.mu),
                     nu=jax.tree.map(z, state.nu), count=state.count)
