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
    # lazy (sparse) mode only: pytree of per-ROW step counts ([N, 1] int32
    # per leaf). None = dense torch semantics (every row steps every
    # iteration, zero-grad rows included).
    rcount: object = None


def init(params, lazy: bool = False) -> AdamState:
    z = lambda p: jnp.zeros_like(p)
    rc = (jax.tree.map(lambda p: jnp.zeros((p.shape[0], 1), jnp.int32),
                       params) if lazy else None)
    return AdamState(mu=jax.tree.map(z, params), nu=jax.tree.map(z, params),
                     count=jnp.zeros((), jnp.int32), rcount=rc)


def step(params, grads, state: AdamState, lrs, eps: float = 1e-8,
         b1: float = 0.9, b2: float = 0.999):
    """One Adam step. `lrs` is a pytree of scalars matching `params`
    (per-param-group lr, splatam.py:404).

    Dense mode (state.rcount is None): exact torch.optim.Adam — every row
    updates every call, including rows whose gradient is zero (their
    moments decay and the param keeps stepping along stale momentum).

    Lazy mode (state initialized with lazy=True; all leaves [N, C]):
    sparse/lazy Adam — a row updates (moments, param, its bias-correction
    step count) ONLY on calls where that leaf's row gradient is nonzero.
    Used by the fast-mapping stripe subset: per-visit dynamics then match
    the reference's dense Adam step-for-step in *visit time*, instead of
    appending ~(tile_subsample - 1) pure-momentum echo steps after each
    visit (a ~2.4x overshoot per visit at sub=4 that the reference never
    takes, since its full-image loss touches every visible row every
    iteration — scripts/splatam.py:402-408 + 1412-1491)."""
    count = state.count + 1
    if state.rcount is None:
        c = count.astype(jnp.float32)
        # 1 - b^c via expm1/log1p: avoids f32 cancellation (torch computes
        # the bias corrections in float64 python scalars; matches ~1 ulp)
        bc1 = -jnp.expm1(c * jnp.log1p(jnp.float32(b1 - 1.0)))
        bc2 = -jnp.expm1(c * jnp.log1p(jnp.float32(b2 - 1.0)))

        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)

        def upd(p, m, v, lr):
            mhat = m / bc1
            vhat = v / bc2
            return p - lr * mhat / (jnp.sqrt(vhat) + eps)

        new_params = jax.tree.map(upd, params, mu, nu, lrs)
        return new_params, AdamState(mu=mu, nu=nu, count=count)

    touched = jax.tree.map(
        lambda g: jnp.any(g != 0, axis=1, keepdims=True), grads)
    rcount = jax.tree.map(lambda rc, t: rc + t.astype(rc.dtype),
                          state.rcount, touched)
    mu = jax.tree.map(lambda m, g, t: jnp.where(t, b1 * m + (1 - b1) * g, m),
                      state.mu, grads, touched)
    nu = jax.tree.map(
        lambda v, g, t: jnp.where(t, b2 * v + (1 - b2) * g * g, v),
        state.nu, grads, touched)

    def upd(p, m, v, rc, t, lr):
        c = jnp.maximum(rc, 1).astype(jnp.float32)
        bc1 = -jnp.expm1(c * jnp.log1p(jnp.float32(b1 - 1.0)))
        bc2 = -jnp.expm1(c * jnp.log1p(jnp.float32(b2 - 1.0)))
        return jnp.where(t, p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
                         p)

    new_params = jax.tree.map(upd, params, mu, nu, rcount, touched, lrs)
    return new_params, AdamState(mu=mu, nu=nu, count=count, rcount=rcount)


def mask_rows(state: AdamState, keep_order: jnp.ndarray) -> AdamState:
    """Row-gather the moments (the pytree analog of exp_avg surgery in
    remove_points/cat_params_to_optimizer, slam_external.py:122-160)."""
    g = lambda a: a[keep_order] if a.ndim >= 1 else a
    rc = (None if state.rcount is None
          else jax.tree.map(g, state.rcount))
    return AdamState(mu=jax.tree.map(g, state.mu),
                     nu=jax.tree.map(g, state.nu), count=state.count,
                     rcount=rc)


def zero_rows(state: AdamState, rows: jnp.ndarray) -> AdamState:
    """Zero moments for given row mask (update_params_and_optimizer semantics
    when a param is replaced wholesale, slam_external.py:107-119). Lazy
    per-row counts are NOT reset — torch keeps the param group's global
    step across the same surgery, so the first post-reset grad is
    bias-corrected as a warm step there too."""
    def z(a):
        if a.ndim >= 1 and a.shape[0] == rows.shape[0]:
            return jnp.where(rows.reshape((-1,) + (1,) * (a.ndim - 1)),
                             jnp.zeros_like(a), a)
        return a
    return AdamState(mu=jax.tree.map(z, state.mu),
                     nu=jax.tree.map(z, state.nu), count=state.count,
                     rcount=state.rcount)
