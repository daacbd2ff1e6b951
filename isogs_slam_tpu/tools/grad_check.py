"""Kernel gradient-correctness harness — central finite differences vs
jax.grad for every differentiable kernel (flat loss, iso-surface loss,
rasterizer fwd/bwd through both compositing backends).

This is the port of the reference's standalone `grad_check` binary
(cpp/tests/grad_check.cpp: computeNumericalGradient :17-49, per-loss checks
:94+, pass criteria max_diff < 1e-4 && rel < 10% :54-89). Run:

    python -m isogs_slam_tpu.tools.grad_check [--n 512] [--eps 1e-3]

Exit code 0 iff every check passes.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp


class GradStats:
    def __init__(self, name, analytic, numerical, abs_tol, rel_tol):
        d = np.abs(analytic - numerical)
        self.name = name
        self.max_diff = float(d.max()) if d.size else 0.0
        self.mean_diff = float(d.mean()) if d.size else 0.0
        scale = float(np.abs(numerical).max()) + 1e-12
        self.rel = self.max_diff / scale
        self.passed = self.max_diff < abs_tol or self.rel < rel_tol

    def report(self):
        flag = "PASS" if self.passed else "FAIL"
        print(f"  [{flag}] {self.name}: max_diff={self.max_diff:.3e} "
              f"mean_diff={self.mean_diff:.3e} rel={self.rel:.2%}")
        return self.passed


def numerical_gradient(f, x, eps, samples=None, rng=None):
    """Central differences; for large x only `samples` random entries are
    probed (grad_check.cpp computes all entries; sampling keeps the harness
    fast at framework scale)."""
    x = np.asarray(x, np.float64)
    flat = x.reshape(-1)
    if samples is not None and flat.size > samples:
        idx = (rng or np.random.default_rng(0)).choice(
            flat.size, samples, replace=False)
    else:
        idx = np.arange(flat.size)
    g = np.zeros(flat.size)
    for i in idx:
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        g[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * eps)
    return g.reshape(x.shape), idx


def _check(name, loss_fn, x0, eps, abs_tol, rel_tol, samples, rng):
    loss_fn = jax.jit(loss_fn)
    f64 = lambda arr: float(loss_fn(jnp.asarray(arr, jnp.float32)))
    analytic = np.asarray(jax.jit(jax.grad(
        lambda a: loss_fn(a)))(jnp.asarray(x0, jnp.float32)), np.float64)
    numerical, idx = numerical_gradient(f64, x0, eps, samples, rng)
    flat_a = analytic.reshape(-1)[idx.reshape(-1)] \
        if idx.size != analytic.size else analytic.reshape(-1)
    flat_n = numerical.reshape(-1)[idx.reshape(-1)] \
        if idx.size != analytic.size else numerical.reshape(-1)
    return GradStats(name, flat_a, flat_n, abs_tol, rel_tol)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512, help="num gaussians")
    p.add_argument("--eps", type=float, default=1e-3)
    p.add_argument("--samples", type=int, default=64,
                   help="finite-diff probes per tensor")
    p.add_argument("--abs-tol", type=float, default=1e-4)
    p.add_argument("--rel-tol", type=float, default=0.10)
    args = p.parse_args(argv)
    rng = np.random.default_rng(0)
    n = args.n

    from ..core.camera import Camera
    from ..ops.iso_loss import flat_loss, iso_surface_loss
    from ..ops.rasterize import RasterConfig, render_rgbd_sil

    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    means[:, 2] += 2.5
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    logs = np.log(rng.uniform(0.03, 0.1, (n, 3))).astype(np.float32)
    ops = rng.uniform(-1, 2, (n, 1)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    alive[-n // 8:] = False
    aj = jnp.asarray(alive)
    key = jax.random.PRNGKey(0)

    results = []
    print("== Flat loss (compute_flat_loss semantics) ==")
    results.append(_check(
        "d flat / d log_scales",
        lambda ls: flat_loss(ls, aj), logs, args.eps,
        args.abs_tol, args.rel_tol, args.samples, rng))

    print("== Iso-surface loss (exact KNN) ==")
    mj, qj, oj = jnp.asarray(means), jnp.asarray(quats), jnp.asarray(ops)
    lj = jnp.asarray(logs)

    def iso_wrt(name, builder, x0):
        return _check(name, builder, x0, args.eps, args.abs_tol,
                      args.rel_tol, args.samples, rng)

    results.append(iso_wrt(
        "d iso / d means",
        lambda m: iso_surface_loss(m, qj, lj, oj, aj, key, 128, 8,
                                   knn_method="exact")[0], means))
    results.append(iso_wrt(
        "d iso / d logit_opacities",
        lambda o: iso_surface_loss(mj, qj, lj, o, aj, key, 128, 8,
                                   knn_method="exact")[0], ops))
    results.append(iso_wrt(
        "d iso / d log_scales",
        lambda ls: iso_surface_loss(mj, qj, ls, oj, aj, key, 128, 8,
                                    knn_method="exact")[0], logs))

    print("== Rasterizer (both compositing backends) ==")
    cam = Camera(width=64, height=48, fx=48., fy=48., cx=31.5, cy=23.5)
    for backend in ("xla", "pallas-interpret"):
        cfg = RasterConfig(max_per_tile=128, tile_chunk=12,
                           backend=backend)

        def render_loss(m, q=qj, ls=lj, o=oj, c=jnp.asarray(rgb)):
            im, depth, sil, dsq, aux = render_rgbd_sil(
                m, q, ls, o, c, aj, cam, cfg)
            return (jnp.sum(im * im) + jnp.sum(depth)
                    + 0.3 * jnp.sum(sil))

        results.append(_check(
            f"d render / d means_cam [{backend}]", render_loss, means,
            args.eps, max(args.abs_tol, 1e-2), args.rel_tol,
            args.samples, rng))
        results.append(_check(
            f"d render / d logit_opacities [{backend}]",
            lambda o: render_loss(mj, o=o), ops,
            args.eps, max(args.abs_tol, 1e-2), args.rel_tol,
            args.samples, rng))

    ok = all(r.report() for r in results)
    print("\nALL PASS" if ok else "\nFAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
