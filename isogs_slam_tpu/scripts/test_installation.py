"""Installation / environment smoke check (the reference README references
a scripts/test_installation.py that is absent from its snapshot; this is
the working equivalent).

    python -m isogs_slam_tpu.scripts.test_installation

Checks: JAX backend + devices, a differentiable render (both compositing
backends where applicable), the iso/flat losses, the mesh extractor, the
native library (optional), and dataset/config loading.
"""
from __future__ import annotations

import sys

import numpy as np


def main():
    ok = True

    def check(name, fn):
        nonlocal ok
        try:
            msg = fn()
            print(f"  [OK]   {name}" + (f" — {msg}" if msg else ""))
        except Exception as e:
            ok = False
            print(f"  [FAIL] {name}: {e.__class__.__name__}: {e}")

    print("== isogs_slam_tpu installation check ==")

    def _jax():
        import jax
        devs = jax.devices()
        return f"backend={jax.default_backend()}, devices={len(devs)} " \
               f"({devs[0].platform})"
    check("jax devices", _jax)

    def _render():
        import jax, jax.numpy as jnp
        from isogs_slam_tpu.core.camera import Camera
        from isogs_slam_tpu.ops.rasterize import (RasterConfig,
                                                  render_rgbd_sil)
        rng = np.random.default_rng(0)
        n = 500
        means = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32
                            ).at[:, 2].add(2.5)
        quats = jnp.tile(jnp.array([1., 0, 0, 0]), (n, 1))
        logs = jnp.full((n, 3), np.log(0.08))
        ops = jnp.ones((n, 1))
        rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        alive = jnp.ones(n, bool)
        cam = Camera(width=64, height=48, fx=48., fy=48., cx=31.5, cy=23.5)
        cfg = RasterConfig(max_per_tile=128, tile_chunk=12)

        def loss(m):
            im, d, s, _, _ = render_rgbd_sil(m, quats, logs, ops, rgb,
                                             alive, cam, cfg)
            return jnp.sum(im) + jnp.sum(d)
        v, g = jax.value_and_grad(loss)(means)
        assert np.isfinite(float(v)) and bool(jnp.all(jnp.isfinite(g)))
        return f"loss={float(v):.2f}, backend={cfg.resolve_backend()}"
    check("differentiable render (fwd+bwd)", _render)

    def _losses():
        import jax, jax.numpy as jnp
        from isogs_slam_tpu.ops.iso_loss import flat_loss, iso_surface_loss
        rng = np.random.default_rng(0)
        n = 2000
        means = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
        quats = jnp.tile(jnp.array([1., 0, 0, 0]), (n, 1))
        logs = jnp.full((n, 3), np.log(0.05))
        ops = jnp.zeros((n, 1))
        alive = jnp.ones(n, bool)
        f = flat_loss(logs, alive)
        il, dens = iso_surface_loss(means, quats, logs, ops, alive,
                                    jax.random.PRNGKey(0), 256, 8)
        assert np.isfinite(float(f)) and np.isfinite(float(il))
        return f"flat={float(f):.4f}, iso={float(il):.4f}"
    check("IsoGS losses (flat + iso with hash KNN)", _losses)

    def _mesh():
        from isogs_slam_tpu.mesh.marching import marching_tetrahedra
        lin = np.linspace(-1, 1, 24)
        X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
        dens = np.exp(-(X**2 + Y**2 + Z**2) / 0.2)
        v, f = marching_tetrahedra(dens, 0.5, (lin[1] - lin[0],) * 3,
                                   (-1,) * 3)
        assert len(f) > 100
        return f"{len(v)} verts / {len(f)} faces"
    check("mesh extraction", _mesh)

    def _native():
        from isogs_slam_tpu.native_ext import available
        return "built" if available() else \
            "not built (optional; run native/build.sh)"
    check("native library", _native)

    def _configs():
        import os
        from isogs_slam_tpu.slam.config import (inject_defaults,
                                                load_experiment_config)
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cfg = load_experiment_config(
            os.path.join(root, "configs", "replica", "splatam.py"))
        inject_defaults(cfg)
        return f"replica config OK (scene {cfg['run_name']})"
    check("experiment configs", _configs)

    print("\nAll checks passed." if ok else "\nSome checks FAILED.")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
