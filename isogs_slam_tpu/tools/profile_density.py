"""Mesh density-pass steady-state profile (VERDICT round-2 item 7).

The round-1 observation (94-318 s at 500k Gaussians / 253^3, tunnel-noisy,
compiles included) never separated compile latency from steady state. This
tool synthesizes a surface-like Gaussian cloud at the requested scale,
runs mesh.density.density_grid once to compile + warm, then reports the
MINIMUM of N timed repeats (the steady state) plus the block-cull hit
rate (occupied candidate slots / capacity). Reference comparison:
scripts/extract_mesh_fast.py:191-386 does density + marching cubes +
cleanup in ~1 min on a 4090 (BASELINE.md).

Run (TPU):  python -m isogs_slam_tpu.tools.profile_density \
                [--n 500000] [--voxel 0.02] [--reps 3]
CPU smoke:  PYTHONPATH= JAX_PLATFORMS=cpu python -m \
                isogs_slam_tpu.tools.profile_density --n 20000 --voxel 0.08
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _surface_cloud(n: int, seed: int = 0):
    """Gaussians on the walls of a room-like box (the density workload is
    surface-dominated after IsoGS flattening, not volumetric)."""
    rng = np.random.default_rng(seed)
    per = -(-n // 6)
    pts = []
    for axis in range(3):
        for side in (-1.0, 1.0):
            m = max(per, 1)
            p = rng.uniform(-2.0, 2.0, (m, 3))
            p[:, axis] = side * 2.0 + rng.normal(0, 0.01, m)
            pts.append(p)
    pts = np.concatenate(pts)[:n].astype(np.float32)
    return pts


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500000)
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-isect-per-gauss", type=float, default=8.0)
    ap.add_argument("--block-chunk", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from isogs_slam_tpu.mesh.density import density_grid, make_grid

    n = args.n
    means = _surface_cloud(n)
    rng = np.random.default_rng(1)
    log_scales = np.log(rng.uniform(0.01, 0.03, (n, 3))).astype(np.float32)
    log_scales[:, 2] = np.log(0.004)  # flattened flakes (post-IsoGS)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    logit_op = np.full((n, 1), 2.0, np.float32)

    spec = make_grid(means, voxel_size=args.voxel, padding=0.3)
    dims = spec.dims
    max_isect = int(args.max_isect_per_gauss * n)
    print(f"grid {dims} = {np.prod(dims) / 1e6:.1f}M voxels, "
          f"{spec.num_blocks} blocks, {n} gaussians, "
          f"max_isect {max_isect / 1e6:.1f}M, backend "
          f"{jax.default_backend()}")

    a = (jnp.asarray(means), jnp.asarray(log_scales), jnp.asarray(quats),
         jnp.asarray(logit_op), jnp.ones(n, bool))

    t0 = time.perf_counter()
    dens, ovf = density_grid(*a, spec, max_isect=max_isect,
                             block_chunk=args.block_chunk)
    dens.block_until_ready()
    t_first = time.perf_counter() - t0
    print(f"first call (compile + run): {t_first:.1f}s, "
          f"overflow={int(ovf)}")
    # demand-driven capacity, same contract as the raster isect cap: a
    # truncated density pass under-reports density near block borders
    # (chain r3s3 measured 1.18M dropped at 4M cap / 500k flakes)
    while int(ovf) > 0:
        max_isect = int((max_isect + int(ovf)) * 1.25)
        print(f"overflow {int(ovf)}: growing max_isect -> "
              f"{max_isect / 1e6:.1f}M (recompiling)")
        t0 = time.perf_counter()
        dens, ovf = density_grid(*a, spec, max_isect=max_isect,
                                 block_chunk=args.block_chunk)
        dens.block_until_ready()
        t_first = time.perf_counter() - t0

    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        dens, ovf = density_grid(*a, spec, max_isect=max_isect,
                                 block_chunk=args.block_chunk)
        dens.block_until_ready()
        ts.append(time.perf_counter() - t0)
    steady = min(ts)
    occ = float(jnp.mean((dens > 0.5).astype(jnp.float32)))
    res = {
        "n_gauss": n, "voxel": args.voxel, "dims": list(dims),
        "blocks": int(spec.num_blocks), "max_isect": max_isect,
        "backend": jax.default_backend(),
        "first_call_s": round(t_first, 2),
        "steady_state_s": round(steady, 2),
        "reps_s": [round(t, 2) for t in ts],
        "overflow": int(ovf),
        "occupied_voxel_frac": round(occ, 4),
    }
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
