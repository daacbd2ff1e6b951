"""Non-finite robustness of the meshing path (found in the r5s6 chain:
TPU default-precision matmuls in the density quadratic form overflowed
exp to inf; marching tets then interpolated inf corners into NaN
vertices — 39% of the 1.1M-Gaussian mesh — and sample_surface crashed
the chamfer eval on the NaN face areas)."""
import numpy as np
import pytest


@pytest.mark.smoke
def test_marching_sanitizes_inf_grid():
    from isogs_slam_tpu.mesh.marching import marching_tetrahedra

    # a sphere-ish blob with an inf spike next to the isosurface
    n = 24
    xs = np.linspace(-1, 1, n, dtype=np.float32)
    g = np.exp(-(xs[:, None, None] ** 2 + xs[None, :, None] ** 2
                 + xs[None, None, :] ** 2) * 4.0) * 2.0
    g[n // 2, n // 2, n // 2] = np.inf
    g[n // 2 + 1, n // 2, n // 2] = np.nan
    v, f = marching_tetrahedra(g, 1.0, use_native=False)
    assert v.shape[0] > 0 and f.shape[0] > 0
    assert np.isfinite(v).all()


@pytest.mark.smoke
def test_sample_surface_degenerate_faces():
    from isogs_slam_tpu.mesh.marching import sample_surface

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [np.nan, np.nan, np.nan]], np.float32)
    faces = np.array([[0, 1, 2],     # real
                      [0, 1, 1],     # zero-area
                      [0, 1, 3]],    # NaN vertex
                     np.int32)
    pts = sample_surface(verts, faces, 256)
    assert pts.shape == (256, 3)
    assert np.isfinite(pts).all()


@pytest.mark.smoke
def test_density_grid_bounded_by_total_opacity():
    """quad is clamped PSD: density can never exceed sum of opacities
    (exp <= 1), so the inf-overflow failure mode is structurally gone."""
    import jax.numpy as jnp
    from isogs_slam_tpu.mesh.density import (GridSpec, density_grid,
                                             make_grid)

    rng = np.random.default_rng(0)
    n = 64
    means = jnp.asarray(rng.normal(0, 0.3, (n, 3)) + [5.0, 5.0, 5.0],
                        jnp.float32)   # far from origin: worst case
    dens, _ = density_grid(
        means,
        jnp.full((n, 3), -6.9, jnp.float32),     # ~1 mm flakes
        jnp.tile(jnp.asarray([1., 0, 0, 0], jnp.float32), (n, 1)),
        jnp.full((n, 1), 10.0, jnp.float32),     # opacity ~ 1
        jnp.ones((n,), bool),
        make_grid(np.asarray(means), 0.05, padding=0.2),
        max_isect=65536, max_per_block=128)
    dens = np.asarray(dens)
    assert np.isfinite(dens).all()
    assert dens.max() <= n + 1e-3
