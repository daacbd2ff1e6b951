"""Mesh stack: density correctness, isosurface extraction, file I/O round
trips, geometry metrics (reference capabilities: extract_mesh_fast.py,
eval_mesh_geometry.py)."""
import os

import numpy as np
import pytest

from isogs_slam_tpu.mesh.density import compute_density
from isogs_slam_tpu.mesh.geometry_eval import evaluate_mesh_geometry
from isogs_slam_tpu.mesh.marching import (largest_component,
                                          marching_tetrahedra,
                                          sample_surface, vertex_normals)
from isogs_slam_tpu.mesh.meshio import (read_ply, write_obj, write_ply_mesh,
                                        write_stl)

pytestmark = pytest.mark.smoke  # sub-5-min CI subset


def _sphere_mesh(r=0.5, n=40, center=(0.0, 0.0, 0.0)):
    lin = np.linspace(-1.2, 1.2, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    d = -np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2
                 + (Z - center[2]) ** 2)  # level = -r
    sp = (lin[1] - lin[0],) * 3
    return marching_tetrahedra(d, -r, spacing=sp, origin=(-1.2,) * 3)


def test_density_matches_analytic_gaussian():
    params = {
        "means3D": np.array([[0.1, -0.2, 0.3]], np.float32),
        "log_scales": np.full((1, 3), np.log(0.15), np.float32),
        "unnorm_rotations": np.array([[1, 0, 0, 0]], np.float32),
        "logit_opacities": np.array([[2.0]], np.float32),
    }
    dens, spec = compute_density(params, voxel_size=0.06, padding=0.4)
    ii = np.stack(np.meshgrid(*[np.arange(d) for d in spec.dims],
                              indexing="ij"), -1)
    pos = np.asarray(spec.origin) + ii * np.asarray(spec.spacing)
    r2 = np.sum((pos - params["means3D"][0]) ** 2, axis=-1)
    op = 1 / (1 + np.exp(-2.0))
    expect = np.where(np.sqrt(r2) < 3 * 0.15,
                      op * np.exp(-0.5 * r2 / 0.15 ** 2), 0.0)
    assert np.max(np.abs(dens - expect)) < 1e-4


def test_marching_tetrahedra_sphere():
    v, f = _sphere_mesh(r=0.5)
    assert len(v) > 500 and len(f) > 1000
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.5) < 0.01 and r.std() < 0.01
    # watertight: every edge shared by exactly two faces
    e = np.sort(np.stack([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
                .reshape(-1, 2), axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    assert (cnt == 2).all()
    # outward winding
    vn = vertex_normals(v, f)
    outward = np.sum(vn * v / np.linalg.norm(v, axis=1, keepdims=True),
                     axis=1)
    assert (outward > 0).mean() > 0.99


def test_largest_component_and_io(tmp_path):
    v1, f1 = _sphere_mesh(r=0.4, center=(0.0, 0.0, 0.0))
    v2, f2 = _sphere_mesh(r=0.15, center=(0.7, 0.7, 0.7))
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])
    vc, fc = largest_component(v, f)
    assert len(vc) == len(v1) and len(fc) == len(f1)

    ply = os.path.join(tmp_path, "m.ply")
    write_ply_mesh(ply, vc, fc, vertex_normals=vertex_normals(vc, fc))
    back = read_ply(ply)
    assert np.allclose(back["vertices"], vc, atol=1e-6)
    assert np.array_equal(back["faces"], fc)
    write_obj(os.path.join(tmp_path, "m.obj"), vc, fc)
    write_stl(os.path.join(tmp_path, "m.stl"), vc, fc)
    assert os.path.getsize(os.path.join(tmp_path, "m.stl")) == \
        84 + 50 * len(fc)
    # ascii round trip too
    ply_a = os.path.join(tmp_path, "ma.ply")
    write_ply_mesh(ply_a, vc[:100], fc[:0], binary=False)
    back_a = read_ply(ply_a)
    assert np.allclose(back_a["vertices"], vc[:100], atol=1e-4)


def test_geometry_eval_identity_and_offset():
    v, f = _sphere_mesh(r=0.5)
    # identity chamfer is bounded by sampling density: ~sqrt(area/n)/2
    m = evaluate_mesh_geometry(v, f, v, f, num_samples=5000)
    assert m["chamfer_distance"] < 0.02
    assert m["f_score"] > 0.99
    v_off = v + np.array([0.2, 0.0, 0.0], np.float32)
    m2 = evaluate_mesh_geometry(v_off, f, v, f, num_samples=5000)
    assert m2["chamfer_distance"] > m["chamfer_distance"] + 0.05


def test_end_to_end_gaussian_shell_mesh():
    """Gaussians arranged on a sphere -> density -> mesh near that sphere."""
    rng = np.random.default_rng(0)
    n = 2000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    params = {
        "means3D": (0.6 * dirs).astype(np.float32),
        "log_scales": np.full((n, 3), np.log(0.05), np.float32),
        "unnorm_rotations": np.tile(np.array([1, 0, 0, 0], np.float32),
                                    (n, 1)),
        "logit_opacities": np.full((n, 1), 2.0, np.float32),
    }
    from isogs_slam_tpu.scripts.extract_mesh_fast import \
        extract_mesh_from_params
    v, f, stats = extract_mesh_from_params(params, voxel_size=0.05,
                                           iso_level=1.0, padding=0.3)
    assert len(f) > 500
    r = np.linalg.norm(sample_surface(v, f, 2000), axis=1)
    assert abs(np.median(r) - 0.6) < 0.1


def test_zbuffer_depth_matches_analytic_sphere():
    """Software z-buffer (mesh/zbuffer.py): rendering a marching-tets
    sphere gives depth ~ analytic ray-sphere front intersection."""
    from isogs_slam_tpu.mesh.zbuffer import render_mesh_depth
    verts, faces = _sphere_mesh(r=0.5, n=48)
    verts = verts + np.array([0.0, 0.0, 2.0], verts.dtype)  # push in front
    W, H, f = 80, 64, 60.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    w2c = np.eye(4)
    depth = render_mesh_depth(verts, faces, w2c, K, W, H)
    assert depth.shape == (H, W)
    # center pixel: ray through sphere center -> front depth = 2 - 0.5
    cyx = depth[H // 2 - 1: H // 2 + 1, W // 2 - 1: W // 2 + 1]
    assert np.all(cyx > 0)
    assert np.allclose(cyx, 1.5, atol=0.06), cyx
    # analytic check across all hit pixels (ray-sphere front root)
    ys, xs = np.nonzero(depth > 0)
    d = depth[ys, xs]
    # ray direction for pixel (x, y): ((x+0.5-cx)/f, (y+0.5-cy)/f, 1)
    rx = (xs + 0.5 - W / 2) / f
    ry = (ys + 0.5 - H / 2) / f
    a = rx ** 2 + ry ** 2 + 1.0
    b = -2.0 * 2.0  # -2 * dot(dir, center)=-2*dz*2 with dz=1 component
    c = 4.0 - 0.25
    disc = b * b - 4 * a * c
    inside = disc > 0
    t_front = (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a)
    z_analytic = t_front  # z component of dir is 1 -> depth = t
    err = np.abs(d[inside] - z_analytic[inside])
    # mesh is a discretized sphere: allow ~1.5 voxel (2.4/48*1.5) error
    assert np.median(err) < 0.05, np.median(err)
    # hit points lie on (near) the sphere surface
    assert (np.sqrt((rx * d) ** 2 + (ry * d) ** 2 + (d - 2.0) ** 2)
            < 0.6).mean() > 0.95


@pytest.mark.smoke
def test_density_sharded_matches_serial():
    """density_grid_sharded over the 8-device virtual mesh == serial
    density_grid bit-for-bit (blocks are embarrassingly parallel; the
    shard only changes which device evaluates which block range)."""
    rng = np.random.default_rng(11)
    n = 400
    params = {
        "means3D": rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.05, 0.2, (n, 3))
                             ).astype(np.float32),
        "unnorm_rotations": rng.normal(size=(n, 4)).astype(np.float32),
        "logit_opacities": rng.normal(0.5, 1.0, (n, 1)).astype(np.float32),
    }
    d_serial, spec = compute_density(params, voxel_size=0.08, padding=0.3)
    assert spec.num_blocks > 8  # each device gets real blocks
    d_shard, _ = compute_density(params, voxel_size=0.08, padding=0.3,
                                 shard_devices=8)
    np.testing.assert_array_equal(d_shard, d_serial)
