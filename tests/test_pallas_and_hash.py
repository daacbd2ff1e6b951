"""Pallas compositing kernel parity, spatial-hash KNN recall, and the
dead-row NaN regression (mirrors cpp/tests/grad_check.cpp's role as the
kernel-correctness harness, SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import (append_rows, empty_state,
                                           new_gaussian_rows)
from isogs_slam_tpu.ops.rasterize import RasterConfig, render_rgbd_sil


def _scene(n=1500, seed=0, dead=100):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    means[:, 2] += 2.5
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    logs = np.log(rng.uniform(0.02, 0.1, (n, 3))).astype(np.float32)
    ops = rng.uniform(-2, 3, (n, 1)).astype(np.float32)
    alive = np.ones(n, bool)
    if dead:
        alive[-dead:] = False
    return ([jnp.asarray(x) for x in (means, quats, logs, ops, rgb)],
            jnp.asarray(alive))


def test_pallas_composite_matches_xla():
    """Images and ALL parameter gradients agree between the Pallas kernel
    (interpret mode) and the fused-XLA compositing path."""
    args, alive = _scene()
    cam = Camera(width=96, height=80, fx=80.0, fy=80.0, cx=47.5, cy=39.5)

    def run(backend):
        cfg = RasterConfig(max_per_tile=256, tile_chunk=16, backend=backend)

        def loss(*a):
            im, depth, sil, dsq, aux = render_rgbd_sil(*a, alive, cam, cfg)
            return (jnp.sum(im ** 2) + jnp.sum(depth) + 0.5 * jnp.sum(sil),
                    (im, depth, sil))

        (l, outs), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(*args)
        return outs, g

    (im1, d1, s1), g1 = run("xla")
    (im2, d2, s2), g2 = run("pallas-interpret")
    assert float(jnp.max(jnp.abs(im1 - im2))) < 1e-5
    assert float(jnp.max(jnp.abs(d1 - d2))) < 1e-4
    assert float(jnp.max(jnp.abs(s1 - s2))) < 1e-5
    for a, b in zip(g1, g2):
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


def test_pallas_batch_kernel_matches_per_tile(monkeypatch):
    """The batched-tile kernel variant (ISOGS_COMPOSITE_BATCH=1) must
    produce identical outputs AND gradients to the per-tile-loop kernel:
    the lifted TPB dim changes op issue granularity, not math. Exercises
    multi-chunk tiles, empty tiles, saturation skips and the sq_col fold
    through composite_tiles' custom_vjp directly."""
    from isogs_slam_tpu.ops.pallas_composite import CHUNK, composite_tiles

    rng = np.random.default_rng(3)
    T, K, F = 12, 2 * CHUNK, 4         # 12 tiles: exercises TPB padding
    tiles_x = 4
    gdata = np.zeros((T, K, 6 + F), np.float32)
    # place gaussians inside each tile's pixel box so footprints contribute
    for t in range(T):
        ox, oy = (t % tiles_x) * 16, (t // tiles_x) * 16
        gdata[t, :, 0] = rng.uniform(ox - 2, ox + 18, K)       # u
        gdata[t, :, 1] = rng.uniform(oy - 2, oy + 18, K)       # v
    gdata[:, :, 2] = rng.uniform(0.05, 0.6, (T, K))            # A
    gdata[:, :, 3] = rng.uniform(-0.05, 0.05, (T, K))          # B
    gdata[:, :, 4] = rng.uniform(0.05, 0.6, (T, K))            # C
    gdata[:, :, 5] = rng.uniform(0.0, 1.2, (T, K))             # opacity
    gdata[:, :, 6:] = rng.uniform(0, 2, (T, K, F))
    counts = rng.integers(0, K + 1, T).astype(np.int32)
    counts[0] = 0                       # empty tile
    counts[1] = K                       # full tile
    gdata = jnp.asarray(gdata)
    counts = jnp.asarray(counts)

    def run(batch):
        monkeypatch.setenv("ISOGS_COMPOSITE_BATCH", "1" if batch else "0")

        def loss(gd):
            out, final_t = composite_tiles(gd, counts, F, tiles_x, True, 3)
            return jnp.sum(out * out) + jnp.sum(final_t), (out, final_t)

        (l, outs), g = jax.value_and_grad(loss, has_aux=True)(gdata)
        return outs, g

    (o1, t1), g1 = run(False)
    (o2, t2), g2 = run(True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_composite_bwd_bf16_matches_f32():
    """The bwd_bf16 composite backward is the production default on the
    subset path (grad_scatter_bf16 defaults True; it is also what keeps
    the backward kernel under the 16 MB scoped-vmem limit at escalated
    K — NOTES r4s4 found-and-fixed). Until now only live TPU runs
    exercised it (ADVICE r4): pin CPU interpret-mode equivalence — bf16
    kernel out-block, f32 custom_vjp boundary dtype, grads within bf16
    rounding of the f32 path."""
    from isogs_slam_tpu.ops.pallas_composite import CHUNK, composite_tiles

    rng = np.random.default_rng(7)
    T, K, F = 8, 2 * CHUNK, 4
    tiles_x = 4
    gdata = np.zeros((T, K, 6 + F), np.float32)
    for t in range(T):
        ox, oy = (t % tiles_x) * 16, (t // tiles_x) * 16
        gdata[t, :, 0] = rng.uniform(ox - 2, ox + 18, K)
        gdata[t, :, 1] = rng.uniform(oy - 2, oy + 18, K)
    gdata[:, :, 2] = rng.uniform(0.05, 0.6, (T, K))
    gdata[:, :, 4] = rng.uniform(0.05, 0.6, (T, K))
    gdata[:, :, 3] = rng.uniform(-0.05, 0.05, (T, K))
    gdata[:, :, 5] = rng.uniform(0.0, 1.2, (T, K))
    gdata[:, :, 6:] = rng.uniform(0, 2, (T, K, F))
    counts = rng.integers(0, K + 1, T).astype(np.int32)
    counts[0], counts[1] = 0, K
    gdata = jnp.asarray(gdata)
    counts = jnp.asarray(counts)

    def grad_of(bwd_bf16):
        def loss(gd):
            out, final_t = composite_tiles(gd, counts, F, tiles_x, True, 3,
                                           bwd_bf16)
            return jnp.sum(out * out) + jnp.sum(final_t)
        return jax.grad(loss)(gdata)

    g32 = grad_of(False)
    g16 = grad_of(True)
    # the custom_vjp boundary convention: cotangent comes back f32
    assert g16.dtype == jnp.float32
    a, b = np.asarray(g32), np.asarray(g16)
    assert np.all(np.isfinite(b))
    scale = np.abs(a).max()
    # bf16 has ~8 mantissa bits -> ~4e-3 relative; advisor measured
    # ~2e-3 max relative diff on this shape
    assert np.max(np.abs(a - b)) / max(scale, 1e-8) < 5e-3


def test_hash_knn_recall():
    from isogs_slam_tpu.ops.iso_loss import knn_blocked
    from isogs_slam_tpu.ops.spatial_hash import build_hash_grid, knn_hash

    rng = np.random.default_rng(0)
    n = 20000
    uv = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(uv[:, 0] * 3) * np.cos(uv[:, 1] * 2)
    pts = np.stack([uv[:, 0], uv[:, 1], z], -1).astype(np.float32)
    alive = np.ones(n, bool)
    alive[rng.choice(n, 2000, replace=False)] = False
    q_ids = rng.choice(np.where(alive)[0], 512, replace=False)

    pj, aj = jnp.asarray(pts), jnp.asarray(alive)
    qj = pj[jnp.asarray(q_ids)]
    _, idx_ref = knn_blocked(qj, pj, aj, 16, 8192)
    spacing = 4.0 / np.sqrt(n)
    grid = build_hash_grid(pj, aj, jnp.float32(3.0 * spacing))
    d2h, idx_h = knn_hash(grid, pj, qj, 16, cap=32)
    rec = np.mean([
        len(set(np.asarray(idx_h[i]).tolist())
            & set(np.asarray(idx_ref[i]).tolist())) / 16
        for i in range(len(q_ids))])
    assert rec > 0.97
    # hash never returns a dead point as a finite-distance neighbor
    finite = np.isfinite(np.asarray(d2h))
    assert np.all(np.asarray(alive)[np.asarray(idx_h)][finite])


def test_iso_hash_gradients_finite_with_dead_rows():
    """Regression: dead slots hold all-zero quats; normalize() must not
    poison gradients that gather them as masked-out KNN candidates."""
    from isogs_slam_tpu.ops.iso_loss import iso_surface_loss

    C, n0 = 2048, 1500
    rng = np.random.default_rng(0)
    st = empty_state(C)
    pts = jnp.asarray(rng.uniform(-1, 1, (n0, 3)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (n0, 3)).astype(np.float32))
    rows = new_gaussian_rows(pts, cols, jnp.full((n0,), 4e-4))
    st = append_rows(st, rows, jnp.ones(n0, bool), 0)
    p = st.params

    def f(means, quats, ls, ops):
        return iso_surface_loss(means, quats, ls, ops, st.alive,
                                jax.random.PRNGKey(0), 256, 16,
                                knn_method="hash")[0]

    v, g = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
        p.means3d, p.unnorm_rotations, p.log_scales, p.logit_opacities)
    assert np.isfinite(float(v))
    for gg in g:
        assert int(jnp.sum(~jnp.isfinite(gg))) == 0


def test_hash_grid_bucket_ranges_match_searchsorted():
    """The histogram+cumsum bucket ranges (build_hash_grid) must equal the
    searchsorted definition they replaced (the latter lowered to a 315 ms
    serial binary-search loop per call at 2^21 buckets on TPU)."""
    from isogs_slam_tpu.ops.spatial_hash import (_hash_cells, _cell_coords,
                                                 build_hash_grid)
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.normal(size=(4096, 3)), jnp.float32)
    alive = jnp.asarray(rng.uniform(size=4096) < 0.8)
    cell = jnp.asarray(0.3, jnp.float32)
    g = build_hash_grid(pts, alive, cell, table_size=1 << 12)
    h = _hash_cells(_cell_coords(pts, cell), g.table_size)
    h = np.asarray(jnp.where(alive, h, g.table_size))
    h_sorted = np.sort(h)
    buckets = np.arange(g.table_size)
    np.testing.assert_array_equal(
        np.asarray(g.starts), np.searchsorted(h_sorted, buckets, "left"))
    np.testing.assert_array_equal(
        np.asarray(g.ends), np.searchsorted(h_sorted, buckets, "right"))


@pytest.mark.parametrize("window_lowering", [False, True])
def test_gather_slices_windows(window_lowering, monkeypatch):
    """gather_slices == table[start:start+size] for in-range starts, in 1D
    and 2D; starts at/near the end clamp to the last full window (callers
    pad with sentinel rows so clamping never touches real data). Both
    lowerings (row gather default; slice-window gather opt-in) must agree."""
    from isogs_slam_tpu.ops import gather as gather_mod
    monkeypatch.setattr(gather_mod, "_WINDOW_GATHER_OFF",
                        not window_lowering)
    gather_slices = gather_mod.gather_slices
    rng = np.random.default_rng(3)
    R, C, S = 97, 5, 4
    tbl2 = jnp.asarray(rng.normal(size=(R, C)), jnp.float32)
    tbl1 = tbl2[:, 0]
    starts = jnp.asarray([0, 1, 50, R - S, R - 1, R + 10], jnp.int32)
    out2 = np.asarray(gather_slices(tbl2, starts, S))
    out1 = np.asarray(gather_slices(tbl1, starts, S))
    t2 = np.asarray(tbl2)
    for i, s in enumerate(np.asarray(starts)):
        s_cl = min(max(int(s), 0), R - S)          # XLA CLIP semantics
        np.testing.assert_array_equal(out2[i], t2[s_cl:s_cl + S])
        np.testing.assert_array_equal(out1[i], t2[s_cl:s_cl + S, 0])
    # arbitrary starts shape is preserved
    st = jnp.zeros((3, 7), jnp.int32)
    assert gather_slices(tbl2, st, S).shape == (3, 7, S, C)
    assert gather_slices(tbl1, st, S).shape == (3, 7, S)
