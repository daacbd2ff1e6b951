"""Unit tests for map state management, Adam, SSIM, and the IsoGS losses."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core import gaussians as G
from isogs_slam_tpu.core import optim
from isogs_slam_tpu.ops.iso_loss import flat_loss, iso_surface_loss, knn_blocked
from isogs_slam_tpu.ops.ssim import calc_ssim, ms_ssim, psnr

pytestmark = pytest.mark.smoke  # sub-5-min CI subset


def test_append_prune_compact():
    st = G.empty_state(64)
    rows = G.new_gaussian_rows(
        jnp.arange(30, dtype=jnp.float32)[:, None].repeat(3, 1),
        jnp.ones((30, 3)), jnp.full((30,), 0.01))
    valid = jnp.arange(30) % 2 == 0   # 15 valid
    st = jax.jit(G.append_rows)(st, rows, valid, 3.0)
    assert int(st.hwm) == 15
    assert int(st.num_alive()) == 15
    # appended rows are the valid ones, in order
    np.testing.assert_allclose(np.asarray(st.params.means3d[:3, 0]),
                               [0, 2, 4])
    np.testing.assert_allclose(np.asarray(st.timestep[:15]), 3.0)

    # prune odd rows then compact
    remove = (jnp.arange(64) % 2 == 1) & st.alive
    st = G.prune(st, remove)
    assert int(st.num_alive()) == 8
    st = jax.jit(G.compact)(st)
    assert int(st.hwm) == 8
    assert bool(jnp.all(st.alive[:8])) and not bool(jnp.any(st.alive[8:]))
    np.testing.assert_allclose(np.asarray(st.params.means3d[:4, 0]),
                               [0, 4, 8, 12])


def test_append_overflow_drops():
    st = G.empty_state(8)
    rows = G.new_gaussian_rows(jnp.ones((20, 3)), jnp.ones((20, 3)),
                               jnp.full((20,), 0.01))
    st = G.append_rows(st, rows, jnp.ones(20, bool), 0.0)
    assert int(st.hwm) == 8
    assert int(st.num_alive()) == 8


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-8)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    jp = jnp.asarray(p0)
    st = optim.init(jp)
    for g in grads:
        jp, st = optim.step(jp, jnp.asarray(g), st, jnp.float32(0.01),
                            eps=1e-8)
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.experimental
def test_lazy_adam_visit_time_equals_dense():
    """Lazy Adam: a row's trajectory equals dense Adam run on just its
    visited gradients (the subset-mode consistency contract), and rows
    never visited stay bit-frozen (params, moments, counts)."""
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(6, 3)).astype(np.float32)
    # row visit schedule over 7 iters: row0 every iter, row1 iters {1,4},
    # row2 iters {0,2,3,5,6}, row3 never, rows 4-5 alternate
    visits = np.zeros((7, 6), bool)
    visits[:, 0] = True
    visits[[1, 4], 1] = True
    visits[[0, 2, 3, 5, 6], 2] = True
    visits[0::2, 4] = True
    visits[1::2, 5] = True
    grads = [rng.normal(size=(6, 3)).astype(np.float32) for _ in range(7)]

    jp = jnp.asarray(p0)
    st = optim.init(jp, lazy=True)
    for it, g in enumerate(grads):
        gm = g * visits[it][:, None]
        jp, st = optim.step(jp, jnp.asarray(gm), st, jnp.float32(0.01),
                            eps=1e-8)

    # per-row reference: dense Adam over only the visited grads
    for row in range(6):
        seq = [grads[it][row:row + 1] for it in range(7) if visits[it, row]]
        rp = jnp.asarray(p0[row:row + 1])
        rst = optim.init(rp)
        for g in seq:
            rp, rst = optim.step(rp, jnp.asarray(g), rst, jnp.float32(0.01),
                                 eps=1e-8)
        np.testing.assert_allclose(np.asarray(jp[row]), np.asarray(rp[0]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"row {row}")
        assert int(st.rcount[row, 0]) == len(seq)
    # never-visited row is bit-identical, moments stay zero
    np.testing.assert_array_equal(np.asarray(jp[3]), p0[3])
    assert float(jnp.abs(st.mu[3]).max()) == 0.0


@pytest.mark.experimental
def test_lazy_adam_all_touched_matches_dense():
    """With every row touched every iteration (the sub=1 stripe case),
    lazy and dense Adam produce identical trajectories."""
    rng = np.random.default_rng(2)
    p0 = rng.normal(size=(4, 2)).astype(np.float32)
    grads = [rng.normal(size=(4, 2)).astype(np.float32) + 0.01
             for _ in range(5)]
    jp_d, st_d = jnp.asarray(p0), optim.init(jnp.asarray(p0))
    jp_l, st_l = jnp.asarray(p0), optim.init(jnp.asarray(p0), lazy=True)
    for g in grads:
        jp_d, st_d = optim.step(jp_d, jnp.asarray(g), st_d,
                                jnp.float32(0.01), eps=1e-8)
        jp_l, st_l = optim.step(jp_l, jnp.asarray(g), st_l,
                                jnp.float32(0.01), eps=1e-8)
    np.testing.assert_allclose(np.asarray(jp_l), np.asarray(jp_d),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.experimental
def test_lazy_adam_surgery_preserves_rcount():
    """mask_rows gathers and zero_rows keeps the per-row counts."""
    p = jnp.ones((4, 2))
    st = optim.init(p, lazy=True)
    g = jnp.asarray(np.array([[1, 1], [0, 0], [2, 2], [3, 3]], np.float32))
    _, st = optim.step(p, g, st, jnp.float32(0.01))
    order = jnp.asarray([2, 0, 1, 3])
    st2 = optim.mask_rows(st, order)
    np.testing.assert_array_equal(np.asarray(st2.rcount[:, 0]),
                                  [1, 1, 0, 1])
    st3 = optim.zero_rows(st2, jnp.asarray([True, False, False, False]))
    assert float(jnp.abs(st3.mu[0]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(st3.rcount[:, 0]),
                                  [1, 1, 0, 1])


def test_ssim_matches_torch_conv():
    """calc_ssim vs the Inria torch implementation re-run in torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 32, 40)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    # torch reference (slam_external.py:54-97 math)
    xs = np.arange(11) - 5
    g = np.exp(-(xs ** 2) / (2 * 1.5 ** 2)); g /= g.sum()
    w = np.outer(g, g).astype(np.float32)
    win = torch.tensor(w).expand(3, 1, 11, 11).contiguous()
    ta, tb = torch.tensor(a)[None], torch.tensor(b)[None]
    filt = lambda x: F.conv2d(x, win, padding=5, groups=3)
    mu1, mu2 = filt(ta), filt(tb)
    s1 = filt(ta * ta) - mu1 ** 2
    s2 = filt(tb * tb) - mu2 ** 2
    s12 = filt(ta * tb) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
           / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean().item()

    got = float(jax.jit(calc_ssim)(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - ref) < 5e-4


def test_psnr():
    a = np.zeros((3, 8, 8), np.float32)
    b = np.full((3, 8, 8), 0.1, np.float32)
    assert abs(psnr(a, b) - 20.0) < 1e-4


def test_knn_blocked_correct():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(17, 3)).astype(np.float32)
    valid = jnp.asarray(rng.uniform(size=300) > 0.3)
    d2, idx = jax.jit(lambda a, b, v: knn_blocked(a, b, v, 5, block=64))(
        jnp.asarray(q), jnp.asarray(pts), valid)
    vnp = np.asarray(valid)
    full = ((q[:, None, :] - pts[None]) ** 2).sum(-1)
    full[:, ~vnp] = np.inf
    ref_idx = np.argsort(full, axis=1)[:, :5]
    ref_d = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1),
                               np.sort(ref_d, axis=1), rtol=1e-4, atol=1e-5)


def test_flat_and_iso_losses_finite_diff():
    rng = np.random.default_rng(3)
    n = 40
    means = rng.normal(size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.05, 0.3, (n, 3))).astype(np.float32)
    logit_op = rng.normal(size=(n, 1)).astype(np.float32)
    alive = jnp.ones(n, bool)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def f(m, q, s, o):
        l, _ = iso_surface_loss(m, q, s, o, alive, key, sample_size=16,
                                k=4, knn_block=16)
        return l + flat_loss(s, alive)

    args = [jnp.asarray(x) for x in (means, quats, log_scales, logit_op)]
    grads = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(*args)
    eps = 1e-3
    rng2 = np.random.default_rng(0)
    for ai in range(4):
        a = np.asarray(args[ai]); flat = a.reshape(-1)
        for idx in rng2.choice(flat.size, size=5, replace=False):
            ap = flat.copy(); ap[idx] += eps
            am = flat.copy(); am[idx] -= eps
            largs_p = list(args); largs_p[ai] = jnp.asarray(
                ap.reshape(a.shape))
            largs_m = list(args); largs_m[ai] = jnp.asarray(
                am.reshape(a.shape))
            fd = (float(f(*largs_p)) - float(f(*largs_m))) / (2 * eps)
            an = float(np.asarray(grads[ai]).reshape(-1)[idx])
            # KNN index flips near ties make fd noisy; modest tolerance
            assert abs(fd - an) < max(0.1 * max(abs(fd), abs(an)), 5e-3), \
                (ai, idx, fd, an)


def test_iso_density_value():
    """Single isotropic Gaussian at the query point: D = opacity."""
    means = jnp.zeros((2, 3)).at[1].set(jnp.array([10.0, 0, 0]))
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    log_scales = jnp.zeros((2, 3))
    logit_op = jnp.zeros((2, 1))  # sigmoid -> 0.5
    alive = jnp.ones(2, bool)
    loss, mean_d = iso_surface_loss(means, quats, log_scales, logit_op,
                                    alive, jax.random.PRNGKey(0),
                                    sample_size=2, k=2, knn_block=2)
    # each query sits on one gaussian (D~0.5) and far from the other
    assert abs(float(mean_d) - 0.5) < 1e-3
    assert abs(float(loss) - 0.25) < 1e-3


def test_lpips_random_fallback():
    """No-weights LPIPS substitutes the seeded random-feature AlexNet:
    finite, deterministic, zero on identical inputs, labeled distinctly."""
    import os
    from isogs_slam_tpu.eval import metrics as M
    os.environ.pop("ISOGS_LPIPS_WEIGHTS", None)
    os.environ.pop("ISOGS_LPIPS_FALLBACK", None)
    assert M.lpips_variant() == "rand-alexnet"
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    d_same = M.lpips(a, a)
    d_diff = M.lpips(a, b)
    assert abs(d_same) < 1e-6
    assert np.isfinite(d_diff) and d_diff > 1e-5
    assert M.lpips(a, b) == d_diff  # deterministic
    os.environ["ISOGS_LPIPS_FALLBACK"] = "none"
    try:
        assert np.isnan(M.lpips(a, b))
        assert M.lpips_variant() == "none"
    finally:
        os.environ.pop("ISOGS_LPIPS_FALLBACK", None)
