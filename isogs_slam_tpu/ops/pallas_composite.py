"""Pallas TPU kernel: per-tile front-to-back alpha compositing (fwd + bwd).

This is the hot inner loop of the differentiable rasterizer — the analog of
the CUDA `rasterize_to_pixels_3dgs_fwd/bwd` kernels the reference consumes
through gsplat (cpp/src/rendering/renderer.cpp:214-232; the backward the C++
port never wired up). The pure-JAX path (ops/rasterize._composite_chunk)
materializes [tiles, K, 256] intermediates in HBM; this kernel keeps all
per-tile work in VMEM and skips work once transmittance saturates.

Design (TPU-first, not a CUDA translation):
  * grid = one program per 16x16 tile; per-tile records gdata[K, 6+F]
    (ABSOLUTE-pixel u, v, conic A B C, opacity, features) arrive via
    BlockSpec pipelining. The tile's pixel origin is derived in-kernel
    from the tile index (tiles_x static), so no origin-shifted copy of
    gdata is ever materialized (measured ~10 ms/iter of XLA glue at
    3225 tiles x 512 slots).
  * the sequential front-to-back recurrence w_i = a_i prod_{j<i} (1 - a_j)
    becomes, per 128-slot chunk, an *exclusive cumulative sum in log space
    computed as a strict-lower-triangular [128,128] matmul* (MXU), with a
    [1, 256] running log-transmittance carry between chunks.
  * chunks whose slots are all beyond the tile's count, or where every
    pixel's transmittance is below T_EPS, are skipped (@pl.when) — the
    vectorized form of the CUDA kernel's per-pixel early termination.
  * backward recomputes per-chunk state from a stashed [NC, 256] carry
    ladder and walks chunks in reverse with a gw*w suffix accumulator
    (strict-upper-triangular matmul within a chunk) — the closed form of
    the CUDA backward's back-to-front running sums.
  * sq_col: the depth^2 channel ([z, 1, z^2] rendervar semantics,
    slam_helpers.py:196-213) is synthesized in-kernel from the z feature
    column — it occupies no column of the gathered table and no
    materialized concat (its cotangent folds back into the z column).
  * the tile count need not divide TPB: only the [T] counts vector is
    padded; boundary gdata/out blocks rely on Pallas' masked block reads
    and writes (fake tiles carry count 0 and compute nothing).

The public entry `composite_tiles` carries a custom_vjp: cotangents flow to
gdata only (counts are integers); upstream, the expansion-order segreduce
(ops/segreduce.py) accumulates d_gdata into the [N, 6+F] Gaussian table.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE          # pixels per tile
CHUNK = 128              # K-slots per compositing chunk
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
LOG_T_EPS = -9.210340371976184  # log(1e-4)


def _pixel_coords(ox, oy):
    """(px, py) [1, P] f32 pixel coordinates of the tile whose origin is
    (ox, oy)."""
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pid % TILE + ox).astype(jnp.float32)
    py = (pid // TILE + oy).astype(jnp.float32)
    return px, py


def _tri_strict_lower():
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c < r).astype(jnp.float32)


def _tri_strict_upper():
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c > r).astype(jnp.float32)


def _chunk_alpha(gd, px, py, count, base):
    """Per-chunk alpha/footprint terms. gd [CHUNK, 6+F]; returns
    (a [CHUNK,P], contrib mask, plus geometry terms for bwd reuse)."""
    u = gd[:, 0:1]
    v = gd[:, 1:2]
    A = gd[:, 2:3]
    B = gd[:, 3:4]
    Cc = gd[:, 4:5]
    op = gd[:, 5:6]
    dx = u - px                     # [CHUNK, P]
    dy = v - py
    power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    slot = base + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & (slot < count)
    a = jnp.where(contrib, alpha, 0.0)
    return a, contrib, alpha, power, dx, dy


def _feat_ext(gd, F, sq_col):
    """[CHUNK, F(+1)] feature matrix, with the synthesized square channel
    appended when sq_col is set."""
    feat = gd[:, 6:6 + F]
    if sq_col is None:
        return feat
    fs = gd[:, 6 + sq_col:7 + sq_col]
    return jnp.concatenate([feat, fs * fs], axis=1)


TPB = 8                  # tiles per program (amortizes per-program overhead)


def _fwd_kernel(counts_ref, gdata_ref, out_ref, tsum_ref, carr_out_ref,
                carry_ref, *, n_chunks, F, Fo, sq_col, tiles_x):
    i = pl.program_id(0)
    tri = _tri_strict_lower()

    out_ref[:] = jnp.zeros_like(out_ref)
    tsum_ref[:] = jnp.zeros_like(tsum_ref)

    for t in range(TPB):
        tile = i * TPB + t
        if tiles_x is None:        # caller pre-shifted u,v to tile-local
            px, py = _pixel_coords(0, 0)
        else:
            px, py = _pixel_coords((tile % tiles_x) * TILE,
                                   (tile // tiles_x) * TILE)
        count = counts_ref[tile]
        carry_ref[:] = jnp.zeros_like(carry_ref)   # running log-T per pixel

        for c in range(n_chunks):
            base = c * CHUNK

            @pl.when((base < count)
                     & (jnp.max(carry_ref[0, :]) >= LOG_T_EPS))
            def _():
                gd = gdata_ref[t, pl.ds(base, CHUNK), :]
                a, contrib, _, _, _, _ = _chunk_alpha(gd, px, py, count,
                                                      base)
                l = jnp.log1p(-a)                          # [CHUNK, P]
                s_excl = jnp.dot(tri, l,
                                 preferred_element_type=jnp.float32)
                s_excl = s_excl + carry_ref[0:1, :]
                t_excl = jnp.exp(s_excl)
                include = contrib & (t_excl * (1.0 - a) >= T_EPS)
                w = jnp.where(include, a * t_excl, 0.0)
                feat = _feat_ext(gd, F, sq_col)
                out_ref[t, :, :] += jax.lax.dot_general(
                    w, feat, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [P, Fo]
                tsum_ref[t, :, :] += jnp.sum(w, axis=0, keepdims=True)
                carry_ref[0:1, :] += jnp.sum(l, axis=0, keepdims=True)
                # stash the post-chunk log-transmittance: the backward
                # reads the ladder instead of recomputing it (pass 1 of
                # the old bwd kernel — a full alpha recompute — becomes
                # a flag walk over these)
                carr_out_ref[t, c, :] = carry_ref[0, :]


def _bwd_kernel(counts_ref, gdata_ref, gout_ref, gt_ref, carr_ref,
                dgdata_ref, suffix_ref, sat_ref,
                *, n_chunks, F, Fo, sq_col, tiles_x):
    # dgdata_ref may be bf16 (out_dtype of _bwd_call): the d_table scatter
    # accumulates in bf16 anyway, so emitting bf16 here saves a full-array
    # convert + halves the kernel's output write
    i = pl.program_id(0)
    tri_l = _tri_strict_lower()
    tri_u = _tri_strict_upper()

    dgdata_ref[:] = jnp.zeros_like(dgdata_ref)

    for t in range(TPB):
        tile = i * TPB + t
        if tiles_x is None:        # caller pre-shifted u,v to tile-local
            px, py = _pixel_coords(0, 0)
        else:
            px, py = _pixel_coords((tile % tiles_x) * TILE,
                                   (tile // tiles_x) * TILE)
        count = counts_ref[tile]

        # pass 1: count the executed chunks (the forward's skip rule) by
        # walking the stashed carry ladder — chunk c executed iff the
        # previous chunk did and its post-carry was not yet saturated.
        # Non-executed chunks contribute exactly zero gradient and their
        # ladder rows are garbage; the sat_ref == c guard keeps them
        # unread in pass 2.
        sat_ref[0] = 0
        for c in range(n_chunks):
            base = c * CHUNK
            if c == 0:
                live = jnp.ones((), bool)
            else:
                live = jnp.max(carr_ref[t, c - 1, :]) >= LOG_T_EPS

            @pl.when((base < count) & (sat_ref[0] == c) & live)
            def _():
                sat_ref[0] = c + 1

        gout = gout_ref[t, :, :]                            # [P, Fo]
        gt = gt_ref[t, :, :]                                # [1, P]

        # pass 2: reverse chunk walk with a gw*w suffix accumulator.
        # Chunks beyond the tile's count are skipped entirely (the output
        # was pre-zeroed) — the common case, since most tiles hold far
        # fewer than K candidates.
        suffix_ref[:] = jnp.zeros_like(suffix_ref)
        for c in range(n_chunks - 1, -1, -1):
            base = c * CHUNK

            @pl.when((base < count) & (c < sat_ref[0]))
            def _():
                gd = gdata_ref[t, pl.ds(base, CHUNK), :]
                a, contrib, alpha, power, dx, dy = _chunk_alpha(
                    gd, px, py, count, base)
                l = jnp.log1p(-a)
                if c == 0:
                    carry_in = jnp.zeros((1, P), jnp.float32)
                else:
                    carry_in = carr_ref[t, c - 1:c, :]
                s_excl = (jnp.dot(tri_l, l,
                                  preferred_element_type=jnp.float32)
                          + carry_in)
                t_excl = jnp.exp(s_excl)
                include = contrib & (t_excl * (1.0 - a) >= T_EPS)
                w = jnp.where(include, a * t_excl, 0.0)
                feat = _feat_ext(gd, F, sq_col)

                # g_w[k,p] = sum_f feat[k,f] gout[p,f] + g_tsum[p]
                gw = jax.lax.dot_general(
                    feat, gout, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) + gt  # [CHUNK, P]
                gww = gw * w
                suf = (jnp.dot(tri_u, gww,
                               preferred_element_type=jnp.float32)
                       + suffix_ref[0:1, :])                 # [CHUNK, P]

                da = (jnp.where(include, gw * t_excl, 0.0)
                      - jnp.where(contrib, suf / (1.0 - a), 0.0))
                # alpha = min(0.99, op*exp(power)); the clamp kills the grad
                live_alpha = contrib & (alpha < ALPHA_MAX)
                dalpha = jnp.where(live_alpha, da, 0.0)
                dop_pix = dalpha * jnp.exp(power)            # [CHUNK, P]
                dpower = dalpha * alpha                      # d(op*e^p)/dp
                A = gd[:, 2:3]
                B = gd[:, 3:4]
                Cc = gd[:, 4:5]
                ddx = (-A * dx - B * dy) * dpower
                ddy = (-Cc * dy - B * dx) * dpower
                dA = jnp.sum(-0.5 * dx * dx * dpower, axis=1, keepdims=True)
                dB = jnp.sum(-dx * dy * dpower, axis=1, keepdims=True)
                dC = jnp.sum(-0.5 * dy * dy * dpower, axis=1, keepdims=True)
                du = jnp.sum(ddx, axis=1, keepdims=True)
                dv = jnp.sum(ddy, axis=1, keepdims=True)
                dop = jnp.sum(dop_pix, axis=1, keepdims=True)
                dfeat = jnp.dot(w, gout,
                                preferred_element_type=jnp.float32)
                if sq_col is not None:
                    # the synthesized square channel's cotangent folds
                    # back into its source column: d z += 2 z * d(z^2)
                    fs = gd[:, 6 + sq_col:7 + sq_col]
                    onehot = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, F), 1) == sq_col).astype(jnp.float32)
                    dfeat = (dfeat[:, :F]
                             + (2.0 * fs * dfeat[:, F:F + 1]) * onehot)
                dgdata_ref[t, pl.ds(base, CHUNK), :] = jnp.concatenate(
                    [du, dv, dA, dB, dC, dop, dfeat],
                    axis=1).astype(dgdata_ref.dtype)
                suffix_ref[0:1, :] += jnp.sum(gww, axis=0, keepdims=True)


def _pad_counts(counts, T):
    pad = (-T) % TPB
    if pad:
        counts = jnp.concatenate([counts, jnp.zeros((pad,), counts.dtype)])
    return counts, T + pad


def _fwd_call(gdata, counts, F: int, tiles_x: int, interpret: bool,
              sq_col: int | None, want_carries: bool = False):
    T = gdata.shape[0]
    counts, T_pad = _pad_counts(counts, T)
    K = gdata.shape[1]
    n_chunks = K // CHUNK
    Fo = F + (0 if sq_col is None else 1)
    kernel = functools.partial(_fwd_kernel, n_chunks=n_chunks, F=F, Fo=Fo,
                               sq_col=sq_col, tiles_x=tiles_x)
    out, tsum, carries = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T_pad // TPB,),
            in_specs=[pl.BlockSpec((TPB, K, 6 + F),
                                   lambda i, c: (i, 0, 0))],
            out_specs=[
                pl.BlockSpec((TPB, P, Fo), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((TPB, 1, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((TPB, n_chunks, P), lambda i, c: (i, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, P, Fo), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            # post-chunk log-transmittance ladder, stashed for the
            # backward (rows of non-executed chunks are garbage and
            # guarded unread there)
            jax.ShapeDtypeStruct((T, n_chunks, P), jnp.float32),
        ],
        interpret=interpret,
    )(counts, gdata)
    if want_carries:
        return out, 1.0 - tsum[:, 0, :], carries
    return out, 1.0 - tsum[:, 0, :]


def _bwd_call(gdata, counts, gout, gtsum, carries, F: int, tiles_x: int,
              interpret: bool, sq_col: int | None,
              out_dtype=jnp.float32):
    T, K, _ = gdata.shape
    counts, T_pad = _pad_counts(counts, T)
    gtsum = gtsum.reshape(T, 1, P)
    n_chunks = K // CHUNK
    Fo = F + (0 if sq_col is None else 1)
    kernel = functools.partial(_bwd_kernel, n_chunks=n_chunks, F=F, Fo=Fo,
                               sq_col=sq_col, tiles_x=tiles_x)
    dgdata = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T_pad // TPB,),
            in_specs=[
                pl.BlockSpec((TPB, K, 6 + F), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((TPB, P, Fo), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((TPB, 1, P), lambda i, c: (i, 0, 0)),
                pl.BlockSpec((TPB, n_chunks, P), lambda i, c: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TPB, K, 6 + F), lambda i, c: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((1, P), jnp.float32),
                            pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, K, 6 + F), out_dtype),
        interpret=interpret,
    )(counts, gdata, gout, gtsum, carries)
    return dgdata


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def composite_tiles(gdata, counts, F: int, tiles_x: int | None,
                    interpret: bool = False, sq_col: int | None = None):
    """gdata [T, K, 6+F] (absolute-pixel u, v, conic A B C, opacity,
    features...), counts [T] -> (tile images [T, P, F(+1)], final
    transmittance [T, P] as 1 - sum w). K must be a multiple of 128;
    tile t's pixel origin is ((t % tiles_x)*16, (t // tiles_x)*16), or
    (0, 0) for every tile when tiles_x is None (caller pre-shifted u,v
    to tile-local coordinates, e.g. the tile-sharded path whose shard
    offsets are not static).
    sq_col appends the square of feature column sq_col as an extra output
    channel (synthesized in-kernel; no extra gdata column)."""
    return _fwd_call(gdata, counts, F, tiles_x, interpret, sq_col)


def _ct_fwd(gdata, counts, F, tiles_x, interpret, sq_col):
    out_im, final_t, carries = _fwd_call(gdata, counts, F, tiles_x,
                                         interpret, sq_col,
                                         want_carries=True)
    return (out_im, final_t), (gdata, counts, carries)


def _ct_bwd(F, tiles_x, interpret, sq_col, res, cts):
    gdata, counts, carries = res
    gout, gfinal_t = cts
    # final_T = 1 - tsum  =>  d tsum = -d final_T
    dgdata = _bwd_call(gdata, counts, gout, -gfinal_t, carries, F, tiles_x,
                       interpret, sq_col)
    return dgdata, None


composite_tiles.defvjp(_ct_fwd, _ct_bwd)
