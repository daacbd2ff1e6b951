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
import os

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


TPB = int(os.environ.get("ISOGS_COMPOSITE_TPB", "8"))
# tiles per program (amortizes per-program overhead)


def _use_batch() -> bool:
    """Batched-tile kernel variant: process all TPB tiles of a program
    jointly (leading TPB dim on every intermediate, batched dot_generals)
    instead of a per-tile Python loop. 8x fewer op issues per chunk; the
    early-exit granularity coarsens from per-tile to per-program (a
    saturated/past-count tile inside a live batch computes exact zeros).
    Output-identical by construction. Read per call so tests/bench can
    A/B without reimport."""
    return os.environ.get("ISOGS_COMPOSITE_BATCH", "0") == "1"


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


# ---------------------------------------------------------------------------
# Batched-tile kernel variant (_use_batch): identical math and identical
# host-side layouts/block specs, but the per-tile Python loop is lifted into
# a leading TPB dim. Each VPU op issues once on [TPB, CHUNK, P] (vs TPB
# times on [CHUNK, P]) and the triangular cumsums become batched
# dot_generals that keep the MXU streaming. The per-(tile, chunk) skip
# coarsens to per-(program, chunk): a tile that is past-count or saturated
# inside a still-live batch computes exact zeros (contrib/include mask it),
# so outputs and gradients are unchanged.


def _batch_pixel_coords(i, tiles_x):
    """(px, py) [TPB, 1, P] f32 pixel coords of program i's TPB tiles."""
    tid = i * TPB + jax.lax.broadcasted_iota(jnp.int32, (TPB, 1, P), 0)
    pid = jax.lax.broadcasted_iota(jnp.int32, (TPB, 1, P), 2)
    if tiles_x is None:
        ox = jnp.zeros_like(tid)
        oy = jnp.zeros_like(tid)
    else:
        ox = (tid % tiles_x) * TILE
        oy = (tid // tiles_x) * TILE
    px = (pid % TILE + ox).astype(jnp.float32)
    py = (pid // TILE + oy).astype(jnp.float32)
    return px, py


def _batch_counts(counts_ref, i):
    """(cnt [TPB, 1, 1] i32, max scalar) of program i's tile counts, read
    from the scalar-prefetch ref."""
    parts = [counts_ref[i * TPB + t].reshape(1, 1) for t in range(TPB)]
    cnt = jnp.concatenate(parts, axis=0).reshape(TPB, 1, 1)
    mc = parts[0][0, 0]
    for t in range(1, TPB):
        mc = jnp.maximum(mc, parts[t][0, 0])
    return cnt, mc


def _chunk_alpha_b(gd, px, py, cnt, base):
    """Batched _chunk_alpha. gd [TPB, CHUNK, 6+F]; px/py [TPB, 1, P];
    cnt [TPB, 1, 1] -> a/contrib/alpha/power/dx/dy [TPB, CHUNK, P]."""
    u = gd[:, :, 0:1]
    v = gd[:, :, 1:2]
    A = gd[:, :, 2:3]
    B = gd[:, :, 3:4]
    Cc = gd[:, :, 4:5]
    op = gd[:, :, 5:6]
    dx = u - px                     # [TPB, CHUNK, P]
    dy = v - py
    power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    slot = base + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK, 1), 1)
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & (slot < cnt)
    a = jnp.where(contrib, alpha, 0.0)
    return a, contrib, alpha, power, dx, dy


def _feat_ext_b(gd, F, sq_col):
    feat = gd[:, :, 6:6 + F]
    if sq_col is None:
        return feat
    fs = gd[:, :, 6 + sq_col:7 + sq_col]
    return jnp.concatenate([feat, fs * fs], axis=2)


_DN_TRI = (((2,), (1,)), ((0,), (0,)))    # [TPB,C,C] x [TPB,C,P] -> [TPB,C,P]


def _fwd_kernel_batch(counts_ref, gdata_ref, out_ref, tsum_ref,
                      carr_out_ref, carry_ref, *, n_chunks, F, Fo, sq_col,
                      tiles_x):
    i = pl.program_id(0)
    tri_b = jnp.broadcast_to(_tri_strict_lower(), (TPB, CHUNK, CHUNK))

    out_ref[:] = jnp.zeros_like(out_ref)
    tsum_ref[:] = jnp.zeros_like(tsum_ref)
    carry_ref[:] = jnp.zeros_like(carry_ref)          # [TPB, 1, P]

    px, py = _batch_pixel_coords(i, tiles_x)
    cnt, mc = _batch_counts(counts_ref, i)

    for c in range(n_chunks):
        base = c * CHUNK

        @pl.when((base < mc) & (jnp.max(carry_ref[:]) >= LOG_T_EPS))
        def _():
            gd = gdata_ref[:, pl.ds(base, CHUNK), :]  # [TPB, CHUNK, 6+F]
            a, contrib, _, _, _, _ = _chunk_alpha_b(gd, px, py, cnt, base)
            l = jnp.log1p(-a)                         # [TPB, CHUNK, P]
            s_excl = jax.lax.dot_general(
                tri_b, l, dimension_numbers=_DN_TRI,
                preferred_element_type=jnp.float32) + carry_ref[:]
            t_excl = jnp.exp(s_excl)
            include = contrib & (t_excl * (1.0 - a) >= T_EPS)
            w = jnp.where(include, a * t_excl, 0.0)
            feat = _feat_ext_b(gd, F, sq_col)         # [TPB, CHUNK, Fo]
            # out[t, p, fo] += sum_k w[t, k, p] feat[t, k, fo]
            out_ref[:] += jax.lax.dot_general(
                w, feat, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [TPB, P, Fo]
            tsum_ref[:] += jnp.sum(w, axis=1, keepdims=True)
            carry_ref[:] += jnp.sum(l, axis=1, keepdims=True)
            # rank-preserving write: int-indexed (rank-dropping) stores on
            # [TPB, 1, P] crash Mosaic's vector layout pass inside scf.if
            carr_out_ref[:, c:c + 1, :] = carry_ref[:]


def _bwd_kernel_batch(counts_ref, gdata_ref, gout_ref, gt_ref, carr_ref,
                      dgdata_ref, suffix_ref, sat_ref,
                      *, n_chunks, F, Fo, sq_col, tiles_x, n_tiles):
    i = pl.program_id(0)
    tri_l_b = jnp.broadcast_to(_tri_strict_lower(), (TPB, CHUNK, CHUNK))
    tri_u_b = jnp.broadcast_to(_tri_strict_upper(), (TPB, CHUNK, CHUNK))

    dgdata_ref[:] = jnp.zeros_like(dgdata_ref)

    px, py = _batch_pixel_coords(i, tiles_x)
    cnt, mc = _batch_counts(counts_ref, i)

    # Rows of the last program's blocks beyond n_tiles are out-of-bounds
    # (Pallas boundary reads: garbage/NaN). The forward's carry for those
    # rows is exactly 0 (their a, hence l, is identically 0), so pass 1
    # must substitute 0 — a garbage/NaN max would break the sat chain and
    # silently zero valid tiles' gradients in the same program.
    row_ok = (i * TPB + jax.lax.broadcasted_iota(jnp.int32, (TPB, 1, 1), 0)
              < n_tiles)

    # pass 1: executed-chunk count at batch granularity — chunk c ran iff
    # the batch reached it (base < max count) and the previous chunk's
    # stashed carry was not yet saturated across every tile and pixel.
    sat_ref[0] = 0
    for c in range(n_chunks):
        base = c * CHUNK
        if c == 0:
            live = jnp.ones((), bool)
        else:
            carr_prev = jnp.where(row_ok, carr_ref[:, c - 1:c, :], 0.0)
            live = jnp.max(carr_prev) >= LOG_T_EPS

        @pl.when((base < mc) & (sat_ref[0] == c) & live)
        def _():
            sat_ref[0] = c + 1

    gout = gout_ref[:]                                 # [TPB, P, Fo]
    gt = gt_ref[:]                                     # [TPB, 1, P]

    suffix_ref[:] = jnp.zeros_like(suffix_ref)         # [TPB, 1, P]
    for c in range(n_chunks - 1, -1, -1):
        base = c * CHUNK

        @pl.when((base < mc) & (c < sat_ref[0]))
        def _():
            gd = gdata_ref[:, pl.ds(base, CHUNK), :]
            a, contrib, alpha, power, dx, dy = _chunk_alpha_b(
                gd, px, py, cnt, base)
            l = jnp.log1p(-a)
            if c == 0:
                carry_in = jnp.zeros((TPB, 1, P), jnp.float32)
            else:
                carry_in = carr_ref[:, c - 1:c, :]
            s_excl = jax.lax.dot_general(
                tri_l_b, l, dimension_numbers=_DN_TRI,
                preferred_element_type=jnp.float32) + carry_in
            t_excl = jnp.exp(s_excl)
            include = contrib & (t_excl * (1.0 - a) >= T_EPS)
            w = jnp.where(include, a * t_excl, 0.0)
            feat = _feat_ext_b(gd, F, sq_col)

            # gw[t, k, p] = sum_f feat[t, k, f] gout[t, p, f] + gt[t, 0, p]
            gw = jax.lax.dot_general(
                feat, gout, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) + gt
            gww = gw * w
            suf = jax.lax.dot_general(
                tri_u_b, gww, dimension_numbers=_DN_TRI,
                preferred_element_type=jnp.float32) + suffix_ref[:]

            da = (jnp.where(include, gw * t_excl, 0.0)
                  - jnp.where(contrib, suf / (1.0 - a), 0.0))
            live_alpha = contrib & (alpha < ALPHA_MAX)
            dalpha = jnp.where(live_alpha, da, 0.0)
            dop_pix = dalpha * jnp.exp(power)          # [TPB, CHUNK, P]
            dpower = dalpha * alpha
            A = gd[:, :, 2:3]
            B = gd[:, :, 3:4]
            Cc = gd[:, :, 4:5]
            ddx = (-A * dx - B * dy) * dpower
            ddy = (-Cc * dy - B * dx) * dpower
            dA = jnp.sum(-0.5 * dx * dx * dpower, axis=2, keepdims=True)
            dB = jnp.sum(-dx * dy * dpower, axis=2, keepdims=True)
            dC = jnp.sum(-0.5 * dy * dy * dpower, axis=2, keepdims=True)
            du = jnp.sum(ddx, axis=2, keepdims=True)
            dv = jnp.sum(ddy, axis=2, keepdims=True)
            dop = jnp.sum(dop_pix, axis=2, keepdims=True)
            # dfeat[t, k, fo] = sum_p w[t, k, p] gout[t, p, fo]
            dfeat = jax.lax.dot_general(
                w, gout, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # [TPB, CHUNK, Fo]
            if sq_col is not None:
                fs = gd[:, :, 6 + sq_col:7 + sq_col]
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, F), 2) == sq_col).astype(jnp.float32)
                dfeat = (dfeat[:, :, :F]
                         + (2.0 * fs * dfeat[:, :, F:F + 1]) * onehot)
            dgdata_ref[:, pl.ds(base, CHUNK), :] = jnp.concatenate(
                [du, dv, dA, dB, dC, dop, dfeat],
                axis=2).astype(dgdata_ref.dtype)
            suffix_ref[:] += jnp.sum(gww, axis=1, keepdims=True)


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
    batch = _use_batch()
    kernel = functools.partial(
        _fwd_kernel_batch if batch else _fwd_kernel,
        n_chunks=n_chunks, F=F, Fo=Fo, sq_col=sq_col, tiles_x=tiles_x)
    carry_shape = (TPB, 1, P) if batch else (1, P)
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
            scratch_shapes=[pltpu.VMEM(carry_shape, jnp.float32)],
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
    batch = _use_batch()
    if batch:
        kernel = functools.partial(
            _bwd_kernel_batch, n_chunks=n_chunks, F=F, Fo=Fo,
            sq_col=sq_col, tiles_x=tiles_x, n_tiles=T)
    else:
        kernel = functools.partial(
            _bwd_kernel, n_chunks=n_chunks, F=F, Fo=Fo,
            sq_col=sq_col, tiles_x=tiles_x)
    suffix_shape = (TPB, 1, P) if batch else (1, P)
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
            scratch_shapes=[pltpu.VMEM(suffix_shape, jnp.float32),
                            pltpu.SMEM((1,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, K, 6 + F), out_dtype),
        interpret=interpret,
    )(counts, gdata, gout, gtsum, carries)
    return dgdata


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def composite_tiles(gdata, counts, F: int, tiles_x: int | None,
                    interpret: bool = False, sq_col: int | None = None,
                    bwd_bf16: bool = False):
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


def _ct_fwd(gdata, counts, F, tiles_x, interpret, sq_col, bwd_bf16):
    out_im, final_t, carries = _fwd_call(gdata, counts, F, tiles_x,
                                         interpret, sq_col,
                                         want_carries=True)
    return (out_im, final_t), (gdata, counts, carries)


def _ct_bwd(F, tiles_x, interpret, sq_col, bwd_bf16, res, cts):
    gdata, counts, carries = res
    gout, gfinal_t = cts
    # final_T = 1 - tsum  =>  d tsum = -d final_T
    # bwd_bf16: emit the dgdata cotangent in bfloat16. Callers whose very
    # next backward op is a bf16 scatter (the subset path's partial-grad
    # gather) request this — it halves the kernel's out-block, which at
    # the escalated per-tile cap K=768 is what keeps the backward under
    # the 16 MB scoped-vmem limit (measured OOM-by-1KB at f32, r4s4).
    dgdata = _bwd_call(gdata, counts, gout, -gfinal_t, carries, F, tiles_x,
                       interpret, sq_col,
                       out_dtype=jnp.bfloat16 if bwd_bf16 else jnp.float32)
    # the custom_vjp boundary stays f32 (cotangent dtype must match the
    # primal for downstream ops — same convention as the fused path); the
    # vmem win is the kernel's bf16 out-block, not the HBM array
    return dgdata.astype(gdata.dtype), None


composite_tiles.defvjp(_ct_fwd, _ct_bwd)
