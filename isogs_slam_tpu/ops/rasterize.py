"""TPU-native differentiable 3D Gaussian rasterizer (JAX/XLA).

This replaces the CUDA `diff-gaussian-rasterization-w-depth` extension the
reference consumes (`python_ordinary/utils/recon_helpers.py:2-27`,
`scripts/splatam.py:39,529-533`) and finishes what the reference's C++ port
left incomplete — the backward pass (`cpp/src/rendering/renderer.cpp:220-232`
only wires gsplat forward kernels; gradients were zeroed TODOs,
`cpp/src/slam/mapper.cpp:385-405`).

Numerics follow the EWA-splatting forward of the original 3DGS CUDA kernels
so golden images match the reference pipeline:

  * 2D covariance: cov2d = J W Sigma Wt Jt + 0.3*I with the 1.3*tanfov
    frustum clamp in the Jacobian (Sigma computed component-wise on [N]
    vectors — [N,3,3] tensors have a catastrophic TPU layout)
  * near-plane cull at z <= 0.2, alpha = min(0.99, op*exp(power)),
    skip when power > 0 or alpha < 1/255, terminate when transmittance
    would drop below 1e-4
  * per-16x16-tile, front-to-back depth order
  * pixel convention: consistent OpenCV pinhole u = fx*x/z + cx (see the
    note in project_gaussians; the CUDA ndc2Pix chain is half a pixel off
    the backprojection model the rest of the pipeline uses)

TPU-first design instead of a CUDA translation:

  * Per-tile compositing runs as a Pallas kernel on TPU
    (ops/pallas_composite.py: log-space triangular-matmul scan on the MXU,
    chunked early termination, custom VJP) and as a fused-XLA
    exclusive-cumprod formulation elsewhere — both exactly the sequential
    front-to-back recurrence and verified against each other.
  * Tile binning is ONE packed uint32 key sort
    (tile_id << depth_bits | quantized log depth) with fixed-capacity
    expansion: static shapes for XLA, graceful reported overflow.
  * Everything is shape-static: the Gaussian arrays are fixed-capacity with
    an alive mask, the intersection buffer has capacity `max_isect`, and
    each tile composites at most `max_per_tile` front-most Gaussians.
  * Tile lists may be computed once and REUSED across pose/parameter
    micro-updates (binning=... argument + margin_px) — the tracking loop
    bins once per frame, mapping once per keyframe per phase.

The whole render (projection -> binning -> compositing) is jit-compatible
and differentiable wrt means/quats/scales/opacities/features and the
camera pose upstream of them.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import Camera, TILE
from .gather import gather_slices

# CUDA-kernel constants (match diff-gaussian-rasterization)
NEAR_CULL_Z = 0.2
LOW_PASS = 0.3
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


class RasterConfig(NamedTuple):
    """Static rasterizer sizing. All fields participate in jit cache keys."""

    max_per_tile: int = 512   # front-most Gaussians composited per tile
    isect_per_gaussian: float = 2.5  # max_isect = N * this (capacity heuristic)
    tile_chunk: int = 256     # tiles composited per lax.map step (memory knob)
    # compositing backend: "auto" = Pallas kernel on TPU, fused-XLA elsewhere;
    # "pallas" / "xla" force; "pallas-interpret" for kernel tests on CPU
    backend: str = "auto"
    # backward d_table scatter-add in bfloat16 (see
    # _gather_rows_partial_grad); ~0.4% contribution rounding, well under
    # the mapping loss's one-random-keyframe sampling noise
    grad_scatter_bf16: bool = True
    # backward d_table aggregation: "auto" = expansion-order unique
    # scatter + Pallas segment reduce on TPU (needs emit_exp binning),
    # XLA scatter-add elsewhere; "segreduce" / "scatter" force
    bwd_mode: str = "auto"
    # post-binning zero-contribution slot culling (cull_tile_slots): drop
    # tile slots whose EXACT min of the conic quadratic form over the tile
    # box proves alpha < ALPHA_MIN for every pixel — the rect expansion
    # (CUDA getRect parity) over-covers anisotropic footprints, and the
    # compositing kernel skips whole 128-slot chunks, so compacted counts
    # save compute every reuse of the binning. Conservative (output
    # preserved): requires the caller to pass opacities + drift budgets to
    # bin_gaussians.
    tile_cull: bool = False
    # divide the bin-time min-q by this before comparing against the
    # opacity cut: budget for conic drift (scale/rotation Adam steps)
    # across the iterations that reuse a frozen binning
    cull_q_slack: float = 1.5
    # opacity-aware exact-ellipse tile rects (bin_gaussians): replace the
    # CUDA getRect square AABB of the 3-sigma MAJOR-axis radius with the
    # per-axis AABB of the contribution ellipse q <= qmax, where
    # qmax = 2*ln(op_bound/ALPHA_MIN). Output-preserving by the same
    # argument as tile_cull (a pixel with alpha >= ALPHA_MIN satisfies
    # q <= qmax, hence lies inside the ellipse AABB), intersected with
    # the radius rect so coverage never EXCEEDS the reference's 3-sigma
    # truncation. Shrinks the expansion count (anisotropic flakes waste
    # most of their major-axis square; post-opacity-reset every gaussian
    # sits at op=0.01 where the ellipse is ~0.2x the 3-sigma area), so
    # per-tile K-cap truncation drops AND a lower isect_per_gaussian
    # capacity becomes safe. Drift budgets while a binning is frozen:
    # cull_slack_px inflates the extent, cull_logit_drift bounds opacity
    # growth, cull_q_slack multiplies qmax for conic drift.
    tight_rect: bool = False
    # static intersection-buffer capacity override (rows). 0 = use the
    # N * isect_per_gaussian heuristic. The SLAM pipeline sets this from
    # observed per-binning n_isect (raster.adaptive_isect_cap) and grows
    # it geometrically — a new value re-jits, like capacity growth.
    max_isect_cap: int = 0

    def max_isect(self, num_gaussians: int) -> int:
        # a positive max_isect_cap overrides the N-proportional heuristic
        # (SLAM pipeline: cap driven by the MEASURED peak n_isect — the
        # heuristic over-provisions ~4x once the row capacity outgrows
        # the alive count, and the binning sort/expansion pay for
        # capacity, not demand)
        m = (self.max_isect_cap if self.max_isect_cap > 0
             else int(num_gaussians * self.isect_per_gaussian))
        # keep sort sizes friendly: round up to a multiple of 1024
        return max(1024, (m + 1023) // 1024 * 1024)

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "xla"

    def resolve_bwd_mode(self) -> str:
        if self.bwd_mode != "auto":
            return self.bwd_mode
        return ("segreduce" if self.resolve_backend() == "pallas"
                else "scatter")


class Projected(NamedTuple):
    u: jnp.ndarray        # [N] pixel x of the projected mean
    v: jnp.ndarray        # [N] pixel y
    depth: jnp.ndarray    # [N] camera z
    conic: jnp.ndarray    # [N, 3] (A, B, C) inverse 2D covariance
    radius: jnp.ndarray   # [N] int32 3-sigma pixel radius (0 = culled)
    valid: jnp.ndarray    # [N] bool
    rect_min: jnp.ndarray  # [N, 2] int32 tile rect (x, y) inclusive-min
    rect_max: jnp.ndarray  # [N, 2] int32 tile rect exclusive-max
    # margin-free footprint rect: candidates a tile owes only to the
    # binning margin rank AFTER true candidates, so per-tile top-K
    # truncation never displaces real content with margin padding
    rect_min_true: jnp.ndarray  # [N, 2] int32
    rect_max_true: jnp.ndarray  # [N, 2] int32


def _ewa_core(means_cam, quats, log_scales, cam: Camera):
    """The shared EWA projection math on FLAT [R]-shaped component vectors
    (used per-Gaussian by project_gaussians and per-tile-slot by
    render_slots). Returns (u, v, cA, cB, cC, det, radius_f).

    means_cam: [R,3]; quats: [R,4] camera-frame (w,x,y,z, unnormalized ok);
    log_scales: [R,3].
    """
    tx, ty, tz = means_cam[..., 0], means_cam[..., 1], means_cam[..., 2]
    tz_safe = tz + 1e-7

    # OpenCV pinhole: pixel (i, j) is the ray ((i-cx)/fx, (j-cy)/fy, 1), so
    # a point projects to u = fx*x/z + cx and is composited at integer pixel
    # coords. The CUDA chain (ndc2Pix) lands at cx - 0.5 instead — a global
    # half-pixel shift AGAINST the backprojection used by initialization
    # (get_pointcloud, splatam.py:298-348), i.e. the reference renders its
    # map half a pixel off its own observations. We keep the conventions
    # consistent; at Replica focal lengths the difference is sub-mm, at low
    # test resolutions it dominated the tracking error.
    u = cam.fx * tx / tz_safe + cam.cx
    v = cam.fy * ty / tz_safe + cam.cy

    # 3D covariance Sigma = R diag(s^2) R^T, computed component-wise:
    # [R,3,3] tensors have a catastrophic TPU layout (3-lane rows padded to
    # 128), so keep everything as [R] vectors.
    qn = quats / jnp.sqrt(jnp.maximum(
        jnp.sum(quats * quats, axis=-1, keepdims=True), 1e-24))
    r, x, y, z = qn[..., 0], qn[..., 1], qn[..., 2], qn[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = jnp.exp(log_scales)                        # [R,3]
    v0, v1, v2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    # Sigma_ij = sum_k R_ik v_k R_jk (6 unique entries)
    s00 = r00 * v0 * r00 + r01 * v1 * r01 + r02 * v2 * r02
    s01 = r00 * v0 * r10 + r01 * v1 * r11 + r02 * v2 * r12
    s02 = r00 * v0 * r20 + r01 * v1 * r21 + r02 * v2 * r22
    s11 = r10 * v0 * r10 + r11 * v1 * r11 + r12 * v2 * r12
    s12 = r10 * v0 * r20 + r11 * v1 * r21 + r12 * v2 * r22
    s22 = r20 * v0 * r20 + r21 * v1 * r21 + r22 * v2 * r22

    # Frustum-clamped perspective Jacobian. CUDA uses raw t.z here (the
    # 1e-7 guard only applies to the homogeneous divide above); guard z=0
    # without perturbing values that survive the near cull.
    tz_nz = jnp.where(tz == 0, 1e-7, tz)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txc = jnp.clip(tx / tz_nz, -limx, limx) * tz
    tyc = jnp.clip(ty / tz_nz, -limy, limy) * tz
    inv_z = 1.0 / tz_nz
    inv_z2 = inv_z * inv_z
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]
    j00 = cam.fx * inv_z
    j02 = -cam.fx * txc * inv_z2
    j11 = cam.fy * inv_z
    j12 = -cam.fy * tyc * inv_z2
    # cov2d = J Sigma J^T (2x2 symmetric), expanded to avoid 3x3 matmuls
    # rows of J Sigma: r0 = j00*S[0,:] + j02*S[2,:]; r1 = j11*S[1,:] + j12*S[2,:]
    r0x = j00 * s00 + j02 * s02
    r0z = j00 * s02 + j02 * s22
    r1y = j11 * s11 + j12 * s12
    r1z = j11 * s12 + j12 * s22
    c00 = r0x * j00 + r0z * j02 + LOW_PASS
    c01 = (j00 * s01 + j02 * s12) * j11 + r0z * j12
    c11 = r1y * j11 + r1z * j12 + LOW_PASS

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det != 0, det, 1.0)
    cA = c11 / det_safe
    cB = -c01 / det_safe
    cC = c00 / det_safe

    mid = 0.5 * (c00 + c11)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lam1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    return u, v, cA, cB, cC, det, radius_f


def project_gaussians(means_cam: jnp.ndarray, quats: jnp.ndarray,
                      log_scales: jnp.ndarray, alive: jnp.ndarray,
                      cam: Camera,
                      means2d_offset: jnp.ndarray | None = None,
                      margin_px: float = 0.0) -> Projected:
    """Per-Gaussian EWA projection (the analog of gsplat's
    `projection_ewa_3dgs_fused_fwd` used at cpp/src/rendering/renderer.cpp:83-100).

    means_cam: [N,3] camera-frame centers; quats: [N,4] camera-frame
    orientation (w,x,y,z, unnormalized ok); log_scales: [N,3];
    alive: [N] bool mask of real Gaussians.
    means2d_offset: optional [N,2] zero tensor whose gradient is the
    densification signal (the reference's `means2D.retain_grad()` pattern,
    scripts/splatam.py:528-530).
    """
    tz = means_cam[:, 2]
    u, v, cA, cB, cC, det, radius_f = _ewa_core(means_cam, quats,
                                                log_scales, cam)
    if means2d_offset is not None:
        u = u + means2d_offset[:, 0]
        v = v + means2d_offset[:, 1]
    conic = jnp.stack([cA, cB, cC], axis=-1)

    valid = alive & (tz > NEAR_CULL_Z) & (det != 0)

    # Tile rect (inclusive min, exclusive max), CUDA getRect semantics.
    # margin_px widens the rect only — used when a binning is reused across
    # pose/parameter micro-updates (tracking) so frozen tile lists stay
    # conservative supersets.
    gx, gy = cam.tiles_x, cam.tiles_y

    def rects(r):
        x0 = jnp.clip(jnp.floor((u - r) / TILE), 0, gx).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((v - r) / TILE), 0, gy).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((u + r + TILE - 1) / TILE), 0,
                      gx).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((v + r + TILE - 1) / TILE), 0,
                      gy).astype(jnp.int32)
        return x0, y0, x1, y1

    rxmin, rymin, rxmax, rymax = rects(radius_f + margin_px)
    txmin, tymin, txmax, tymax = rects(radius_f)
    tiles_touched = jnp.maximum(rxmax - rxmin, 0) * jnp.maximum(rymax - rymin, 0)
    valid = valid & (tiles_touched > 0) & (radius_f > 0)

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    return Projected(u=u, v=v, depth=tz, conic=conic, radius=radius,
                     valid=valid,
                     rect_min=jnp.stack([rxmin, rymin], axis=-1),
                     rect_max=jnp.stack([rxmax, rymax], axis=-1),
                     rect_min_true=jnp.stack([txmin, tymin], axis=-1),
                     rect_max_true=jnp.stack([txmax, tymax], axis=-1))


class Binning(NamedTuple):
    tile_gauss: jnp.ndarray   # [num_tiles, K] int32 gaussian index per slot
    tile_count: jnp.ndarray   # [num_tiles] int32 valid slots (<= K)
    n_isect: jnp.ndarray      # [] int32 total intersections generated
    n_overflow: jnp.ndarray   # [] int32 intersections dropped (isect or K cap)
    # margin-FREE (true-footprint) intersections dropped by the per-tile
    # K cap. Margin-only candidates rank after true ones, so dropping them
    # is by design; dropping TRUE candidates deviates from the reference
    # (which composites every intersection) — this counter makes that
    # deviation observable (see RasterConfig.max_per_tile).
    n_true_overflow: jnp.ndarray  # [] int32
    # expansion-order backward support (emit_exp=True; see
    # _gather_rows_segreduce). The expansion array (the pre-sort
    # (gaussian, tile) entries, gaussian-major by construction of
    # jnp.repeat) gives the one layout in which per-gaussian gradient
    # segments are CONTIGUOUS without any extra sort:
    #   slot_exp_pos [num_tiles, K] int32 — expansion position of each
    #     tile slot (sentinel M for padding slots -> dropped), i.e. the
    #     sort permutation restricted to the slot windows;
    #   exp_offsets [N+1] int32 — exclusive prefix sum of per-gaussian
    #     expansion counts (segment boundaries), clamped to M.
    slot_exp_pos: jnp.ndarray | None = None
    exp_offsets: jnp.ndarray | None = None


def _min_q_box(u, v, A, B, C, x0, x1, y0, y1):
    """EXACT minimum of the conic quadratic q(dx,dy) = A dx^2 + 2B dx dy +
    C dy^2 (the form _chunk_alpha evaluates per pixel: power = -q/2) over
    the pixel box [x0,x1]x[y0,y1], center (u,v). Positive-definite q (the
    EWA low-pass guarantees det > 0): the min is 0 when the center lies in
    the box, else it is attained on the boundary, where each edge is a 1D
    quadratic minimized in closed form and clamped. All args broadcast."""
    lx, hx = x0 - u, x1 - u
    ly, hy = y0 - v, y1 - v
    inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)
    As = jnp.maximum(A, 1e-12)
    Cs = jnp.maximum(C, 1e-12)

    def q(dx, dy):
        return A * dx * dx + 2.0 * B * dx * dy + C * dy * dy

    # edge dx = const: dq/ddy = 0 at dy* = -B dx / C (clamped); same for dy
    m = jnp.minimum(
        jnp.minimum(q(lx, jnp.clip(-B * lx / Cs, ly, hy)),
                    q(hx, jnp.clip(-B * hx / Cs, ly, hy))),
        jnp.minimum(q(jnp.clip(-B * ly / As, lx, hx), ly),
                    q(jnp.clip(-B * hy / As, lx, hx), hy)))
    return jnp.where(inside, 0.0, jnp.maximum(m, 0.0))


def cull_tile_slots(binning: Binning, proj: Projected, opacity: jnp.ndarray,
                    cam: Camera, cfg: RasterConfig, m_sentinel: int,
                    slack_px=0.0, logit_drift: float = 0.0) -> Binning:
    """Drop tile slots that provably contribute to NO pixel of their tile
    and compact the survivors to the front (depth order preserved).

    A slot contributes iff alpha = op * exp(-q/2) >= ALPHA_MIN somewhere in
    the tile (composite contrib rule, pallas_composite._chunk_alpha /
    _composite_chunk), i.e. iff min_box q <= 2*ln(op / ALPHA_MIN). The rect
    expansion (CUDA getRect semantics, renderer.cu via
    cpp/src/rendering/renderer.cpp:192-212) keeps every tile of the
    radius's AABB, so anisotropic conics (exactly what the IsoGS flat loss
    produces) waste most of their rect. Culling is CONSERVATIVE under the
    same drift contract as the rect margins: `slack_px` inflates the tile
    box by the caller's pose/mean pixel budget, `logit_drift` bounds
    opacity growth while the binning is reused (sigmoid(l+d) <=
    sigmoid(l)*e^d), and cfg.cull_q_slack divides min-q for conic drift.
    Compute cost is one [T,K] row gather + elementwise + one [T,K] argsort,
    ONCE per binning; the compositing kernel then skips whole 128-slot
    chunks on every iteration that reuses it."""
    T, K = binning.tile_gauss.shape
    geom = jnp.stack([proj.u, proj.v, proj.conic[:, 0], proj.conic[:, 1],
                      proj.conic[:, 2], opacity], axis=-1)   # [N, 6]
    g = geom[binning.tile_gauss]                             # [T, K, 6]
    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((tids % cam.tiles_x) * TILE).astype(jnp.float32)[:, None]
    ty0 = ((tids // cam.tiles_x) * TILE).astype(jnp.float32)[:, None]
    # pixel centers span [tx0, tx0+TILE-1]; inflate by the drift budget
    minq = _min_q_box(g[..., 0], g[..., 1], g[..., 2], g[..., 3], g[..., 4],
                      tx0 - slack_px, tx0 + (TILE - 1) + slack_px,
                      ty0 - slack_px, ty0 + (TILE - 1) + slack_px)
    # NOTE the compositor clamps alpha at ALPHA_MAX but tests contrib on
    # the CLAMPED value: min(ALPHA_MAX, op*e^{-q/2}) >= ALPHA_MIN is
    # equivalent to the unclamped op*e^{-q/2} >= ALPHA_MIN, so the cut
    # must use UNclamped opacity (cap only at 1.0 — sigmoid(l) < 1)
    op_bound = jnp.minimum(jnp.asarray(1.0, jnp.float32),
                           g[..., 5] * float(np.exp(logit_drift)))
    q_cut = 2.0 * (jnp.log(jnp.maximum(op_bound, 1e-12))
                   - float(np.log(ALPHA_MIN)))
    k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    in_cnt = k_idx < binning.tile_count[:, None]
    keep = in_cnt & (minq / cfg.cull_q_slack <= q_cut)
    # stable compaction: keepers first, original (depth) order preserved
    perm = jnp.argsort(jnp.where(keep, k_idx, K + k_idx), axis=1)
    tile_gauss = jnp.take_along_axis(binning.tile_gauss, perm, axis=1)
    new_count = jnp.sum(keep, axis=1).astype(jnp.int32)
    sep = binning.slot_exp_pos
    if sep is not None:
        sep = jnp.take_along_axis(sep, perm, axis=1)
        sep = jnp.where(k_idx < new_count[:, None], sep, m_sentinel)
    return binning._replace(tile_gauss=tile_gauss, tile_count=new_count,
                            slot_exp_pos=sep)


def bin_gaussians(proj: Projected, cam: Camera, cfg: RasterConfig,
                  emit_exp: bool = False, opacity: jnp.ndarray | None = None,
                  cull_slack_px=0.0, cull_logit_drift: float = 0.0
                  ) -> Binning:
    """Depth-ordered per-tile Gaussian lists with static shapes.

    Replaces the CUDA `intersect_tile`/`intersect_offset` duplication + 64-bit
    (tile | depth-bits) radix sort (renderer.cpp:192-212) with ONE 32-bit
    packed-key sort: key = tile_id << db | quantize(log depth, db bits).
    Quantized depth only decides the within-tile blend order; ~20 bits of log
    depth over [near, far] is far below any visible ordering difference.
    Fixed-capacity expansion (jnp.repeat) keeps every shape static.
    """
    N = proj.u.shape[0]
    num_tiles = cam.num_tiles
    K = cfg.max_per_tile
    M = cfg.max_isect(N)
    # depth bits: all that remain after the tile id (pad sentinel = 2^32-1)
    db = 32 - max(int(num_tiles + 1).bit_length(), 1)
    db = max(min(db, 24), 8)

    rect_min, rect_max = proj.rect_min, proj.rect_max
    rect_min_true, rect_max_true = proj.rect_min_true, proj.rect_max_true
    valid = proj.valid
    if cfg.tight_rect and opacity is not None:
        # Opacity-aware exact-ellipse AABB (see RasterConfig.tight_rect).
        # The contribution set {alpha >= ALPHA_MIN} = {q <= qmax} with
        # q the conic quadratic; its AABB half-extents are
        # sqrt(qmax * cov_xx) with cov = conic^-1 recovered elementwise.
        cx_a, cx_b, cx_c = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
        detc = jnp.maximum(cx_a * cx_c - cx_b * cx_b, 1e-24)
        op_bound = jnp.minimum(
            jnp.asarray(1.0, jnp.float32),
            opacity * float(np.exp(cull_logit_drift)))
        qmax = jnp.maximum(
            2.0 * (jnp.log(jnp.maximum(op_bound, 1e-12))
                   - float(np.log(ALPHA_MIN))) * cfg.cull_q_slack, 0.0)
        radius_f = proj.radius.astype(jnp.float32)
        # +0.01 px absorbs float rounding in the cov recovery (division,
        # sqrt) for pixels sitting exactly on the alpha = ALPHA_MIN level
        ex = jnp.minimum(jnp.sqrt(qmax * cx_c / detc) + 0.01, radius_f)
        ey = jnp.minimum(jnp.sqrt(qmax * cx_a / detc) + 0.01, radius_f)
        gx, gy = cam.tiles_x, cam.tiles_y

        def _erect(rx, ry):
            # NOTE the CUDA getRect exclusive-max floor((x+TILE-1)/TILE)
            # under-counts a tile when frac(x) < 1/TILE — harmless there
            # (the radius is integer-ceiled) but NOT for fractional
            # ellipse extents: the last covered pixel floor(u+rx) lives
            # in tile floor((u+rx)/TILE), so exclusive max is that + 1
            x0 = jnp.clip(jnp.floor((proj.u - rx) / TILE), 0,
                          gx).astype(jnp.int32)
            y0 = jnp.clip(jnp.floor((proj.v - ry) / TILE), 0,
                          gy).astype(jnp.int32)
            x1 = jnp.clip(jnp.floor((proj.u + rx) / TILE) + 1, 0,
                          gx).astype(jnp.int32)
            y1 = jnp.clip(jnp.floor((proj.v + ry) / TILE) + 1, 0,
                          gy).astype(jnp.int32)
            return (jnp.stack([x0, y0], axis=-1),
                    jnp.stack([x1, y1], axis=-1))

        em0, em1 = _erect(ex + cull_slack_px, ey + cull_slack_px)
        et0, et1 = _erect(ex, ey)
        # intersect with the radius rects: coverage never exceeds the
        # reference's 3-sigma truncation, clip bounds are inherited
        rect_min = jnp.maximum(rect_min, em0)
        rect_max = jnp.minimum(rect_max, em1)
        rect_min_true = jnp.maximum(rect_min_true, et0)
        rect_max_true = jnp.minimum(rect_max_true, et1)
        # op_bound < ALPHA_MIN contributes to NO pixel: zero tiles (the
        # geometric Projected.valid / radius bookkeeping is unchanged)
        valid = valid & (op_bound >= ALPHA_MIN)

    span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
    counts = jnp.where(valid, span_x * span_y, 0).astype(jnp.int32)
    offs = jnp.cumsum(counts) - counts             # exclusive prefix sum
    total = offs[-1] + counts[-1]

    # quantized near->far order key (indices are order statistics; no
    # grads); the top bit of the depth field demotes margin-only
    # candidates below every true candidate of the tile
    dqb = db - 1
    depth = jax.lax.stop_gradient(proj.depth)
    zn, zf = NEAR_CULL_Z, 1000.0
    t = jnp.log(jnp.clip(depth, zn, zf) / zn) / float(np.log(zf / zn))
    qz = (t * ((1 << dqb) - 1)).astype(jnp.uint32)

    # expand: one entry per (gaussian, covered tile). Per-gaussian fields
    # are bit-packed into ONE [N, 4] uint32 record expanded by a single
    # jnp.repeat: measured on TPU, a one-column [M] gather costs ~63 ms at
    # M = 2.6M while repeating a fused record is ~30 ms total — per-entry
    # random access is the binning bottleneck, not the expansion itself.
    # packed = rect_min.x (10b) | rect_min.y (10b) | span_x (10b).
    packed = (rect_min[:, 0].astype(jnp.uint32)
              | (rect_min[:, 1].astype(jnp.uint32) << 10)
              | (span_x.astype(jnp.uint32) << 20))
    # margin-free rect packed as 4x8 bits (tile coords < 256 <-> images up
    # to 4096 px); only consulted to flag margin-only candidates
    packed_true = (rect_min_true[:, 0].astype(jnp.uint32)
                   | (rect_min_true[:, 1].astype(jnp.uint32) << 8)
                   | (rect_max_true[:, 0].astype(jnp.uint32) << 16)
                   | (rect_max_true[:, 1].astype(jnp.uint32) << 24))
    rec = jnp.stack([packed, packed_true, qz,
                     offs.astype(jnp.uint32)], axis=-1)        # [N, 4]
    rec_e = jnp.repeat(rec, counts, axis=0, total_repeat_length=M)
    src = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                     total_repeat_length=M)
    pos = jnp.arange(M, dtype=jnp.int32)
    pk = rec_e[:, 0]
    local = pos - rec_e[:, 3].astype(jnp.int32)
    rxmin = (pk & 0x3FF).astype(jnp.int32)
    rymin = ((pk >> 10) & 0x3FF).astype(jnp.int32)
    sx = jnp.maximum((pk >> 20).astype(jnp.int32), 1)
    tile_x = rxmin + local % sx
    tile_y = rymin + local // sx
    tile_id = (tile_y * cam.tiles_x + tile_x).astype(jnp.uint32)
    pt = rec_e[:, 1]
    in_true = ((tile_x >= (pt & 0xFF).astype(jnp.int32))
               & (tile_y >= ((pt >> 8) & 0xFF).astype(jnp.int32))
               & (tile_x < ((pt >> 16) & 0xFF).astype(jnp.int32))
               & (tile_y < ((pt >> 24) & 0xFF).astype(jnp.int32)))
    margin_bit = jnp.where(in_true, jnp.uint32(0),
                           jnp.uint32(1) << dqb)
    key = (tile_id << db) | margin_bit | rec_e[:, 2]
    in_range = pos < jnp.minimum(total, M)
    key = jnp.where(in_range, key, jnp.uint32(0xFFFFFFFF))

    if emit_exp:
        # carry the expansion position through the sort so the backward
        # can write per-slot gradients straight back into gaussian-major
        # (pre-sort) order — a duplicate-free scatter, no dedup sort
        sorted_key, sorted_gauss, sorted_pos = jax.lax.sort(
            (key, src, pos), num_keys=1)
    else:
        sorted_key, sorted_gauss = jax.lax.sort((key, src), num_keys=1)

    tids = jnp.arange(num_tiles, dtype=jnp.uint32)
    starts = jnp.searchsorted(sorted_key, tids << db,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_key, (tids + 1) << db,
                            side="left").astype(jnp.int32)
    # true (margin-free) candidates sort before the margin_bit block
    ends_true = jnp.searchsorted(
        sorted_key, (tids << db) | (jnp.uint32(1) << dqb),
        side="left").astype(jnp.int32)
    full_count = ends - starts
    count_true = ends_true - starts
    tile_count = jnp.minimum(full_count, K)

    n_overflow = jnp.maximum(total - M, 0) + jnp.sum(full_count - tile_count)
    n_true_overflow = jnp.sum(jnp.maximum(count_true - K, 0))
    slot_exp_pos = exp_offsets = None
    # Each tile's K slots are CONSECUTIVE rows [starts, starts+K) of the
    # sorted arrays, so extract them as T slice-windows — one gather index
    # per TILE instead of per slot (random access is index-serial on TPU,
    # ops/gather.gather_slices). K pad rows absorb windows that overrun M
    # (starts <= M by construction): pad gauss id 0 stays in-bounds for
    # downstream table gathers and pad pos = M is the drop sentinel —
    # both only surface at k >= tile_count, which every consumer masks.
    if emit_exp:
        pair = jnp.stack([sorted_gauss, sorted_pos], axis=-1)   # [M, 2]
        pad = jnp.zeros((K, 2), pair.dtype).at[:, 1].set(M)
        both = gather_slices(jnp.concatenate([pair, pad]), starts, K)
        tile_gauss = both[..., 0]                  # [num_tiles, K]
        # padding slots (k >= count) alias later tiles' sorted entries;
        # send them to the out-of-bounds sentinel M so the backward's
        # unique scatter drops them (mode='drop')
        k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]
        slot_exp_pos = jnp.where(k_idx < tile_count[:, None],
                                 both[..., 1], M)
        # segment boundaries in expansion order; entries beyond the M
        # capacity were never sorted/rendered (reported as overflow), so
        # clamp — their (zero) gradient rows don't exist
        exp_offsets = jnp.minimum(
            jnp.concatenate([offs, total[None]]), M).astype(jnp.int32)
    else:
        tile_gauss = gather_slices(
            jnp.concatenate([sorted_gauss,
                             jnp.zeros((K,), sorted_gauss.dtype)]),
            starts, K)                             # [num_tiles, K]
    binning = Binning(tile_gauss=tile_gauss, tile_count=tile_count,
                      n_isect=total, n_overflow=n_overflow,
                      n_true_overflow=n_true_overflow,
                      slot_exp_pos=slot_exp_pos, exp_offsets=exp_offsets)
    if cfg.tile_cull and opacity is not None:
        binning = cull_tile_slots(binning, proj, opacity, cam, cfg, M,
                                  slack_px=cull_slack_px,
                                  logit_drift=cull_logit_drift)
    return binning


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_rows_partial_grad(table, idx, live_cols, scatter_bf16=False):
    """table[idx], but the backward pass scatter-adds ONLY `live_cols`.

    The per-iteration cost floor of render backward is the [rows, 12]
    scatter-add of d_table (sort-based on TPU: ~constant + per-column
    cost, NOTES.md lever 1). Columns whose parameter chains are severed by
    stop_gradient (tracking: opacity + rgb + the silhouette ones-column;
    mapping: the ones-column) still pay full scatter price under the plain
    gather VJP because XLA cannot split one fused scatter. This wrapper
    keeps the single fused forward gather and drops the dead columns from
    the backward scatter explicitly.

    scatter_bf16: perform the backward scatter-add in bfloat16 (halves the
    sort-based scatter's bytes). The resulting ~0.4%-relative rounding on
    per-tile gradient contributions is far below the inherent one-random-
    keyframe-per-iteration sampling noise of the mapping loss.
    """
    return table[idx]


def _grpg_fwd(table, idx, live_cols, scatter_bf16=False):
    return table[idx], (idx, table.shape)


def _grpg_bwd(live_cols, scatter_bf16, res, dg):
    idx, shape = res
    cols = list(live_cols)
    dsub = dg[..., cols]                                     # [T, K, L]
    acc_dtype = jnp.bfloat16 if scatter_bf16 else dg.dtype
    dtab_sub = (jnp.zeros((shape[0], len(cols)), acc_dtype)
                .at[idx].add(dsub.astype(acc_dtype)).astype(dg.dtype))
    # re-expand to full width as a concat (zero columns feed only
    # stop_gradient'ed chains downstream)
    zero = jnp.zeros((shape[0],), dg.dtype)
    out_cols, j = [], 0
    for c in range(shape[1]):
        if c in cols:
            out_cols.append(dtab_sub[:, j])
            j += 1
        else:
            out_cols.append(zero)
    dtab = jnp.stack(out_cols, axis=1)
    return dtab, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_gather_rows_partial_grad.defvjp(_grpg_fwd, _grpg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _gather_rows_segreduce(table, idx, slot_exp_pos, exp_offsets,
                           m_cap, live_cols, scatter_bf16, interpret):
    """table[idx], backward = expansion-order write-back + segment reduce.

    Replaces the XLA scatter-add of _gather_rows_partial_grad (index-serial
    + dedup sort on TPU) with:
      (1) a DUPLICATE-FREE scatter of the [T*K, C] cotangent rows into
          expansion (gaussian-major, pre-sort) positions — padding slots
          carry the out-of-bounds sentinel m_cap and are dropped;
      (2) the Pallas contiguous-segment reduction (ops/segreduce.py).
    Requires binning with emit_exp=True (slot_exp_pos / exp_offsets);
    m_cap = cfg.max_isect(N) (static).
    """
    return table[idx]


def _grsr_fwd(table, idx, slot_exp_pos, exp_offsets, m_cap, live_cols,
              scatter_bf16, interpret):
    return table[idx], (idx, slot_exp_pos, exp_offsets, table.shape)


def _grsr_bwd(m_cap, live_cols, scatter_bf16, interpret, res, dg):
    from .segreduce import LANES, W, segment_reduce_rows
    idx, slot_exp_pos, exp_offsets, shape = res
    n, c = shape
    cols = list(live_cols) if live_cols is not None else list(range(c))
    L = len(cols)
    dsub = dg[..., cols] if L < c else dg                    # [T, K, L]
    acc_dtype = jnp.bfloat16 if scatter_bf16 else dg.dtype
    # (1) duplicate-free write-back: real slots map to distinct expansion
    # positions; padding slots carry sentinel m_cap -> dropped. Rows not
    # covered by any slot (per-tile K-cap truncation, expansion overflow)
    # stay zero. + W zero tail keeps the kernel's chunk DMAs in bounds.
    # Rows are LANE-padded to 128: dynamic-offset DMA windows need
    # 128-multiple lane dims, and the padding costs bandwidth only (the
    # index cost that dominates scatters is per ROW).
    upd = dsub.reshape(-1, L).astype(acc_dtype)
    upd = jnp.pad(upd, ((0, 0), (0, LANES - L)))
    d_exp = (jnp.zeros((m_cap + W, LANES), acc_dtype)
             .at[slot_exp_pos.reshape(-1)]
             .set(upd, mode="drop", unique_indices=True))
    # (2) contiguous gaussian-major segments -> planar [L, N]
    planar = segment_reduce_rows(d_exp, exp_offsets, n, L,
                                 interpret=interpret).astype(dg.dtype)
    if L == c:
        dtab = planar.T
    else:
        zero = jnp.zeros((n,), dg.dtype)
        out_cols, j = [], 0
        for col in range(c):
            if col in cols:
                out_cols.append(planar[j])
                j += 1
            else:
                out_cols.append(zero)
        dtab = jnp.stack(out_cols, axis=1)
    return (dtab, np.zeros(idx.shape, dtype=jax.dtypes.float0),
            np.zeros(slot_exp_pos.shape, dtype=jax.dtypes.float0),
            np.zeros(exp_offsets.shape, dtype=jax.dtypes.float0))


_gather_rows_segreduce.defvjp(_grsr_fwd, _grsr_bwd)


# ---------------------------------------------------------------------------
# Fully fused render core for the mapping path on TPU: ONE custom_vjp
# spanning gather -> Pallas composite (fwd) and Pallas composite bwd ->
# expansion scatter -> Pallas segment reduce (bwd). Fusing the AD boundary
# lets every internal stage pick its natural layout/dtype: the bwd kernel
# emits bf16 directly (no full-array convert), the scatter stays lane-
# padded row-major, and the returned d_table is PLANAR [C, N] so each
# column's VJP chain is a contiguous row slice (measured: the unfused
# chain paid ~7 ms/iter of relayout copies + column splits at N=1.2M).


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _composite_table_fused(table_pl, idx, counts, slot_exp_pos, exp_offsets,
                           m_cap, F, tiles_x, sq_col, live_cols,
                           scatter_bf16, interpret):
    """table_pl [6+F, N] planar table (u, v, A, B, C, op, features rows);
    idx [T, K] per-tile slots; counts [T]. Returns the Pallas composite's
    (tiles_out [T, P, F(+1)], final_T [T, P])."""
    from .pallas_composite import _fwd_call
    gdata = table_pl.T[idx]
    return _fwd_call(gdata, counts, F, tiles_x, interpret, sq_col)


def _ctf_fwd(table_pl, idx, counts, slot_exp_pos, exp_offsets, m_cap, F,
             tiles_x, sq_col, live_cols, scatter_bf16, interpret):
    from .pallas_composite import _fwd_call
    gdata = table_pl.T[idx]
    out_im, final_t, carries = _fwd_call(gdata, counts, F, tiles_x,
                                         interpret, sq_col,
                                         want_carries=True)
    return (out_im, final_t), (gdata, counts, carries, idx, slot_exp_pos,
                               exp_offsets, table_pl.shape[1])


def _ctf_bwd(m_cap, F, tiles_x, sq_col, live_cols, scatter_bf16, interpret,
             res, cts):
    from .pallas_composite import _bwd_call
    from .segreduce import LANES, W, segment_reduce_rows
    gdata, counts, carries, idx, slot_exp_pos, exp_offsets, n = res
    gout, gfinal_t = cts
    C = gdata.shape[-1]
    acc_dtype = jnp.bfloat16 if scatter_bf16 else jnp.float32
    # final_T = 1 - tsum  =>  d tsum = -d final_T
    dgdata = _bwd_call(gdata, counts, gout, -gfinal_t, carries, F, tiles_x,
                       interpret, sq_col, out_dtype=acc_dtype)
    cols = list(live_cols) if live_cols is not None else list(range(C))
    L = len(cols)
    dsub = dgdata[..., cols] if L < C else dgdata
    upd = jnp.pad(dsub.reshape(-1, L), ((0, 0), (0, LANES - L)))
    d_exp = (jnp.zeros((m_cap + W, LANES), acc_dtype)
             .at[slot_exp_pos.reshape(-1)]
             .set(upd, mode="drop", unique_indices=True))
    planar = segment_reduce_rows(d_exp, exp_offsets, n, L,
                                 interpret=interpret)          # [L, n] f32
    if L < C:
        zero = jnp.zeros((n,), planar.dtype)
        rows, j = [], 0
        for c0 in range(C):
            if c0 in cols:
                rows.append(planar[j])
                j += 1
            else:
                rows.append(zero)
        planar = jnp.stack(rows, axis=0)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (planar, f0(idx), f0(counts), f0(slot_exp_pos),
            f0(exp_offsets))


_composite_table_fused.defvjp(_ctf_fwd, _ctf_bwd)


def _composite_chunk(gdata, counts, origins, F: int):
    """Composite one chunk of tiles.

    gdata: [C, K, 6+F] per-slot records (u, v, A, B, Bc, op is packed as
    u, v, conic(3), opacity, features[F]); counts: [C]; origins: [C, 2] pixel
    origin (x, y) of each tile. Returns ([C, TILE*TILE, F], [C, TILE*TILE]).

    The exclusive-cumprod weights reproduce the sequential front-to-back
    blend of the CUDA kernel exactly, including its skip rules (power > 0,
    alpha < 1/255) and its early-termination rule (stop *before* the
    Gaussian that would drive transmittance below 1e-4).
    """
    C, K = gdata.shape[0], gdata.shape[1]
    u = gdata[..., 0]        # [C, K]
    v = gdata[..., 1]
    A = gdata[..., 2]
    B = gdata[..., 3]
    Cc = gdata[..., 4]
    op = gdata[..., 5]
    feat = gdata[..., 6:]    # [C, K, F]

    # pixel centers of the tile: CUDA uses pixf = (float)pix_index
    dt = gdata.dtype
    px = jnp.arange(TILE, dtype=dt)
    pxs = jnp.tile(px, TILE)                               # [P] x within tile
    pys = jnp.repeat(px, TILE)                             # [P]
    P = TILE * TILE
    pix_x = origins[:, 0:1].astype(dt) + pxs[None, :]             # [C, P]
    pix_y = origins[:, 1:2].astype(dt) + pys[None, :]

    dx = u[:, :, None] - pix_x[:, None, :]                 # [C, K, P]
    dy = v[:, :, None] - pix_y[:, None, :]
    power = (-0.5 * (A[:, :, None] * dx * dx + Cc[:, :, None] * dy * dy)
             - B[:, :, None] * dx * dy)
    alpha = jnp.minimum(ALPHA_MAX, op[:, :, None] * jnp.exp(power))
    slot_valid = (jnp.arange(K, dtype=jnp.int32)[None, :]
                  < counts[:, None])                       # [C, K]
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & slot_valid[:, :, None]
    a = jnp.where(contrib, alpha, 0.0)

    one_minus = 1.0 - a
    # exclusive cumulative transmittance along the depth-sorted K axis
    t_excl = jnp.cumprod(one_minus, axis=1) / one_minus
    # (cumprod/x form is exact only when x>0; 1-a >= 1-0.99 > 0 always)
    include = jax.lax.stop_gradient(
        contrib & (t_excl * one_minus >= T_EPS))
    w = jnp.where(include, a * t_excl, 0.0)                # [C, K, P]

    out = jnp.einsum("ckp,ckf->cpf", w, feat,
                     preferred_element_type=dt)            # [C, P, F]
    final_t = 1.0 - jnp.sum(w, axis=1)                     # [C, P]
    return out, final_t


def composite(proj: Projected, opacity: jnp.ndarray, features: jnp.ndarray,
              binning: Binning, cam: Camera, cfg: RasterConfig,
              live_grad_cols: tuple | None = None,
              sq_col: int | None = None):
    """Rasterize all tiles -> ([num_tiles, P, F(+1)], [num_tiles, P]) tiles.

    live_grad_cols: static tuple of table-column indices whose gradients
    survive downstream stop_gradients; when given, the backward scatter
    covers only those columns (see _gather_rows_partial_grad).
    sq_col: optional feature-column index whose SQUARE is composited as an
    extra output channel (keeps derived channels like z^2 out of the
    per-iteration [T*K]-row gather/scatter — they're synthesized on the
    gathered [T, K] records instead)."""
    F = features.shape[-1]
    num_tiles = cam.num_tiles
    K = cfg.max_per_tile

    use_segreduce = (cfg.resolve_bwd_mode() == "segreduce"
                     and binning.slot_exp_pos is not None)
    backend = cfg.resolve_backend()
    if (use_segreduce and backend in ("pallas", "pallas-interpret")
            and binning.tile_gauss.shape[1] % 128 == 0):
        # fully fused TPU mapping path: planar table build (row slices of
        # column-major params), one custom_vjp over gather + composite +
        # scatter + segment reduce (see _composite_table_fused)
        live = tuple(live_grad_cols) if live_grad_cols is not None else None
        table_pl = jnp.stack(
            [proj.u, proj.v, proj.conic[:, 0], proj.conic[:, 1],
             proj.conic[:, 2], opacity]
            + [features[:, i] for i in range(F)], axis=0)      # [6+F, N]
        return _composite_table_fused(
            table_pl, binning.tile_gauss, binning.tile_count,
            binning.slot_exp_pos, binning.exp_offsets,
            cfg.max_isect(table_pl.shape[1]), F, cam.tiles_x, sq_col,
            live, cfg.grad_scatter_bf16, backend == "pallas-interpret")

    table = jnp.concatenate(
        [proj.u[:, None], proj.v[:, None], proj.conic,
         opacity[:, None], features], axis=-1)                 # [N, 6+F]
    if use_segreduce:
        live = tuple(live_grad_cols) if live_grad_cols is not None else None
        gdata = _gather_rows_segreduce(
            table, binning.tile_gauss, binning.slot_exp_pos,
            binning.exp_offsets, cfg.max_isect(table.shape[0]), live,
            cfg.grad_scatter_bf16,
            cfg.resolve_backend() != "pallas")
    elif live_grad_cols is None:
        gdata = table[binning.tile_gauss]                      # [T, K, 6+F]
    else:
        gdata = _gather_rows_partial_grad(table, binning.tile_gauss,
                                          tuple(live_grad_cols),
                                          cfg.grad_scatter_bf16)
    return composite_gdata(gdata, binning.tile_count, cam, cfg, F,
                           sq_col=sq_col)


def composite_gdata(gdata: jnp.ndarray, counts: jnp.ndarray, cam: Camera,
                    cfg: RasterConfig, F: int, sq_col: int | None = None,
                    bwd_bf16: bool = False):
    """Backend dispatch for per-tile compositing of already-assembled
    per-slot records gdata [num_tiles, K, 6+F] (absolute-pixel u, v).

    sq_col: see composite() — appends feat[sq_col]^2 as an extra feature
    channel on the gathered records (autodiff routes its cotangent back
    into the source column; downstream stop_gradient makes it free)."""
    num_tiles = cam.num_tiles
    K = gdata.shape[1]

    backend = cfg.resolve_backend()
    if backend in ("pallas", "pallas-interpret"):
        # absolute-pixel u,v: the kernel derives tile origins from the
        # tile index and synthesizes the sq_col channel internally — no
        # origin-shifted or widened copy of gdata is materialized
        from .pallas_composite import CHUNK, composite_tiles
        pad_k = (-K) % CHUNK
        if pad_k:
            gdata = jnp.concatenate(
                [gdata, jnp.zeros((num_tiles, pad_k, 6 + F), gdata.dtype)],
                axis=1)
        out, final_t = composite_tiles(
            gdata, counts, F, cam.tiles_x,
            backend == "pallas-interpret", sq_col, bwd_bf16)
        return out, final_t

    if sq_col is not None:
        zcol = gdata[..., 6 + sq_col:7 + sq_col]
        gdata = jnp.concatenate([gdata, zcol * zcol], axis=-1)
        F = F + 1
    tx = jnp.arange(num_tiles, dtype=jnp.int32) % cam.tiles_x
    ty = jnp.arange(num_tiles, dtype=jnp.int32) // cam.tiles_x
    origins = jnp.stack([tx * TILE, ty * TILE], axis=-1)

    # composite in chunks of tiles to bound the [chunk, K, 256] intermediates
    chunk = min(cfg.tile_chunk, num_tiles)
    pad_tiles = (-num_tiles) % chunk
    if pad_tiles:
        gdata = jnp.concatenate(
            [gdata, jnp.zeros((pad_tiles,) + gdata.shape[1:], gdata.dtype)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((pad_tiles,), counts.dtype)])
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad_tiles, 2), origins.dtype)])
    n_chunks = (num_tiles + pad_tiles) // chunk
    gdata = gdata.reshape(n_chunks, chunk, K, 6 + F)
    counts = counts.reshape(n_chunks, chunk)
    origins = origins.reshape(n_chunks, chunk, 2)

    body = jax.checkpoint(
        lambda args: _composite_chunk(args[0], args[1], args[2], F))
    out, final_t = jax.lax.map(body, (gdata, counts, origins))
    out = out.reshape(num_tiles + pad_tiles, TILE * TILE, F)
    final_t = final_t.reshape(num_tiles + pad_tiles, TILE * TILE)
    return out[:num_tiles], final_t[:num_tiles]


def render(means_cam: jnp.ndarray,
           quats_cam: jnp.ndarray,
           log_scales: jnp.ndarray,
           logit_opacities: jnp.ndarray,
           features: jnp.ndarray,
           alive: jnp.ndarray,
           cam: Camera,
           cfg: RasterConfig = RasterConfig(),
           means2d_offset: jnp.ndarray | None = None,
           binning: Binning | None = None,
           live_grad_cols: tuple | None = None,
           sq_col: int | None = None):
    """Full differentiable render.

    Inputs (all fixed-capacity [N, ...] with `alive` masking the real prefix):
      means_cam [N,3] camera-frame centers, quats_cam [N,4], log_scales [N,3],
      logit_opacities [N,1] (sigmoid applied here, matching
      transformed_params2rendervar, slam_helpers.py:124-139),
      features [N,F] per-Gaussian channels to composite.

    Returns dict:
      image   [F, H, W] composited channels (bg = 0, as in setup_camera)
      final_T [H, W]    remaining transmittance
      radii   [N]       int32 per-Gaussian pixel radius (0 = culled/unseen)
      n_isect, n_overflow  binning statistics
    """
    opacity = jax.nn.sigmoid(logit_opacities[:, 0])
    proj = project_gaussians(means_cam, quats_cam, log_scales, alive, cam,
                             means2d_offset)
    if binning is None:
        # no cull opacity here: an inline binning is used by exactly ONE
        # composite, so the per-binning cull cost (a [T,K] row gather +
        # argsort) has no reuse to amortize over — tile_cull applies only
        # at call sites that freeze and reuse a binning (mapping slots,
        # tracking slot tables, GN rebin)
        binning = bin_gaussians(
            proj, cam, cfg,
            emit_exp=cfg.resolve_bwd_mode() == "segreduce")
    else:
        # frozen tile lists may reference Gaussians culled at the current
        # pose; silence them instead of compositing stale conics
        opacity = jnp.where(proj.valid, opacity, 0.0)
    tiles_out, tiles_t = composite(proj, opacity, features, binning, cam,
                                   cfg, live_grad_cols, sq_col=sq_col)

    F = features.shape[-1] + (0 if sq_col is None else 1)
    gx, gy = cam.tiles_x, cam.tiles_y
    img = tiles_out.reshape(gy, gx, TILE, TILE, F)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE, gx * TILE, F)
    img = img[: cam.height, : cam.width]
    final_t = tiles_t.reshape(gy, gx, TILE, TILE)
    final_t = final_t.transpose(0, 2, 1, 3).reshape(gy * TILE, gx * TILE)
    final_t = final_t[: cam.height, : cam.width]

    return {
        "image": jnp.moveaxis(img, -1, 0),
        "final_T": final_t,
        "radii": proj.radius,
        "n_isect": binning.n_isect,
        "n_overflow": binning.n_overflow,
    }


# table columns for the fused 4-feature render: u, v, A, B, C, op,
# r, g, b, z. The reference's silhouette channel (composited ones) is
# exactly 1 - final_T (the kernel's transmittance output) and its z^2
# channel is synthesized post-gather (sq_col), so neither occupies a
# column of the per-iteration [T*K]-row gather/scatter table.
TRACKING_LIVE_COLS = (0, 1, 2, 3, 4, 9)       # pose reaches u,v,conic,z
MAPPING_LIVE_COLS = tuple(range(10))          # every column is live


def render_rgbd_sil(means_cam, quats_cam, log_scales, logit_opacities,
                    rgb_colors, alive, cam, cfg: RasterConfig = RasterConfig(),
                    means2d_offset=None, binning: Binning | None = None,
                    live_grad_cols: tuple | None = None):
    """Fused RGB + depth + silhouette + depth^2 render.

    The reference rasterizes twice per loss evaluation — once for RGB and once
    for [z, 1, z^2] (scripts/splatam.py:529-537, slam_helpers.py:196-213).
    The compositing weights are identical, so on TPU we composite a single
    fused feature matrix [r, g, b, z] (+ synthesized z^2) and recover the
    silhouette as 1 - final_T. Returns (im [3,H,W], depth [1,H,W],
    silhouette [H,W], depth_sq [1,H,W], aux dict).
    """
    z = means_cam[:, 2:3]
    feats = jnp.concatenate([rgb_colors, z], axis=-1)
    out = render(means_cam, quats_cam, log_scales, logit_opacities, feats,
                 alive, cam, cfg, means2d_offset, binning, live_grad_cols,
                 sq_col=3)
    img = out["image"]
    return (img[0:3], img[3:4], 1.0 - out["final_T"], img[4:5],
            {"radii": out["radii"], "final_T": out["final_T"],
             "n_isect": out["n_isect"], "n_overflow": out["n_overflow"]})


# ---------------------------------------------------------------------------
# Subsampled-tile mapping render (opt-in fast-mapping mode): composite ONLY
# a random subset of tiles per iteration. Every per-iteration cost that
# scales with the intersection count (gdata gather, Pallas fwd/bwd, the
# backward d_table scatter) shrinks by the subsample factor; the selected
# tiles are re-indexed into a single-row virtual grid so the compositor
# kernels run unchanged. The analog knob in the reference world is
# rendering at a reduced resolution (configs/replica/splatam_s.py) — this
# keeps full resolution but stochastically samples the pixel space.


def _virtual_row_shift(sel, cam: Camera, width: int, dtype):
    """u,v shift re-indexing the selected tiles into a single-row virtual
    grid: virtual tile t composites pixels with origin (t*TILE, 0), so
    shift by (virtual - real origin) — an additive constant, transparent
    to gradients. Returns [Ts, 1, width] with only cols 0 (u), 1 (v) set.
    Shared by render_tiles_subset and render_rgbd_sil_slots_subset."""
    t_sub = sel.shape[0]
    ox = (sel % cam.tiles_x) * TILE
    oy = (sel // cam.tiles_x) * TILE
    du = (jnp.arange(t_sub, dtype=jnp.int32) * TILE - ox).astype(dtype)
    dv = (-oy).astype(dtype)
    shift = jnp.zeros((t_sub, 1, width), dtype)
    return shift.at[:, 0, 0].set(du).at[:, 0, 1].set(dv)


class _TileGrid(NamedTuple):
    """Duck-typed stand-in for Camera inside composite_gdata: the selected
    tiles are laid out as one virtual row of tiles."""
    num_tiles: int
    tiles_x: int


# Backward-mode crossover for the subset path (measured on v5e at 938k
# Gaussians, K=512): the segreduce pipeline carries a subset-size-
# independent fixed cost (zero-init + full expansion scan ~9 ms) while
# the duplicate scatter-add scales at ~53 ns/row — segreduce wins only
# above ~250k cotangent rows.
SUBSET_SEGREDUCE_MIN_ROWS = 256 * 1024


def subset_uses_segreduce(cfg: RasterConfig, t_sub: int) -> bool:
    """Static choice of the subset render's backward aggregation mode
    (shared by render_tiles_subset and the binning emit_exp decision).
    An explicit bwd_mode="segreduce" always takes the segreduce path;
    "auto" applies the row-count crossover."""
    if cfg.bwd_mode == "segreduce":
        return True
    return (cfg.resolve_bwd_mode() == "segreduce"
            and t_sub * cfg.max_per_tile >= SUBSET_SEGREDUCE_MIN_ROWS)


def image_to_tiles(img: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """[C, H, W] -> [num_tiles, TILE*TILE, C] in the compositor's pixel
    order (p = y_local * TILE + x_local); out-of-image pixels are zero."""
    C = img.shape[0]
    gy, gx = cam.tiles_y, cam.tiles_x
    x = jnp.pad(img, ((0, 0), (0, gy * TILE - cam.height),
                      (0, gx * TILE - cam.width)))
    x = x.reshape(C, gy, TILE, gx, TILE).transpose(1, 3, 2, 4, 0)
    return x.reshape(gy * gx, TILE * TILE, C)


def tiles_to_image(tiles: jnp.ndarray, tiles_x: int) -> jnp.ndarray:
    """[Ts, TILE*TILE, C] (row-major tile ids, Ts a multiple of tiles_x)
    -> [C, (Ts/tiles_x)*TILE, tiles_x*TILE]. Inverse of image_to_tiles
    restricted to a contiguous band of tile rows — the fast-mapping
    stripe estimator reassembles its selected tiles with this before
    running the full-image SSIM filter over the stripe."""
    ts, _, c = tiles.shape
    rows = ts // tiles_x
    x = tiles.reshape(rows, tiles_x, TILE, TILE, c)
    x = x.transpose(4, 0, 2, 1, 3)
    return x.reshape(c, rows * TILE, tiles_x * TILE)


def tile_pixel_validity(cam: Camera) -> np.ndarray:
    """[num_tiles, TILE*TILE] bool: pixel lies inside the H x W image
    (tiles on the right/bottom edge are partially padded)."""
    gy, gx = cam.tiles_y, cam.tiles_x
    vy = (np.arange(gy * TILE).reshape(gy, TILE) < cam.height)
    vx = (np.arange(gx * TILE).reshape(gx, TILE) < cam.width)
    v = vy[:, None, :, None] & vx[None, :, None, :]
    return v.reshape(gy * gx, TILE * TILE)


def render_tiles_subset(means_cam, quats_cam, log_scales, logit_opacities,
                        rgb_colors, alive, sel, binning: Binning,
                        cam: Camera, cfg: RasterConfig,
                        means2d_offset=None, live_grad_cols=None):
    """Differentiable fused rgb+z(+z^2) render of ONLY the tiles in
    sel [T_sub] (int32 tile ids). Returns (tiles_out [T_sub, P, 5],
    final_t [T_sub, P], aux) with channels (r, g, b, z, z^2).

    The backward uses the plain partial-grad scatter-add
    (_gather_rows_partial_grad): at T_sub*K rows it is cheaper than the
    full-table segreduce pipeline, whose segment scan would still walk
    every expansion row."""
    opacity = jax.nn.sigmoid(logit_opacities[:, 0])
    proj = project_gaussians(means_cam, quats_cam, log_scales, alive, cam,
                             means2d_offset)
    # frozen tile lists may reference Gaussians culled at the current pose
    opacity = jnp.where(proj.valid, opacity, 0.0)
    table = jnp.concatenate(
        [proj.u[:, None], proj.v[:, None], proj.conic, opacity[:, None],
         rgb_colors, means_cam[:, 2:3]], axis=-1)          # [N, 10]
    idx = binning.tile_gauss[sel]                          # [T_sub, K]
    counts = binning.tile_count[sel]
    use_segreduce = (subset_uses_segreduce(cfg, sel.shape[0])
                     and binning.slot_exp_pos is not None)
    if live_grad_cols is None:
        gdata = table[idx]
    elif use_segreduce:
        # duplicate-index scatter-ADD costs ~53 ns/row on TPU (sort-based
        # dedup) — at T_sub*K rows above the crossover that is MORE than
        # the full-table expansion write-back (unique .set, ~8 ns/row) +
        # Pallas segment reduce, so the subset backward reuses the
        # segreduce pipeline with the subset's expansion positions
        gdata = _gather_rows_segreduce(
            table, idx, binning.slot_exp_pos[sel], binning.exp_offsets,
            cfg.max_isect(table.shape[0]), tuple(live_grad_cols),
            cfg.grad_scatter_bf16, cfg.resolve_backend() != "pallas")
    else:
        gdata = _gather_rows_partial_grad(table, idx, tuple(live_grad_cols),
                                          cfg.grad_scatter_bf16)
    t_sub = sel.shape[0]
    gdata = gdata + _virtual_row_shift(sel, cam, gdata.shape[-1],
                                       gdata.dtype)
    grid = _TileGrid(num_tiles=t_sub, tiles_x=t_sub)
    # bf16 composite cotangent: the next backward op on this path casts
    # to bf16 anyway (partial-grad scatter-add below the crossover,
    # segreduce expansion write-back above it — both gated on
    # grad_scatter_bf16), so the f32 dgdata block was pure vmem pressure:
    # at the escalated K=768 per-tile cap it put the backward kernel 1 KB
    # over the 16 MB scoped-vmem limit (measured, r4s4). live_grad_cols
    # is None only on test/toy paths that want full-f32 gradients.
    bwd_bf16 = cfg.grad_scatter_bf16 and live_grad_cols is not None
    out, final_t = composite_gdata(gdata, counts, grid, cfg, 4, sq_col=3,
                                   bwd_bf16=bwd_bf16)
    return out, final_t, {"radii": proj.radius}


# ---------------------------------------------------------------------------
# Slot-table render path (tracking): Gaussian params are FROZEN during a
# tracking frame — only the camera pose moves. So the per-(tile, slot) raw
# parameter records can be gathered ONCE per frame, and each iteration does
# the world->camera transform + EWA projection PER SLOT. Consequences:
#   * no per-iteration [T*K, 12] gather (the dominant glue cost), and
#   * no backward scatter AT ALL — the only differentiable leaf is the pose,
#     which enters per-slot as a broadcast, so its VJP is a reduction.
# The per-gaussian path re-projects all N rows per iteration and scatters
# d_table into [N, 12]; at N ~ 10^6 and T*K ~ 8*10^5 the slot path is
# strictly less work for tracking. (Mapping keeps the per-gaussian path:
# there the params are the gradient targets, so the scatter is inherent.)

# raw record: means3d(3), unnorm_rot(4), log_scales(3), logit_op(1), rgb(3)
RAW_COLS = 14


def gather_raw_table(params, tile_gauss: jnp.ndarray) -> jnp.ndarray:
    """[T, K] indices -> [T, K, RAW_COLS] raw world-frame records."""
    raw = jnp.concatenate(
        [params.means3d, params.unnorm_rotations, params.log_scales,
         params.logit_opacities, params.rgb_colors], axis=-1)
    return jax.lax.stop_gradient(raw)[tile_gauss]


def _slot_gdata(raw: jnp.ndarray, cam_quat: jnp.ndarray,
                cam_trans: jnp.ndarray, cam: Camera,
                tile_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-slot world->camera transform + EWA projection of a frozen raw
    table [T, K, RAW_COLS] -> composite records [T, K, 10] with
    absolute-pixel (u, v). Shared by the full-image and tile-subset slot
    renders; (cam_quat, cam_trans) are the only differentiable inputs.

    tile_ids [T] (None = arange): REAL tile id of each slot row, used for
    the per-slot tile-rect coverage test. The frozen tile lists carry a
    pixel MARGIN so one binning serves the whole frame's pose updates —
    but a margin-added (tile, gaussian) pair composites real alpha (up to
    op*e^{-4.5} ~ 0.01 per pair at the 3-sigma boundary; MEASURED max
    0.71 summed image diff on a dense toy scene), which the reference's
    per-iteration rebinning never renders (its rect IS the truncation,
    renderer.cpp:192-212 / CUDA getRect). Worse, the extra contribution
    is POSE-DEPENDENT, so the tracking loss minimum shifts away from the
    pose the map was optimized for. Zeroing the opacity of slots whose
    CURRENT-pose rect does not cover their tile makes the slot render
    bit-consistent with the margin-0 per-gaussian render at every pose
    inside the margin — reference truncation semantics, margin-free."""
    from ..utils.transforms import normalize, quat_mult
    T, K = raw.shape[0], raw.shape[1]
    flat = raw.reshape(T * K, RAW_COLS)
    means_w = flat[:, 0:3]
    quats_w = flat[:, 3:7]
    log_scales = flat[:, 7:10]
    logit_op = flat[:, 10]
    rgb = flat[:, 11:14]

    # world -> camera per slot (transform_to_frame semantics)
    qn = normalize(cam_quat)
    r, x, y, z = qn[0], qn[1], qn[2], qn[3]
    # R rows (w2c) applied to means: component-wise to stay [R]-shaped
    m0, m1, m2 = means_w[:, 0], means_w[:, 1], means_w[:, 2]
    tx = ((1 - 2 * (y * y + z * z)) * m0 + 2 * (x * y - r * z) * m1
          + 2 * (x * z + r * y) * m2 + cam_trans[0])
    ty = (2 * (x * y + r * z) * m0 + (1 - 2 * (x * x + z * z)) * m1
          + 2 * (y * z - r * x) * m2 + cam_trans[1])
    tz = (2 * (x * z - r * y) * m0 + 2 * (y * z + r * x) * m1
          + (1 - 2 * (x * x + y * y)) * m2 + cam_trans[2])
    means_cam = jnp.stack([tx, ty, tz], axis=-1)
    quats_cam = quat_mult(qn[None, :], normalize(quats_w))

    u, v, cA, cB, cC, det, radius_f = _ewa_core(means_cam, quats_cam,
                                                log_scales, cam)
    valid = (tz > NEAR_CULL_Z) & (det != 0) & (radius_f > 0)

    # current-pose tile-rect coverage (same formula as project_gaussians'
    # rects(radius_f), margin 0): uncovered margin slots are silenced so
    # the frozen-binning render keeps reference truncation semantics
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    tx = jnp.repeat(tile_ids % cam.tiles_x, K).astype(jnp.float32)
    ty = jnp.repeat(tile_ids // cam.tiles_x, K).astype(jnp.float32)
    us, vs, rs = (jax.lax.stop_gradient(a) for a in (u, v, radius_f))
    covered = ((tx >= jnp.floor((us - rs) / TILE))
               & (tx < jnp.floor((us + rs + TILE - 1) / TILE))
               & (ty >= jnp.floor((vs - rs) / TILE))
               & (ty < jnp.floor((vs + rs + TILE - 1) / TILE)))
    valid = valid & covered
    opacity = jnp.where(valid, jax.nn.sigmoid(logit_op), 0.0)
    # sanitize culled slots: their conic/uv can be inf/NaN and would poison
    # the pose gradient through 0 * NaN
    safe = lambda a: jnp.where(valid, a, 0.0)
    u, v, cA, cB, cC = safe(u), safe(v), safe(cA), safe(cB), safe(cC)
    zf = safe(tz)

    return jnp.stack(
        [u, v, cA, cB, cC, opacity, rgb[:, 0], rgb[:, 1], rgb[:, 2], zf],
        axis=-1).reshape(T, K, 10)


def render_rgbd_sil_slots(raw: jnp.ndarray, counts: jnp.ndarray,
                          cam_quat: jnp.ndarray, cam_trans: jnp.ndarray,
                          cam: Camera, cfg: RasterConfig):
    """Fused RGB+depth+sil+depth^2 render from a frozen per-slot raw table.

    raw [T, K, RAW_COLS] from gather_raw_table (stop-gradient params);
    counts [T]; (cam_quat, cam_trans) the ONLY differentiable inputs.
    Returns (im, depth, silhouette, depth_sq, aux) like render_rgbd_sil.
    """
    gdata = _slot_gdata(raw, cam_quat, cam_trans, cam)
    tiles_out, tiles_t = composite_gdata(gdata, counts, cam, cfg, 4,
                                         sq_col=3)

    gx, gy = cam.tiles_x, cam.tiles_y
    img = tiles_out.reshape(gy, gx, TILE, TILE, 5)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * TILE, gx * TILE, 5)
    img = jnp.moveaxis(img[: cam.height, : cam.width], -1, 0)
    final_t = tiles_t.reshape(gy, gx, TILE, TILE)
    final_t = final_t.transpose(0, 2, 1, 3).reshape(gy * TILE, gx * TILE)
    final_t = final_t[: cam.height, : cam.width]
    return (img[0:3], img[3:4], 1.0 - final_t, img[4:5],
            {"final_T": final_t})


def render_rgbd_sil_slots_subset(raw_sub: jnp.ndarray, counts_sub,
                                 sel: jnp.ndarray, cam_quat, cam_trans,
                                 cam: Camera, cfg: RasterConfig):
    """Slot-table render of ONLY the tiles in sel [Ts] (tracking's analog
    of render_tiles_subset). raw_sub [Ts, K, RAW_COLS] = raw[sel],
    counts_sub [Ts]. Returns tile-space (out [Ts, P, 5] with channels
    (r, g, b, z, z^2), silhouette [Ts, P]) — same virtual single-row grid
    trick as render_tiles_subset (u, v shifted by virtual - real origin,
    an additive constant transparent to the pose gradient)."""
    gdata = _slot_gdata(raw_sub, cam_quat, cam_trans, cam, tile_ids=sel)
    t_sub = raw_sub.shape[0]
    shift = _virtual_row_shift(sel, cam, gdata.shape[-1], gdata.dtype)
    grid = _TileGrid(num_tiles=t_sub, tiles_x=t_sub)
    out, final_t = composite_gdata(gdata + shift, counts_sub, grid, cfg, 4,
                                   sq_col=3)
    return out, 1.0 - final_t
