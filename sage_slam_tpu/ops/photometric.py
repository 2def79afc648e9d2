"""Photometric (feature-metric) factor — residual, Jacobian, Hessian.

Re-design of the reference photometric factor for TPU: one batched tensor
program per edge replaces the CUDA grid over (sample, level)
(cuda/photometric_factor_kernels.cpp:33-368 + host reduce :1061-1164).

Memory layout: all per-keyframe tables live in SHARED flat arrays
(PhotoShared) indexed with per-edge base offsets — edges never copy the
feature pyramids / depth maps of their endpoints (a naive vmap gathers an
[E, C, T] copy per edge table, multiplying the gather working set by the
edge count; measured as the dominant cost of linearization on TPU).

Variable block layout of the 29-dim (13+CS) Hessian:
  [0:6]  pose0 tangent, [6:12] pose1 tangent, [12:12+CS] code0, [28] scale0
(photometric_factor.h:80, factor key order photometric_factor.cpp:151).

Semantics replicated from the reference:
* residual r = within_mask * (f0 - f1) per channel, gated by z>eps,
* J stored is d(f1)/d(params) (so GN step = AtA^-1 Atb directly),
* inlier normalization uses LEVEL-0 valid count only (:1139),
* zero-inlier penalty: error = 10 * sum(level weights), AtA = Atb = 0
  (:1156-1161),
* the J^T W J channel reduction uses the algebraically-identical
  per-point 2x2 gradient-Gram factorization (see photometric_jac_error).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import interp
from ..geometry.camera import CameraPyramid
from ..geometry.se3 import SE3
from . import residuals


class PhotoShared(NamedTuple):
    """Shared (not per-edge) window tables, flattened over keyframes.

    With K keyframes of HW pixels and T total pyramid pixels:
      bias_flat [K*HW], jac_flat [K*HW, CS],
      feat_pyr [C, K*T], grad_pyr [2, C, K*T], mask_flat [HW].
    Pass with vmap in_axes=None.

    packed_fg / packed_feat are optional TRANSPOSED (channel-major)
    QUAD-packed gather tables (interp.pack_quads_level over [feat | grad |
    mask] rows / [feat | mask] rows per level segment, then transposed):
    with them a 4-corner bilinear of features+gradients costs ONE dynamic
    column gather per point per level — the gather passes are the dominant
    linearize cost on TPU. Built lazily when absent; precompute via
    :func:`build_photo_tables` to hoist the packing out of an LM
    while_loop. Layout: [4*cw, K * Tq] with Tq = cam_pyr.total_quad_rows;
    frame k's level l segment starts at column k*Tq + quad_level_offsets[l].
    Each corner additionally carries the full-res validity mask as its
    last row (cw = 3C+1 / C+1, level-0 segment only) so the mask
    nearest-lookup rides the level-0 gather (interp.quad_nearest_select_cm)
    instead of costing its own gather.

    dense_fg / dense_feat hold the COARSEST pyramid levels as per-frame
    channel-major tables ([K, 3C, M_l] / [K, C, M_l], suffix of levels
    with M_l <= DENSE_MAX_PIXELS): those levels are sampled gather-free by
    MXU hat-weight contraction (interp.dense_bilinear_cm)."""

    bias_flat: jax.Array
    jac_flat: jax.Array
    feat_pyr: jax.Array
    grad_pyr: jax.Array
    mask_flat: jax.Array
    packed_fg: jax.Array | None = None  # [4*(3C+1), K*Tq]
    packed_feat: jax.Array | None = None  # [4*(C+1), K*Tq]
    dense_fg: tuple = ()  # per dense level: [K, 3C, M_l]
    dense_feat: tuple = ()  # per dense level: [K, C, M_l]
    # mega tables (interp.build_mega01): levels 0 AND 1 (plus the folded
    # mask) in ONE gather row — [4*(3C+1)+9*3C, K*R], R = (w0+1)*(h0+1)
    mega_fg: jax.Array | None = None
    mega_feat: jax.Array | None = None  # [4*(C+1)+9*C, K*R]


# pyramid levels at or below this pixel count are sampled by dense
# hat-weight matmuls instead of gathers (see interp.dense_bilinear_cm).
# Measured on a v5e: profitable for levels 2-3 (320 / 80 px) and a loss
# for level 1 (1280 px) in BOTH the 3C-wide jac path and the C-wide error
# path (the f32-exact HIGHEST-precision matmul costs 6 MXU passes).
DENSE_MAX_PIXELS = 512
DENSE_MAX_PIXELS_FEAT = 512


def dense_levels(cam_pyr: CameraPyramid, max_pixels: int = DENSE_MAX_PIXELS):
    """Suffix of pyramid levels sampled densely (never level 0, which
    carries the folded mask column)."""
    return [
        lvl
        for lvl in range(1, cam_pyr.levels)
        if cam_pyr[lvl].num_pixels <= max_pixels
    ]


def _pack_pyramid_quads(rows: jax.Array, cam_pyr: CameraPyramid):
    """Quad-pack [K, T, C] per level segment -> [K*Tq, 4C]."""
    k, _, c = rows.shape
    segs = []
    for lvl, cam in enumerate(cam_pyr.cameras):
        off = cam_pyr.level_offsets[lvl]
        seg = rows[:, off : off + cam.num_pixels]
        segs.append(interp.pack_quads_level(seg, cam.width))
    out = jnp.concatenate(segs, axis=1)  # [K, Tq, 4C]
    return out.reshape(-1, 4 * c)


def build_photo_tables(
    feat_pyr: jax.Array,  # [C, K*T]
    grad_pyr: jax.Array,  # [2, C, K*T]
    mask_flat: jax.Array,  # [HW] full-res validity mask
    cam_pyr: CameraPyramid,
):
    """All precomputed target-sampling tables for the photometric factor:
    (packed_fg [4*(3C+1), K*Tq], packed_feat [4*(C+1), K*Tq],
     dense_fg, dense_feat) — TRANSPOSED (channel-major) quad tables with
    the folded mask column, and channel-major dense row tables
    [K, 3C, M_l] / [K, C, M_l] for the coarse levels (see PhotoShared)."""
    c, m = feat_pyr.shape
    t = cam_pyr.total_pixels
    k = m // t
    featT = feat_pyr.T.reshape(k, t, c)
    gradT = grad_pyr.reshape(2 * c, m).T.reshape(k, t, 2 * c)  # d-major
    rows_fg = jnp.concatenate([featT, gradT], axis=-1)  # [K, T, 3C]
    # mask column: full-res mask on the level-0 segment, zero elsewhere
    hw = cam_pyr[0].num_pixels
    mask_col = jnp.zeros((k, t, 1), feat_pyr.dtype)
    mask_col = mask_col.at[:, :hw, 0].set(mask_flat[None, :])
    packed_fg = _pack_pyramid_quads(
        jnp.concatenate([rows_fg, mask_col], axis=-1), cam_pyr
    ).T
    packed_feat = _pack_pyramid_quads(
        jnp.concatenate([featT, mask_col], axis=-1), cam_pyr
    ).T
    dense_fg, dense_feat = [], []
    for lvl in dense_levels(cam_pyr):
        off = cam_pyr.level_offsets[lvl]
        npx = cam_pyr[lvl].num_pixels
        dense_fg.append(jnp.swapaxes(rows_fg[:, off : off + npx], 1, 2))
    for lvl in dense_levels(cam_pyr, DENSE_MAX_PIXELS_FEAT):
        off = cam_pyr.level_offsets[lvl]
        npx = cam_pyr[lvl].num_pixels
        dense_feat.append(jnp.swapaxes(featT[:, off : off + npx], 1, 2))

    mega_fg = mega_feat = None
    if _mega_ok(cam_pyr):
        cam0_, cam1_ = cam_pyr[0], cam_pyr[1]
        off1 = cam_pyr.level_offsets[1]
        m1 = cam1_.num_pixels
        l0_fg = jnp.concatenate(
            [rows_fg[:, :hw], mask_col[:, :hw]], axis=-1
        )  # [K, M0, 3C+1]
        l1_fg = rows_fg[:, off1 : off1 + m1]
        mega_fg = interp.build_mega01(
            l0_fg, l1_fg, cam0_.width, cam0_.height
        )
        l0_f = jnp.concatenate(
            [featT[:, :hw], mask_col[:, :hw]], axis=-1
        )
        l1_f = featT[:, off1 : off1 + m1]
        mega_feat = interp.build_mega01(
            l0_f, l1_f, cam0_.width, cam0_.height
        )
    return (
        packed_fg, packed_feat, tuple(dense_fg), tuple(dense_feat),
        mega_fg, mega_feat,
    )


# Fold levels 0+1 into one wide gather row (interp.build_mega01). OFF by
# default: measured on a v5e, the 2.5 KB mega rows make the fused gather
# byte-bound and LOSE ~2x vs two 0.8 KB per-level gathers (the isolated
# width microbenchmark suggested otherwise — fused gathers run closer to
# memory bandwidth). Kept as a verified option (tests/test_mega.py) for
# hardware where gathers are row-count-bound.
USE_MEGA_TABLES = False


def _mega_ok(cam_pyr: CameraPyramid) -> bool:
    """Mega tables need level 1 at the exact half resolution of level 0
    (the 3x3-patch containment argument, interp.build_mega01)."""
    return (
        USE_MEGA_TABLES
        and cam_pyr.levels >= 2
        and cam_pyr[1].width * 2 == cam_pyr[0].width
        and cam_pyr[1].height * 2 == cam_pyr[0].height
    )


def _tables(shared: PhotoShared, cam_pyr: CameraPyramid):
    """(packed_fg, packed_feat, dense_fg, dense_feat, mega_fg,
    mega_feat), built lazily when the shared table fields are unset
    (tests / standalone use)."""
    if shared.packed_fg is not None:
        return (
            shared.packed_fg,
            shared.packed_feat,
            shared.dense_fg,
            shared.dense_feat,
            shared.mega_fg,
            shared.mega_feat,
        )
    return build_photo_tables(
        shared.feat_pyr, shared.grad_pyr, shared.mask_flat, cam_pyr
    )


class PhotoKf0(NamedTuple):
    """Per-edge source-keyframe data.

    src_feats caches the keyframe's own features sampled at its points
    per level (variable-independent; the reference re-samples them every
    kernel launch, photometric_factor_kernels.cpp:118-139).

    bias_at / jac_at are the depth bias and code Jacobian gathered at the
    sampled pixels. The gather indices (base_hw + loc1d) are static per
    keyframe, so these are precomputed once per BA problem
    (solver.ba.prepare_problem) instead of re-gathered every linearization
    — per-point gathers are the measured TPU bottleneck (~20 ns/row).
    When None they are gathered lazily (identical values)."""

    loc1d: jax.Array  # [N] int32 pixel ids (within one frame)
    homo0: jax.Array  # [N, 3]
    src_feats: jax.Array  # [L, N, C]
    base_hw: jax.Array  # scalar int32: kf0_index * HW
    base_pyr: jax.Array  # scalar int32: kf0_index * T (unused here)
    bias_at: jax.Array | None = None  # [N]
    jac_at: jax.Array | None = None  # [N, CS]


class PhotoFr1(NamedTuple):
    """Per-edge target-frame handle: base offset into the shared pyramid."""

    base_pyr: jax.Array  # scalar int32: fr1_index * T


def single_frame_shared(
    bias_flat, jac_flat, feat_pyr, grad_pyr, mask_flat,
    cam_pyr: CameraPyramid | None = None,
) -> PhotoShared:
    """Wrap one frame's arrays as a K=1 shared table (tests/training).
    With cam_pyr the quad gather tables are prebuilt; without, they are
    built lazily inside the factor evaluation."""
    if cam_pyr is None:
        return PhotoShared(bias_flat, jac_flat, feat_pyr, grad_pyr, mask_flat)
    tables = build_photo_tables(feat_pyr, grad_pyr, mask_flat, cam_pyr)
    return PhotoShared(
        bias_flat, jac_flat, feat_pyr, grad_pyr, mask_flat, *tables
    )


def _per_level_samples(
    cam_pyr: CameraPyramid,
    level: int,
    u_full: jax.Array,
    v_full: jax.Array,
    pyr: jax.Array,  # [C, K*T]
    base: jax.Array,  # scalar frame offset (multiple of T)
):
    cam_l = cam_pyr[level]
    cam0 = cam_pyr[0]
    rx = cam_l.fx / cam0.fx
    ry = cam_l.fy / cam0.fy
    ul, vl = interp.level_coords(u_full, v_full, rx, ry)
    return interp.bilinear_flat(
        pyr, ul, vl, cam_l.width, cam_l.height,
        base + cam_pyr.level_offsets[level],
    )


def _target_samples_cm(
    mask_flat: jax.Array,
    cam_pyr: CameraPyramid,
    u1: jax.Array,
    v1: jax.Array,
    base_pyr: jax.Array,
    packedT: jax.Array,
    dense: tuple,
    c_out: int,
    mega: jax.Array | None = None,
    soft: bool = False,
):
    """Sample the target frame at the warped full-res coords for every
    pyramid level, channel-major -> (list of [c_out, N] per level,
    within [N]).

    With a mega table, levels 0 AND 1 (and the folded full-res validity
    mask, photometric_factor_kernels.cpp:159-166 as a corner select)
    come from ONE column gather per point (interp.build_mega01);
    otherwise level 0 comes from one quad gather that also yields the
    mask. The coarsest levels use gather-free MXU hat-matmuls
    (interp.dense_bilinear_cm); remaining levels use one quad gather
    each. Tables without the mask column fall back to a separate nearest
    mask gather."""
    cam0 = cam_pyr[0]
    cw = packedT.shape[0] // 4
    has_mask = cw == c_out + 1
    nd = len(dense)
    dense_start = cam_pyr.levels - nd if nd else cam_pyr.levels
    frame = base_pyr // cam_pyr.total_pixels
    qbase = frame * cam_pyr.total_quad_rows
    out = []
    within = None
    mega_ctx = None
    for lvl in range(cam_pyr.levels):
        cam_l = cam_pyr[lvl]
        ul, vl = interp.level_coords(
            u1, v1, cam_l.fx / cam0.fx, cam_l.fy / cam0.fy
        )
        if mega is not None and lvl == 0:
            r = (cam0.width + 1) * (cam0.height + 1)
            rowv, wts, xc, yc = interp.mega_gather(
                mega, ul, vl, cam0.width, cam0.height, frame * r
            )
            out.append(interp.combine_quad_cm(rowv, wts, c_out, c_out + 1))
            if soft:
                within = interp.quad_bilinear_select_cm(
                    rowv, wts, c_out, c_out + 1
                )
            else:
                within = interp.quad_nearest_select_cm(
                    rowv, ul, vl, cam0.width, cam0.height, c_out, c_out + 1
                )
            mega_ctx = rowv
            continue
        if mega is not None and lvl == 1:
            out.append(
                interp.mega_level1(
                    mega_ctx, ul, vl, cam_l.width, cam_l.height,
                    c_out + 1, c_out,
                )
            )
            continue
        if lvl >= dense_start:
            rows_cm = jnp.take(dense[lvl - dense_start], frame, axis=0)
            out.append(
                interp.dense_bilinear_cm(
                    rows_cm, ul, vl, cam_l.width, cam_l.height
                )
            )
            continue
        off = qbase + cam_pyr.quad_level_offsets[lvl]
        rowv, wts = interp.quad_gather_cols(
            packedT, ul, vl, cam_l.width, cam_l.height, off
        )
        out.append(interp.combine_quad_cm(rowv, wts, c_out, cw))
        if lvl == 0 and has_mask:
            if soft:
                within = interp.quad_bilinear_select_cm(rowv, wts, c_out, cw)
            else:
                within = interp.quad_nearest_select_cm(
                    rowv, ul, vl, cam_l.width, cam_l.height, c_out, cw
                )
    if within is None:
        if soft:
            within = interp.bilinear_flat(
                mask_flat[None], u1, v1, cam0.width, cam0.height
            )[0]
        else:
            within = interp.nearest_flat(
                mask_flat, u1, v1, cam0.width, cam0.height
            )
    return out, within


def sample_source_features(feat_pyr, loc1d, cam_pyr: CameraPyramid):
    """Precompute PhotoKf0.src_feats from a SINGLE frame's pyramid
    [C, T]: the keyframe's own features at its photometric points for
    every level -> [L, N, C]."""
    cam0 = cam_pyr[0]
    x0, y0 = interp.locations_1d_to_2d(loc1d, cam0.width)
    zero = jnp.asarray(0, jnp.int32)
    out = []
    for lvl in range(cam_pyr.levels):
        f = _per_level_samples(cam_pyr, lvl, x0, y0, feat_pyr, zero)
        out.append(f.T)
    return jnp.stack(out, axis=0)


def _warp_project_cm(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    scale0: jax.Array,
    kf0: PhotoKf0,
    shared: PhotoShared,
    cam0,
    eps: float,
):
    """Channel-major per-point geometry shared by both photometric paths.

    Every per-point quantity is an [N]-lane vector (or [C, N]) — the TPU
    layout that keeps the VPU lanes full; [N, 2/3]-minor tensors are the
    measured bottleneck of the row-major formulation.

    Returns (depth0 [N], jac_cm [CS, N], rh [3, N], x1 [3, N], pos [N],
    u1 [N], v1 [N])."""
    hp = jax.lax.Precision.HIGHEST
    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    homo_cm = kf0.homo0.T  # [3, N]
    if kf0.bias_at is not None:
        bias_at, jac_at = kf0.bias_at, kf0.jac_at
    else:
        loc = kf0.base_hw + kf0.loc1d
        bias_at = jnp.take(shared.bias_flat, loc)
        jac_at = jnp.take(shared.jac_flat, loc, axis=0)
    jac_cm = jac_at.T  # [CS, N]
    depth0 = scale0 * (
        bias_at
        + jax.lax.dot_general(
            code0, jac_cm, (((0,), (0,)), ((), ())), precision=hp
        )
    )  # [N]
    rh = jnp.matmul(rot10, homo_cm, precision=hp)  # [3, N]
    x1 = depth0[None] * rh + t10[:, None]  # [3, N]
    pos = (x1[2] > eps).astype(depth0.dtype)
    # gated-out points must not divide by ~0 z (0-gate times inf = NaN;
    # residuals.safe_points rationale)
    x1 = x1.at[2].set(jnp.where(x1[2] > eps, x1[2], 1.0))
    u1 = x1[0] / x1[2] * cam0.fx + cam0.cx
    v1 = x1[1] / x1[2] * cam0.fy + cam0.cy
    return depth0, jac_cm, homo_cm, rh, x1, pos, u1, v1


def photometric_error(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    scale0: jax.Array,
    kf0: PhotoKf0,
    fr1: PhotoFr1,
    shared: PhotoShared,
    cam_pyr: CameraPyramid,
    weights,
    eps: float,
    soft: bool = False,
):
    """Error-only path (photometric_error_calculate :990-1059).
    Returns (error scalar, n_inliers scalar).

    ``soft`` selects the bilinear mask gate (config soft_inlier_gate;
    interp.quad_bilinear_select_cm). The residual is r = gate * d, so
    the error/count use gate^2 — identical to the reference's binary
    formulas when the gate is binary."""
    cam0 = cam_pyr[0]
    depth0, _, _, _, _, pos, u1, v1 = _warp_project_cm(
        p0, p1, code0, scale0, kf0, shared, cam0, eps
    )
    c = shared.feat_pyr.shape[0]
    _, packed_feat, _, dense_feat, _, mega_feat = _tables(shared, cam_pyr)
    f1s, within = _target_samples_cm(
        shared.mask_flat, cam_pyr, u1, v1, fr1.base_pyr, packed_feat,
        dense_feat, c, mega_feat, soft=soft,
    )
    gate = pos * within
    g2 = gate * gate  # == gate when binary

    err_total = jnp.zeros((), within.dtype)
    for lvl in range(cam_pyr.levels):
        f0 = kf0.src_feats[lvl].T  # [C, N]
        f1 = f1s[lvl]  # [C, N]
        err_pt = g2 * jnp.sum((f0 - f1) ** 2, axis=0)
        err_total = err_total + weights[lvl] * jnp.sum(err_pt)
    n_inl = jnp.sum(g2)

    w_sum = jnp.sum(jnp.asarray(weights))
    error = jnp.where(
        n_inl > 0, err_total / jnp.maximum(n_inl, 1.0), w_sum * 10.0
    )
    return error, n_inl


def photometric_jac_error(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    scale0: jax.Array,
    kf0: PhotoKf0,
    fr1: PhotoFr1,
    shared: PhotoShared,
    cam_pyr: CameraPyramid,
    weights,
    eps: float,
    soft: bool = False,
):
    """Linearization path (photometric_jac_error_calculate :1061-1164).
    Returns (AtA [13+CS, 13+CS], Atb [13+CS], error scalar, n_inliers).

    Channel-major formulation: every per-point quantity is an [N]-lane
    vector or a [C, N] / [29, N] channel-major matrix, so the VPU lanes
    stay full and channel sums are sublane reductions — the row-major
    [N, 2, C] einsum pipeline was the measured TPU hot spot.

    Algebra (same as the reference's L*N*C x 29 row matmul,
    photometric_factor_kernels.cpp:1143-1152, at ~1/30 the FLOPs):
    per-channel Jacobian rows factor as J_nc = g_nc^T K_n with K_n [2, 29]
    geometry rows; the channel sum collapses into a per-point 2x2 gradient
    Gram, and K_n at level l is diag(rx_l, ry_l) K_n at level 0 (u-rows
    scale with fx, v-rows with fy), so the level sum collapses too:
      AtA = Kx^T (gxx Kx + gxy Ky) + Ky^T (gxy Kx + gyy Ky)
    with gxx/gxy/gyy the level-weight-scaled Gram entries — two
    [29, N] x [N, 29] MXU matmuls per edge."""
    fgs, f0_cm, gate, kx, ky = photo_prep(
        p0, p1, code0, scale0, kf0, fr1, shared, cam_pyr, eps, soft=soft
    )
    ratios = level_ratios(cam_pyr)
    ata, atb, err_total, n_inl = photo_reduce_xla(
        fgs, f0_cm, gate, kx, ky, weights, ratios
    )
    return photo_normalize(ata, atb, err_total, n_inl, weights)


def level_ratios(cam_pyr: CameraPyramid):
    """Static per-level focal ratios [(rx_l, ry_l)] relative to level 0."""
    cam0 = cam_pyr[0]
    return tuple(
        (cam_pyr[lvl].fx / cam0.fx, cam_pyr[lvl].fy / cam0.fy)
        for lvl in range(cam_pyr.levels)
    )


def photo_normalize(ata, atb, err_total, n_inl, weights):
    """Inlier normalization + zero-inlier penalty (kernels :1049-1161)."""
    dtype = ata.dtype
    w_sum = jnp.sum(jnp.asarray(weights, dtype))
    has_inl = n_inl > 0
    inv = jnp.where(has_inl, 1.0 / jnp.maximum(n_inl, 1.0), 0.0)
    error = jnp.where(has_inl, err_total * inv, w_sum * 10.0)
    return ata * inv, atb * inv, error, n_inl


def photo_prep(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    scale0: jax.Array,
    kf0: PhotoKf0,
    fr1: PhotoFr1,
    shared: PhotoShared,
    cam_pyr: CameraPyramid,
    eps: float,
    soft: bool = False,
):
    """Warp + sample + K-row construction for one photometric edge.

    Returns channel-major arrays consumed by photo_reduce_{xla,pallas}:
    (fgs [L, 3C, N] target samples, f0_cm [L, C, N] source features,
    gate [N], kx [29, N], ky [29, N])."""
    cam0 = cam_pyr[0]
    hp = jax.lax.Precision.HIGHEST

    depth0, jac_cm, homo_cm, rh, x1, pos, u1, v1 = _warp_project_cm(
        p0, p1, code0, scale0, kf0, shared, cam0, eps
    )

    c = shared.feat_pyr.shape[0]
    packed_fg, _, dense_fg, _, mega_fg, _ = _tables(shared, cam_pyr)
    fgs, within = _target_samples_cm(
        shared.mask_flat, cam_pyr, u1, v1, fr1.base_pyr, packed_fg,
        dense_fg, 3 * c, mega_fg, soft=soft,
    )
    gate = pos * within  # [N]

    # geometry K-rows [29, N] from [N]-lane scalars (kernels :241-335)
    inv_z = 1.0 / x1[2]
    xz = x1[0] * inv_z
    yz = x1[1] * inv_z
    fxz = cam0.fx * inv_z
    fyz = cam0.fy * inv_z
    # world points and jac = R1^T [I | -hat(Xw)] (point_jac_pose0 algebra)
    xw = depth0[None] * jnp.matmul(p0.rot, homo_cm, precision=hp) + (
        p0.trans[:, None]
    )  # [3, N]
    a = jnp.swapaxes(p1.rot, -1, -2)  # R1^T
    zr = jnp.zeros_like(xw[0])
    nh0 = jnp.stack([zr, -xw[2], xw[1]])  # -hat(Xw) column 0: [3, N]
    nh1 = jnp.stack([xw[2], zr, -xw[0]])
    nh2 = jnp.stack([-xw[1], xw[0], zr])
    kxp = [fxz * (a[0, kk] - xz * a[2, kk]) for kk in range(3)]
    kyp = [fyz * (a[1, kk] - yz * a[2, kk]) for kk in range(3)]
    for nh in (nh0, nh1, nh2):
        jr = jnp.matmul(a, nh, precision=hp)  # [3, N]
        kxp.append(fxz * (jr[0] - xz * jr[2]))
        kyp.append(fyz * (jr[1] - yz * jr[2]))
    kx_pose = jnp.stack(kxp)  # [6, N]
    ky_pose = jnp.stack(kyp)
    # depth / code / scale columns (proj_jac_depth algebra)
    dx = cam0.fx * (rh[0] * inv_z - x1[0] * rh[2] * inv_z * inv_z)
    dy = cam0.fy * (rh[1] * inv_z - x1[1] * rh[2] * inv_z * inv_z)
    kx = jnp.concatenate(
        [
            kx_pose,
            -kx_pose,
            (dx * scale0)[None] * jac_cm,
            (dx * (depth0 / scale0))[None],
        ],
        axis=0,
    )  # [29, N]
    ky = jnp.concatenate(
        [
            ky_pose,
            -ky_pose,
            (dy * scale0)[None] * jac_cm,
            (dy * (depth0 / scale0))[None],
        ],
        axis=0,
    )
    f0_cm = jnp.swapaxes(kf0.src_feats, -1, -2)  # [L, C, N]
    return jnp.stack(fgs), f0_cm, gate, kx, ky


def photo_reduce_xla(
    fgs: jax.Array,  # [L, 3C, N]
    f0_cm: jax.Array,  # [L, C, N]
    gate: jax.Array,  # [N]
    kx: jax.Array,  # [29, N]
    ky: jax.Array,  # [29, N]
    weights,
    ratios,
):
    """XLA reduce: Gram accumulation + two MXU matmuls per edge.

    Returns UN-normalized (ata, atb, err_total, n_inl); the Pallas kernel
    in ops/pallas_kernels.py computes the identical function fused."""
    dtype = gate.dtype
    c = f0_cm.shape[-2]
    gate2 = gate * gate  # = gate for binary masks; kept for soft masks
    hp = jax.lax.Precision.HIGHEST

    gxx = gxy = gyy = hx = hy = jnp.zeros_like(gate)
    err_total = jnp.zeros((), dtype)
    for lvl in range(fgs.shape[0]):
        fg = fgs[lvl]  # [3C, N]
        f0 = f0_cm[lvl]  # [C, N]
        f1 = fg[:c]
        gx = fg[c : 2 * c]  # packed grad rows are (d, c)-ordered
        gy = fg[2 * c :]
        d = f0 - f1
        wl = jnp.asarray(weights[lvl], dtype)
        rx, ry = ratios[lvl]
        gxx = gxx + (wl * rx * rx) * jnp.sum(gx * gx, axis=0)
        gxy = gxy + (wl * rx * ry) * jnp.sum(gx * gy, axis=0)
        gyy = gyy + (wl * ry * ry) * jnp.sum(gy * gy, axis=0)
        hx = hx + (wl * rx) * jnp.sum(gx * d, axis=0)
        hy = hy + (wl * ry) * jnp.sum(gy * d, axis=0)
        err_total = err_total + wl * jnp.sum(gate2 * jnp.sum(d * d, axis=0))
    n_inl = jnp.sum(gate2)
    gxx, gxy, gyy = gate2 * gxx, gate2 * gxy, gate2 * gyy
    hx, hy = gate2 * hx, gate2 * hy

    kgx = gxx[None] * kx + gxy[None] * ky  # [29, N]
    kgy = gxy[None] * kx + gyy[None] * ky
    dn_mm = (((1,), (1,)), ((), ()))
    ata = jax.lax.dot_general(
        kx, kgx, dn_mm, precision=hp
    ) + jax.lax.dot_general(ky, kgy, dn_mm, precision=hp)
    dn_mv = (((1,), (0,)), ((), ()))
    atb = jax.lax.dot_general(
        kx, hx, dn_mv, precision=hp
    ) + jax.lax.dot_general(ky, hy, dn_mv, precision=hp)
    return ata, atb, err_total, n_inl
