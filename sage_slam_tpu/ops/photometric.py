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

    packed_fg / packed_feat are optional QUAD-packed gather tables
    (interp.pack_quads_level over [feat | grad] rows / feat rows, per level
    segment): with them a 4-corner bilinear of features+gradients costs ONE
    dynamic gather per point per level — the gather passes are ~90% of
    linearize time on TPU. Built lazily when absent; precompute via
    :func:`build_packed_tables` to hoist the packing out of an LM
    while_loop. Layout: [K * Tq, 4*3C] with Tq = cam_pyr.total_quad_rows;
    frame k's level l segment starts at k*Tq + quad_level_offsets[l]."""

    bias_flat: jax.Array
    jac_flat: jax.Array
    feat_pyr: jax.Array
    grad_pyr: jax.Array
    mask_flat: jax.Array
    packed_fg: jax.Array | None = None  # [K*Tq, 4*3C]
    packed_feat: jax.Array | None = None  # [K*Tq, 4*C]


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


def build_packed_tables(
    feat_pyr: jax.Array, grad_pyr: jax.Array, cam_pyr: CameraPyramid
):
    """(packed_fg, packed_feat) quad-packed gather tables from the shared
    channel-major pyramids feat_pyr [C, K*T], grad_pyr [2, C, K*T]."""
    c, m = feat_pyr.shape
    t = cam_pyr.total_pixels
    k = m // t
    featT = feat_pyr.T.reshape(k, t, c)
    gradT = grad_pyr.reshape(2 * c, m).T.reshape(k, t, 2 * c)  # d-major cols
    rows_fg = jnp.concatenate([featT, gradT], axis=-1)  # [K, T, 3C]
    packed_fg = _pack_pyramid_quads(rows_fg, cam_pyr)
    packed_feat = _pack_pyramid_quads(featT, cam_pyr)
    return packed_fg, packed_feat


def _packed_fg(shared: PhotoShared, cam_pyr: CameraPyramid) -> jax.Array:
    if shared.packed_fg is not None:
        return shared.packed_fg
    return build_packed_tables(shared.feat_pyr, shared.grad_pyr, cam_pyr)[0]


def _packed_feat(shared: PhotoShared, cam_pyr: CameraPyramid) -> jax.Array:
    if shared.packed_feat is not None:
        return shared.packed_feat
    c = shared.feat_pyr.shape[0]
    t = cam_pyr.total_pixels
    k = shared.feat_pyr.shape[-1] // t
    return _pack_pyramid_quads(
        shared.feat_pyr.T.reshape(k, t, c), cam_pyr
    )


class PhotoKf0(NamedTuple):
    """Per-edge source-keyframe data.

    src_feats caches the keyframe's own features sampled at its points
    per level (variable-independent; the reference re-samples them every
    kernel launch, photometric_factor_kernels.cpp:118-139)."""

    loc1d: jax.Array  # [N] int32 pixel ids (within one frame)
    homo0: jax.Array  # [N, 3]
    src_feats: jax.Array  # [L, N, C]
    base_hw: jax.Array  # scalar int32: kf0_index * HW
    base_pyr: jax.Array  # scalar int32: kf0_index * T (unused here)


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
    packed_fg, packed_feat = build_packed_tables(feat_pyr, grad_pyr, cam_pyr)
    return PhotoShared(
        bias_flat, jac_flat, feat_pyr, grad_pyr, mask_flat,
        packed_fg, packed_feat,
    )


def _decode_depth_at(shared: PhotoShared, kf0: PhotoKf0, code0, scale0):
    loc = kf0.base_hw + kf0.loc1d
    bias = jnp.take(shared.bias_flat, loc)
    jac = jnp.take(shared.jac_flat, loc, axis=0)
    return scale0 * (bias + jac @ code0), jac


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


def _per_level_packed(
    cam_pyr: CameraPyramid,
    level: int,
    u_full: jax.Array,
    v_full: jax.Array,
    packed: jax.Array,  # [K*Tq, 4C] quad-packed table
    base: jax.Array,  # scalar frame PIXEL offset (multiple of T)
):
    """Quad-packed variant of _per_level_samples -> [N, C] (one gather)."""
    cam_l = cam_pyr[level]
    cam0 = cam_pyr[0]
    rx = cam_l.fx / cam0.fx
    ry = cam_l.fy / cam0.fy
    ul, vl = interp.level_coords(u_full, v_full, rx, ry)
    # convert the frame pixel offset into the quad-table frame offset
    qbase = (base // cam_pyr.total_pixels) * cam_pyr.total_quad_rows
    return interp.bilinear_quad(
        packed, ul, vl, cam_l.width, cam_l.height,
        qbase + cam_pyr.quad_level_offsets[level],
    )


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
):
    """Error-only path (photometric_error_calculate :990-1059).
    Returns (error scalar, n_inliers scalar)."""
    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    depth0, _ = _decode_depth_at(shared, kf0, code0, scale0)
    w = residuals.warp(kf0.homo0, depth0, rot10, t10, eps)
    cam0 = cam_pyr[0]
    u1, v1 = residuals.project_full_res(
        w.points_in_1, cam0.fx, cam0.fy, cam0.cx, cam0.cy
    )
    within = interp.nearest_flat(
        shared.mask_flat, u1, v1, cam0.width, cam0.height
    )
    pos = w.pos_depth.astype(within.dtype)

    err_total = jnp.zeros((), within.dtype)
    n_inl = jnp.zeros((), within.dtype)
    packed_feat = _packed_feat(shared, cam_pyr)
    for lvl in range(cam_pyr.levels):
        f0 = kf0.src_feats[lvl]  # [N, C]
        f1 = _per_level_packed(
            cam_pyr, lvl, u1, v1, packed_feat, fr1.base_pyr
        )  # [N, C]
        err_pt = pos * within * jnp.sum((f0 - f1) ** 2, axis=-1)
        err_total = err_total + weights[lvl] * jnp.sum(err_pt)
        if lvl == 0:
            n_inl = jnp.sum(pos * within)

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
):
    """Linearization path (photometric_jac_error_calculate :1061-1164).
    Returns (AtA [13+CS, 13+CS], Atb [13+CS], error scalar, n_inliers)."""
    cs = shared.jac_flat.shape[-1]
    dim = 13 + cs
    dtype = kf0.homo0.dtype

    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    depth0, dpt_jac_code_at = _decode_depth_at(shared, kf0, code0, scale0)
    w = residuals.warp(kf0.homo0, depth0, rot10, t10, eps)
    cam0 = cam_pyr[0]
    u1, v1 = residuals.project_full_res(
        w.points_in_1, cam0.fx, cam0.fy, cam0.cx, cam0.cy
    )
    within = interp.nearest_flat(
        shared.mask_flat, u1, v1, cam0.width, cam0.height
    )
    pos = w.pos_depth.astype(dtype)
    gate = pos * within  # [N]

    xw = residuals.points_world(kf0.homo0, depth0, p0)
    jac_x_pose0 = residuals.point_jac_pose0(xw, p1.rot)  # [N, 3, 6]

    err_total = jnp.zeros((), dtype)
    n_inl = jnp.zeros((), dtype)

    c = shared.feat_pyr.shape[0]
    packed_fg = _packed_fg(shared, cam_pyr)

    # Per-channel Jacobian rows factor as J_nc = g_nc^T K_n with K_n [2, 29]
    # shared geometry rows, collapsing the channel sum into a per-point 2x2
    # gradient Gram (same algebra as the reference's L*N*C x 29 row matmul,
    # photometric_factor_kernels.cpp:1143-1152, at ~1/30 the FLOPs).
    # Moreover K_n at level l is just diag(rx_l, ry_l) K_n at level 0 (every
    # u-row term is proportional to fx, every v-row term to fy), so the
    # LEVEL sum also collapses:
    #   AtA = K0^T (sum_l w_l S_l Gram_l S_l) K0,  S_l = diag(rx_l, ry_l)
    # leaving ONE (29 x 2N)(2N x 29) matmul per edge instead of 4 — the
    # tiny-M batched einsum per level was the BA hot spot on TPU.
    g_acc = jnp.zeros((kf0.homo0.shape[0], 2, 2), dtype)  # [N, 2, 2]
    hv_acc = jnp.zeros((kf0.homo0.shape[0], 2), dtype)  # [N, 2]

    cam0_f = cam_pyr[0]
    for lvl in range(cam_pyr.levels):
        cam_l = cam_pyr[lvl]
        f0 = kf0.src_feats[lvl]  # [N, C]
        # ONE pair-packed gather covers features + grad pyramid at the
        # warped locations (kernels :140-222) — 2 takes instead of 8
        fg = _per_level_packed(
            cam_pyr, lvl, u1, v1, packed_fg, fr1.base_pyr
        )  # [N, 3C]
        f1 = fg[:, :c]  # [N, C]
        # packed grad columns are (d, c)-ordered -> [N, 2, C], no transpose
        g1 = fg[:, c:].reshape(-1, 2, c) * gate[:, None, None]

        diff = gate[:, None] * (f0 - f1)  # [N, C]
        err_pt = gate * jnp.sum((f0 - f1) ** 2, axis=-1)
        if lvl == 0:
            n_inl = jnp.sum(gate)

        gram = jnp.einsum("ndc,nec->nde", g1, g1)  # [N, 2, 2]
        h_vec = jnp.einsum("ndc,nc->nd", g1, diff)  # [N, 2]

        wl = jnp.asarray(weights[lvl], dtype)
        s = jnp.asarray(
            [cam_l.fx / cam0_f.fx, cam_l.fy / cam0_f.fy], dtype
        )  # [2] level focal ratios
        g_acc = g_acc + (wl * s[:, None] * s[None, :]) * gram
        hv_acc = hv_acc + (wl * s) * h_vec
        err_total = err_total + wl * jnp.sum(err_pt)

    # geometry rows once, at full-res intrinsics
    jp = residuals.proj_jac_point(w.points_in_1, cam0_f.fx, cam0_f.fy)
    j2d_pose0 = jnp.einsum("nij,njk->nik", jp, jac_x_pose0)  # [N,2,6]
    j2d_dpt = residuals.proj_jac_depth(
        w.rotated_homo, w.points_in_1, cam0_f.fx, cam0_f.fy
    )  # [N, 2]
    j2d_code = (
        j2d_dpt[..., None] * (scale0 * dpt_jac_code_at)[:, None, :]
    )  # [N, 2, CS]
    j2d_scale = j2d_dpt * (depth0 / scale0)[..., None]  # [N, 2]
    k_rows = jnp.concatenate(
        [j2d_pose0, -j2d_pose0, j2d_code, j2d_scale[..., None]],
        axis=-1,
    )  # [N, 2, 29]

    kg = jnp.einsum("nab,nbq->naq", g_acc, k_rows)  # [N, 2, 29] (VPU)
    k_flat = k_rows.reshape(-1, dim)  # [2N, 29]
    ata = k_flat.T @ kg.reshape(-1, dim)  # ONE MXU matmul
    atb = k_flat.T @ hv_acc.reshape(-1)

    w_sum = jnp.sum(jnp.asarray(weights, dtype))
    has_inl = n_inl > 0
    inv = jnp.where(has_inl, 1.0 / jnp.maximum(n_inl, 1.0), 0.0)
    error = jnp.where(has_inl, err_total * inv, w_sum * 10.0)
    return ata * inv, atb * inv, error, n_inl
