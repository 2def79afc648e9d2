"""Geometric (depth-consistency) factor — Cauchy-robustified.

Reference: cuda/geometric_factor_kernels.cpp (biased variant, :474-718 —
the active path, geometric_factor.cpp:335-347) + host reduce.

Residual per sampled point of kf0 warped into kf1:
  r = within_mask * (d1_sampled - z1),
where z1 is the warped depth and d1_sampled is kf1's *scaled* decoded
depth bilinearly sampled at the warped pixel. Robustification stores
``sqrt_w * r`` and ``sqrt_w * J`` with
``sqrt_w = within * sqrt(1 / (r_raw^2 + loss_param))`` gated by z1 > eps;
the *error* is the true Cauchy cost ``log(1 + (within*r)^2 / loss_param)``.

Jacobian sign convention: rows store d(z1 - d1)/d(params) = -dr/dx (same
convention as the photometric factor), so the GN step is AtA^-1 Atb.

Hessian block layout (dim 14+2CS):
  [0:6] pose0, [6:12] pose1, [12:12+CS] code0, [12+CS:12+2CS] code1,
  [12+2CS] scale0, [13+2CS] scale1  (geometric_factor.h:70).

Memory layout: per-keyframe depth tables come from SHARED flat arrays
(GeoShared) indexed by per-edge base offsets (see ops/photometric.py).
Operates at full output resolution (single level).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import interp
from ..geometry.camera import PinholeCamera
from ..geometry.se3 import SE3
from . import residuals


class GeoShared(NamedTuple):
    """Shared flat depth tables: bias_flat [K*HW], jac_flat [K*HW, CS],
    mask_flat [HW].

    packed_full / packed_dpt are optional quad-packed gather tables over
    the CURRENT variables' decoded frame-1 rows (build_frame1_tables);
    they hoist the per-edge full-frame depth decode + spatial grad + pack
    out of the per-edge path (edges sharing a target keyframe re-used to
    redo it per edge). They depend on (code, scale), so they are rebuilt
    once per linearization, not once per problem."""

    bias_flat: jax.Array
    jac_flat: jax.Array
    mask_flat: jax.Array
    packed_full: jax.Array | None = None  # [K*R, 4*(3+CS)], R = HW+w+1
    packed_dpt: jax.Array | None = None  # [K*R, 4]


class GeoKf0(NamedTuple):
    loc1d: jax.Array  # [N] int32
    homo0: jax.Array  # [N, 3]
    base_hw: jax.Array  # scalar int32 kf0_index * HW


class GeoKf1(NamedTuple):
    base_hw: jax.Array  # scalar int32 kf1_index * HW


def build_frame1_tables(
    bias: jax.Array,  # [K, HW]
    jac: jax.Array,  # [K, HW, CS]
    codes: jax.Array,  # [K, CS]
    scales: jax.Array,  # [K]
    cam: PinholeCamera,
):
    """Quad-packed per-keyframe frame-1 tables for the CURRENT variables:
    (packed_full [K*R, 4*(3+CS)] holding [scaled depth | scaled grad (2) |
    raw code jacobian], packed_dpt [K*R, 4] scaled depth only)."""
    from .pyramid import spatial_grad

    k, hw = bias.shape
    h, w = cam.height, cam.width
    unscaled = bias + jnp.einsum("khc,kc->kh", jac, codes)  # [K, HW]
    grad = spatial_grad(unscaled.reshape(k, h, w))  # [2, K, H, W]
    dpt = scales[:, None] * unscaled  # [K, HW]
    grad_rows = (
        scales[None, :, None] * grad.reshape(2, k, hw)
    ).transpose(1, 2, 0)  # [K, HW, 2]
    rows = jnp.concatenate([dpt[..., None], grad_rows, jac], axis=-1)
    packed_full = interp.pack_quads_level(rows, w).reshape(
        k * (hw + w + 1), -1
    )
    packed_dpt = interp.pack_quads_level(dpt[..., None], w).reshape(
        k * (hw + w + 1), -1
    )
    return packed_full, packed_dpt


def _quad_base(kf1: GeoKf1, hw: int, w: int):
    """Frame-1 row offset in the quad tables from the pixel offset."""
    return (kf1.base_hw // hw) * (hw + w + 1)


def _decode_depth0(shared: GeoShared, kf0: GeoKf0, code0, scale0):
    loc = kf0.base_hw + kf0.loc1d
    bias = jnp.take(shared.bias_flat, loc)
    jac = jnp.take(shared.jac_flat, loc, axis=0)
    return scale0 * (bias + jac @ code0), jac


def _decode_frame1(shared: GeoShared, kf1: GeoKf1, code1, scale1, hw, h, w):
    """Full-frame scaled depth + spatial grad of kf1
    (geometric_factor.cpp:317-320, 340-341). Fallback when the shared
    quad tables are absent (tests / standalone use)."""
    from .pyramid import spatial_grad

    bias1 = jax.lax.dynamic_slice(shared.bias_flat, (kf1.base_hw,), (hw,))
    jac1 = jax.lax.dynamic_slice(
        shared.jac_flat, (kf1.base_hw, 0), (hw, shared.jac_flat.shape[-1])
    )
    unscaled = (bias1 + jac1 @ code1).reshape(h, w)
    grad = spatial_grad(unscaled[None])[:, 0]  # [2, H, W]
    return scale1 * unscaled.reshape(-1), scale1 * grad.reshape(2, -1), jac1


def geometric_jac_error(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    code1: jax.Array,
    scale0: jax.Array,
    scale1: jax.Array,
    kf0: GeoKf0,
    kf1: GeoKf1,
    shared: GeoShared,
    cam: PinholeCamera,
    factor_weight: float,
    loss_param,
    eps: float,
):
    """Returns (AtA [D,D], Atb [D], error, n_inliers), D = 14+2CS."""
    cs = shared.jac_flat.shape[-1]
    dim = 14 + 2 * cs
    dtype = kf0.homo0.dtype
    h, w = cam.height, cam.width
    hw = h * w

    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    depth0, jac_code0_at = _decode_depth0(shared, kf0, code0, scale0)
    warped = residuals.warp(kf0.homo0, depth0, rot10, t10, eps)
    u1, v1 = residuals.project_full_res(
        warped.points_in_1, cam.fx, cam.fy, cam.cx, cam.cy
    )

    # ONE quad-packed gather for [depth | grad | code-jacobian rows]
    if shared.packed_full is not None:
        v = interp.bilinear_quad(
            shared.packed_full, u1, v1, w, h, _quad_base(kf1, hw, w)
        )
    else:
        dpt_map_1, dpt_grad_1, jac1_full = _decode_frame1(
            shared, kf1, code1, scale1, hw, h, w
        )
        rows1 = jnp.concatenate(
            [dpt_map_1[:, None], dpt_grad_1.T, jac1_full], axis=-1
        )  # [HW, 3+CS]
        v = interp.bilinear_quad(
            interp.pack_quads_level(rows1, w), u1, v1, w, h
        )
    d1 = v[:, 0]  # [N]
    g1 = v[:, 1:3].T  # [2, N]
    jac1 = v[:, 3:]  # [N, CS] raw
    within = interp.nearest_flat(shared.mask_flat, u1, v1, w, h)
    pos = warped.pos_depth.astype(dtype)

    z1 = warped.points_in_1[..., 2]
    raw = d1 - z1
    err_pt = pos * jnp.log1p((within * raw) ** 2 / loss_param)
    sqrt_w = pos * within * jax.lax.rsqrt(raw**2 + loss_param)

    # geometry jacobians
    jp = residuals.proj_jac_point(warped.points_in_1, cam.fx, cam.fy)
    xw = residuals.points_world(kf0.homo0, depth0, p0)
    jac_x_p0 = residuals.point_jac_pose0(xw, p1.rot)  # [N, 3, 6]
    j2d_p0 = jnp.einsum("nij,njk->nik", jp, jac_x_p0)  # [N, 2, 6]
    grad_dot_j2d_p0 = jnp.einsum("dn,ndk->nk", g1, j2d_p0)  # [N, 6]
    # d(z1 - d1)/d pose0: loc_jac row2 - grad.proj_jac (kernel :674-681)
    jpose0 = jac_x_p0[:, 2, :] - grad_dot_j2d_p0  # [N, 6]
    jpose1 = -jpose0

    j2d_dpt = residuals.proj_jac_depth(
        warped.rotated_homo, warped.points_in_1, cam.fx, cam.fy
    )  # [N, 2]
    d1_jac_dpt0 = jnp.einsum("dn,nd->n", g1, j2d_dpt)  # [N]
    rh_z = warped.rotated_homo[..., 2]
    # (rh_z - d(d1)/d(dpt0)) * scale0 * dJcode0 (kernel :686, :697)
    jcode0 = ((rh_z - d1_jac_dpt0) * scale0)[:, None] * jac_code0_at
    jcode1 = -scale1 * jac1  # [N, CS] (kernel :698)
    jscale0 = (rh_z - d1_jac_dpt0) * depth0 / scale0  # (kernel :688)
    jscale1 = -d1 / scale1  # (kernel :689)

    rows = jnp.concatenate(
        [
            jpose0,
            jpose1,
            jcode0,
            jcode1,
            jscale0[:, None],
            jscale1[:, None],
        ],
        axis=-1,
    )  # [N, D]
    rows = rows * sqrt_w[:, None]
    diff = sqrt_w * raw

    n_inl = jnp.sum(pos * within)
    has = n_inl > 0
    inv = jnp.where(has, factor_weight / jnp.maximum(n_inl, 1.0), 0.0)
    ata = inv * (rows.T @ rows)
    atb = inv * (rows.T @ diff)
    error = jnp.where(has, inv * jnp.sum(err_pt), factor_weight * 10.0)
    return ata, atb, error, n_inl


def geometric_error(
    p0: SE3,
    p1: SE3,
    code0: jax.Array,
    code1: jax.Array,
    scale0: jax.Array,
    scale1: jax.Array,
    kf0: GeoKf0,
    kf1: GeoKf1,
    shared: GeoShared,
    cam: PinholeCamera,
    factor_weight: float,
    loss_param,
    eps: float,
):
    """Error-only path (geometric_error_calculate, kernel :126-217)."""
    h, w = cam.height, cam.width
    hw = h * w
    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    depth0, _ = _decode_depth0(shared, kf0, code0, scale0)
    warped = residuals.warp(kf0.homo0, depth0, rot10, t10, eps)
    u1, v1 = residuals.project_full_res(
        warped.points_in_1, cam.fx, cam.fy, cam.cx, cam.cy
    )
    if shared.packed_dpt is not None:
        d1 = interp.bilinear_quad(
            shared.packed_dpt, u1, v1, w, h, _quad_base(kf1, hw, w)
        )[:, 0]
    else:
        bias1 = jax.lax.dynamic_slice(
            shared.bias_flat, (kf1.base_hw,), (hw,)
        )
        jac1 = jax.lax.dynamic_slice(
            shared.jac_flat, (kf1.base_hw, 0), (hw, shared.jac_flat.shape[-1])
        )
        dpt_map_1 = scale1 * (bias1 + jac1 @ code1)
        d1 = interp.bilinear_quad(
            interp.pack_quads_level(dpt_map_1[:, None], w), u1, v1, w, h
        )[:, 0]
    within = interp.nearest_flat(shared.mask_flat, u1, v1, w, h)
    pos = warped.pos_depth.astype(d1.dtype)
    raw = d1 - warped.points_in_1[..., 2]
    err_pt = pos * jnp.log1p((within * raw) ** 2 / loss_param)
    n_inl = jnp.sum(pos * within)
    has = n_inl > 0
    error = jnp.where(
        has,
        factor_weight * jnp.sum(err_pt) / jnp.maximum(n_inl, 1.0),
        factor_weight * 10.0,
    )
    return error, n_inl
