"""Reprojection factor — 2D pixel residuals over descriptor matches.

Reference: cuda/reprojection_factor_kernels.cpp (+ reprojection_factor.cpp).
Residual per match m: r_m = u_matched_1 - proj(T10 * (d0 h0_m)) with fair
robust loss per pixel component; gated by warped depth z > eps.

Variables (p0, p1, c0, s0) — dim 13+CS (reprojection_factor.h:78); layout
[p0(6), p1(6), c0(CS), s0(1)] like the photometric factor.

Host reduce (kernels): error = (weight/n_inl) sum(rho); AtA/(n_inl);
zero-inlier penalty error = weight*10, zeros. The weight passed in is
``inlier_multiplier * factor_weight`` where inlier_multiplier =
desc_inlier_ratio of the match construction (reprojection_factor.cpp:189,
:360). loss_param = reproj_loss_param_factor * width^2 (mapper.cpp:357).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import PinholeCamera
from ..geometry.se3 import SE3
from . import residuals
from .depth import decode_depth_at
from .robust_loss import fair_error, fair_sqrt_weight


class ReprojMatchSet(NamedTuple):
    loc1d_0: jax.Array  # [M] int32 pixel ids in kf0
    homo_0: jax.Array  # [M, 3]
    matched_2d_1: jax.Array  # [M, 2] pixel coords in frame 1
    valid: jax.Array  # [M] 0/1


def reprojection_jac_error(
    p0: SE3,
    p1: SE3,
    code0,
    scale0,
    bias0_flat,
    jac0_flat,
    matches: ReprojMatchSet,
    cam: PinholeCamera,
    weight,  # = inlier_multiplier * factor_weight
    loss_param,
    eps: float,
):
    """Returns (AtA [13+CS, 13+CS], Atb, error, n_inliers)."""
    cs = jac0_flat.shape[-1]
    dim = 13 + cs
    d0 = decode_depth_at(bias0_flat, jac0_flat, matches.loc1d_0, code0, scale0)
    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    w = residuals.warp(matches.homo_0, d0, rot10, t10, eps)
    # gated points must not divide by their (possibly ~0) z: the
    # reference's CUDA thread SKIPS them outright; 1/z -> inf times the
    # 0 gate is NaN and poisons the whole AtA (safe_points semantics)
    pts = residuals.safe_points(w.points_in_1, w.pos_depth)
    u, v = residuals.project_full_res(
        pts, cam.fx, cam.fy, cam.cx, cam.cy
    )
    proj = jnp.stack([u, v], axis=-1)  # [M, 2]
    diff = matches.matched_2d_1 - proj
    pos = w.pos_depth.astype(diff.dtype) * matches.valid
    sw = fair_sqrt_weight(diff, loss_param) * pos[:, None]
    err_pt = fair_error(diff, loss_param) * pos

    jp = residuals.proj_jac_point(pts, cam.fx, cam.fy)  # [M,2,3]
    xw = residuals.points_world(matches.homo_0, d0, p0)
    jac_x_p0 = residuals.point_jac_pose0(xw, p1.rot)
    j2d_p0 = jnp.einsum("mij,mjk->mik", jp, jac_x_p0)  # [M, 2, 6]
    j2d_dpt = residuals.proj_jac_depth(
        w.rotated_homo, pts, cam.fx, cam.fy
    )  # [M, 2]
    jc = jnp.take(jac0_flat, matches.loc1d_0, axis=0)  # [M, CS]
    j2d_code = j2d_dpt[..., None] * (scale0 * jc)[:, None, :]  # [M, 2, CS]
    j2d_scale = j2d_dpt * (d0 / scale0)[:, None]  # [M, 2]

    rows = jnp.concatenate(
        [j2d_p0, -j2d_p0, j2d_code, j2d_scale[..., None]], axis=-1
    )  # [M, 2, 13+CS]
    rows = rows * sw[..., None]
    rows2 = rows.reshape(-1, dim)
    diffs = (sw * diff).reshape(-1)

    n_inl = jnp.sum(pos)
    has = n_inl > 0
    inv = jnp.where(has, weight / jnp.maximum(n_inl, 1.0), 0.0)
    ata = inv * (rows2.T @ rows2)
    atb = inv * (rows2.T @ diffs)
    error = jnp.where(has, inv * jnp.sum(err_pt), weight * 10.0)
    return ata, atb, error, n_inl


def reprojection_error(
    p0,
    p1,
    code0,
    scale0,
    bias0_flat,
    jac0_flat,
    matches: ReprojMatchSet,
    cam: PinholeCamera,
    weight,
    loss_param,
    eps: float,
):
    d0 = decode_depth_at(bias0_flat, jac0_flat, matches.loc1d_0, code0, scale0)
    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    w = residuals.warp(matches.homo_0, d0, rot10, t10, eps)
    pts = residuals.safe_points(w.points_in_1, w.pos_depth)
    u, v = residuals.project_full_res(
        pts, cam.fx, cam.fy, cam.cx, cam.cy
    )
    diff = matches.matched_2d_1 - jnp.stack([u, v], axis=-1)
    pos = w.pos_depth.astype(diff.dtype) * matches.valid
    err_pt = fair_error(diff, loss_param) * pos
    n_inl = jnp.sum(pos)
    has = n_inl > 0
    return (
        jnp.where(
            has,
            weight * jnp.sum(err_pt) / jnp.maximum(n_inl, 1.0),
            weight * 10.0,
        ),
        n_inl,
    )


def tracker_reproj_jac_error(
    rot10,
    t10,
    depth0,  # [M] scaled depths at matched kf0 points
    homo_0,
    matched_2d_1,
    valid,
    cam: PinholeCamera,
    weight,
    loss_param,
    eps: float,
    scale0=None,
):
    """Tracker variant: relative-pose-only (6) or +scale (7)
    (reprojection kernels tracker_* :10-24 of the header). Jacobian wrt
    relative pose tangent uses loc_3d_0_in_1 directly."""
    rh = homo_0 @ rot10.T
    x1 = depth0[:, None] * rh + t10
    pos_depth = (x1[:, 2] > eps).astype(homo_0.dtype)
    x1 = residuals.safe_points(x1, x1[:, 2] > eps)
    u = x1[:, 0] / x1[:, 2] * cam.fx + cam.cx
    v = x1[:, 1] / x1[:, 2] * cam.fy + cam.cy
    diff = matched_2d_1 - jnp.stack([u, v], axis=-1)
    pos = pos_depth * valid
    sw = fair_sqrt_weight(diff, loss_param) * pos[:, None]
    err_pt = fair_error(diff, loss_param) * pos

    inv_z = 1.0 / x1[:, 2]
    x_z = x1[:, 0] * inv_z
    y_z = x1[:, 1] * inv_z
    zero = jnp.zeros_like(inv_z)
    pj = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * x_z * inv_z], axis=-1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * y_z * inv_z], axis=-1),
        ],
        axis=-2,
    )  # [M, 2, 3]
    x, y, z = x1[:, 0], x1[:, 1], x1[:, 2]
    one = jnp.ones_like(x)
    jac_rel = jnp.stack(
        [
            jnp.stack([one, zero, zero, zero, z, -y], axis=-1),
            jnp.stack([zero, one, zero, -z, zero, x], axis=-1),
            jnp.stack([zero, zero, one, y, -x, zero], axis=-1),
        ],
        axis=-2,
    )  # [M, 3, 6]
    j2d = jnp.einsum("mij,mjk->mik", pj, jac_rel)  # [M, 2, 6]
    if scale0 is not None:
        j2d_dpt = residuals.proj_jac_depth(rh, x1, cam.fx, cam.fy)
        jscale = (j2d_dpt * (depth0 / scale0)[:, None])[..., None]
        rows = jnp.concatenate([j2d, jscale], axis=-1)
        dim = 7
    else:
        rows = j2d
        dim = 6
    rows = rows * sw[..., None]
    rows2 = rows.reshape(-1, dim)
    diffs = (sw * diff).reshape(-1)
    n_inl = jnp.sum(pos)
    has = n_inl > 0
    inv = jnp.where(has, weight / jnp.maximum(n_inl, 1.0), 0.0)
    ata = inv * (rows2.T @ rows2)
    atb = inv * (rows2.T @ diffs)
    error = jnp.where(has, inv * jnp.sum(err_pt), weight * 10.0)
    return ata, atb, error, n_inl
