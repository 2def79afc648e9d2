"""Match-geometry factors — 3D point-pair residuals over descriptor matches.

Reference: cuda/match_geometry_factor_kernels.cpp. Three variants:

* ``match_geometry_jac_error`` — full factor over (p0, p1, c0, c1, s0, s1),
  fair robust loss (the active `robust_loss_type`, "fair" kernel :577-726).
  Residual per match m: r_m = d1*h1_m - (d0*R10 h0_m + t10)  in frame 1,
  with d0/d1 decoded at the matched pixels (biased scaling: d = s*(b+Jc)).
* ``loop_mg_jac_error`` — pose+scale-only variant with FROZEN unscaled
  depths (kernel :294-418; used by LoopClosurePoseScaleMGEstimate,
  deepfactors.cpp:479-528). Dim 14: [p0, p1, s0, s1].
* ``tracker_mg_jac_error`` — relative-pose(±scale) variant for the camera
  tracker (kernel :134-292).

Host reduction (kernels .cpp:1676+): error = weight * mean(rho),
AtA = (weight/M) rows^T rows over the M matches (no inlier gating — the
match set is pre-filtered by cycle-consistency + robust registration).
With padded static match tables we replicate "mean over real matches" by
masking and dividing by the valid count.

Block layout (dim 14+2CS): [p0(6), p1(6), c0(CS), c1(CS), s0, s1]
(match_geometry_factor.h:81).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from . import residuals
from .depth import decode_depth_at
from .robust_loss import fair_error, fair_sqrt_weight


class MatchSet(NamedTuple):
    """Static-size matched point pairs between kf0 and kf1 (padded)."""

    loc1d_0: jax.Array  # [M] int32 pixel ids in kf0
    homo_0: jax.Array  # [M, 3]
    loc1d_1: jax.Array  # [M] int32 pixel ids in kf1
    homo_1: jax.Array  # [M, 3]
    valid: jax.Array  # [M] 0/1


def _point_pair_core(p0, p1, homo_0, depth0, homo_1, depth1):
    rot10, t10 = residuals.relative_pose_tensors(p0, p1)
    rh = homo_0 @ rot10.T  # [M, 3]
    x1 = depth0[:, None] * rh + t10
    matched = depth1[:, None] * homo_1
    diff = matched - x1  # [M, 3]
    return rh, x1, diff


def _pose_jacs(homo_0, depth0, p0, p1):
    """loc_3d jacobians wrt pose0/pose1 tangents; J_p1 = -J_p0."""
    xw = residuals.points_world(homo_0, depth0, p0)
    jac_p0 = residuals.point_jac_pose0(xw, p1.rot)  # [M, 3, 6]
    return jac_p0


def match_geometry_jac_error(
    p0: SE3,
    p1: SE3,
    code0,
    code1,
    scale0,
    scale1,
    bias0_flat,
    jac0_flat,
    bias1_flat,
    jac1_flat,
    matches: MatchSet,
    factor_weight,
    loss_param,
):
    """Full MG factor (fair). Returns (AtA [D,D], Atb [D], error, n_valid)."""
    cs = jac0_flat.shape[-1]
    dim = 14 + 2 * cs
    dtype = matches.homo_0.dtype

    d0 = decode_depth_at(bias0_flat, jac0_flat, matches.loc1d_0, code0, scale0)
    d1 = decode_depth_at(bias1_flat, jac1_flat, matches.loc1d_1, code1, scale1)
    rh, x1, diff = _point_pair_core(
        p0, p1, matches.homo_0, d0, matches.homo_1, d1
    )
    sw = fair_sqrt_weight(diff, loss_param)  # [M, 3]
    err_pt = fair_error(diff, loss_param)  # [M]

    jac_p0 = _pose_jacs(matches.homo_0, d0, p0, p1)  # [M, 3, 6]
    jc0 = jnp.take(jac0_flat, matches.loc1d_0, axis=0)  # [M, CS]
    jc1 = jnp.take(jac1_flat, matches.loc1d_1, axis=0)
    # per-component rows [M, 3, D]
    jcode0 = rh[:, :, None] * (scale0 * jc0)[:, None, :]  # [M, 3, CS]
    jcode1 = -matches.homo_1[:, :, None] * (scale1 * jc1)[:, None, :]
    jscale0 = rh * (d0 / scale0)[:, None]  # [M, 3]
    jscale1 = -matches.homo_1 * (d1 / scale1)[:, None]

    rows = jnp.concatenate(
        [
            jac_p0,
            -jac_p0,
            jcode0,
            jcode1,
            jscale0[:, :, None],
            jscale1[:, :, None],
        ],
        axis=-1,
    )  # [M, 3, D]
    rows = rows * sw[..., None] * matches.valid[:, None, None]
    diffs = (sw * diff * matches.valid[:, None]).reshape(-1)
    rows2 = rows.reshape(-1, dim)

    m = jnp.maximum(jnp.sum(matches.valid), 1.0)
    has = jnp.sum(matches.valid) > 0
    inv = jnp.where(has, factor_weight / m, 0.0)
    ata = inv * (rows2.T @ rows2)
    atb = inv * (rows2.T @ diffs)
    error = jnp.where(
        has, inv * jnp.sum(err_pt * matches.valid), factor_weight * 10.0
    )
    return ata, atb, error, jnp.sum(matches.valid)


def match_geometry_error(
    p0,
    p1,
    code0,
    code1,
    scale0,
    scale1,
    bias0_flat,
    jac0_flat,
    bias1_flat,
    jac1_flat,
    matches: MatchSet,
    factor_weight,
    loss_param,
):
    d0 = decode_depth_at(bias0_flat, jac0_flat, matches.loc1d_0, code0, scale0)
    d1 = decode_depth_at(bias1_flat, jac1_flat, matches.loc1d_1, code1, scale1)
    _, _, diff = _point_pair_core(
        p0, p1, matches.homo_0, d0, matches.homo_1, d1
    )
    err_pt = fair_error(diff, loss_param)
    m = jnp.maximum(jnp.sum(matches.valid), 1.0)
    has = jnp.sum(matches.valid) > 0
    return jnp.where(
        has,
        factor_weight * jnp.sum(err_pt * matches.valid) / m,
        factor_weight * 10.0,
    )


def loop_mg_jac_error(
    p0: SE3,
    p1: SE3,
    scale0,
    scale1,
    unscaled_d0,  # [M] frozen unscaled depths of kf0 at matches
    unscaled_d1,  # [M]
    homo_0,
    homo_1,
    valid,
    factor_weight,
    loss_param,
):
    """Pose+scale-only MG (loop graph). Dim 14: [p0, p1, s0, s1]."""
    d0 = unscaled_d0 * scale0
    d1 = unscaled_d1 * scale1
    rh, x1, diff = _point_pair_core(p0, p1, homo_0, d0, homo_1, d1)
    sw = fair_sqrt_weight(diff, loss_param)
    err_pt = fair_error(diff, loss_param)
    jac_p0 = _pose_jacs(homo_0, d0, p0, p1)
    jscale0 = rh * unscaled_d0[:, None]
    jscale1 = -homo_1 * unscaled_d1[:, None]
    rows = jnp.concatenate(
        [jac_p0, -jac_p0, jscale0[:, :, None], jscale1[:, :, None]], axis=-1
    )
    rows = rows * sw[..., None] * valid[:, None, None]
    diffs = (sw * diff * valid[:, None]).reshape(-1)
    rows2 = rows.reshape(-1, 14)
    m = jnp.maximum(jnp.sum(valid), 1.0)
    has = jnp.sum(valid) > 0
    inv = jnp.where(has, factor_weight / m, 0.0)
    ata = inv * (rows2.T @ rows2)
    atb = inv * (rows2.T @ diffs)
    error = jnp.where(
        has, inv * jnp.sum(err_pt * valid), factor_weight * 10.0
    )
    return ata, atb, error


def tracker_mg_jac_error(
    rot10,
    t10,
    depth0,  # [M] depths of kf0 at matched points (already scaled)
    depth1,  # [M] matched depths in frame 1
    homo_0,
    homo_1,
    valid,
    factor_weight,
    loss_param,
    scale0=None,
):
    """Tracker MG: relative-pose-only (6) or +scale0 (7) variant
    (kernels :134-292). Jacobian wrt the relative pose tangent uses
    loc_3d_0_in_1 directly."""
    rh = homo_0 @ rot10.T
    x1 = depth0[:, None] * rh + t10
    matched = depth1[:, None] * homo_1
    diff = matched - x1
    sw = fair_sqrt_weight(diff, loss_param)
    err_pt = fair_error(diff, loss_param)

    m_pts = homo_0.shape[0]
    x, y, z = x1[:, 0], x1[:, 1], x1[:, 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    jac_rel = jnp.stack(
        [
            jnp.stack([one, zero, zero, zero, z, -y], axis=-1),
            jnp.stack([zero, one, zero, -z, zero, x], axis=-1),
            jnp.stack([zero, zero, one, y, -x, zero], axis=-1),
        ],
        axis=-2,
    )  # [M, 3, 6]
    if scale0 is not None:
        jscale = (rh * (depth0 / scale0)[:, None])[:, :, None]  # [M, 3, 1]
        rows = jnp.concatenate([jac_rel, jscale], axis=-1)
        dim = 7
    else:
        rows = jac_rel
        dim = 6
    rows = rows * sw[..., None] * valid[:, None, None]
    diffs = (sw * diff * valid[:, None]).reshape(-1)
    rows2 = rows.reshape(-1, dim)
    m = jnp.maximum(jnp.sum(valid), 1.0)
    has = jnp.sum(valid) > 0
    inv = jnp.where(has, factor_weight / m, 0.0)
    ata = inv * (rows2.T @ rows2)
    atb = inv * (rows2.T @ diffs)
    error = jnp.where(
        has, inv * jnp.sum(err_pt * valid), factor_weight * 10.0
    )
    return ata, atb, error
