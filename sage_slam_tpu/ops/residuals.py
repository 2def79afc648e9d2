"""Shared warp + Jacobian geometry for all factor kernels.

Implements the per-point geometry that every reference CUDA kernel repeats
(photometric_factor_kernels.cpp:78-335, geometric_factor_kernels.cpp:353-470),
vectorized over points. All functions take/return batched arrays [N, ...]
and are vmap/jit friendly.

Conventions:
* ``pose_wk`` = world-from-keyframe; relative pose ``T_10 = T_1^-1 T_0``
  maps kf0 camera points into kf1's camera frame,
* left-multiplicative pose tangents [trans, rot] (see geometry.se3),
* 3D point jacobians w.r.t. pose0 / pose1 satisfy J_pose1 = -J_pose0
  (verified against the reference formulas, which compute both).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3


class WarpResult(NamedTuple):
    rotated_homo: jax.Array  # [N, 3] R10 @ homo0
    points_in_1: jax.Array  # [N, 3] d0 * rotated_homo + t10
    pos_depth: jax.Array  # [N] bool: z > eps


def relative_pose_tensors(p0: SE3, p1: SE3):
    """R10 = R1^T R0, t10 = R1^T (t0 - t1) (photometric_factor.cpp:280-281).

    Forced f32 precision: the TPU default (bf16 MXU passes) would lose
    ~3 decimal digits on the rotation products that every residual and
    Jacobian downstream depends on."""
    hp = jax.lax.Precision.HIGHEST
    rot10 = jnp.matmul(
        jnp.swapaxes(p1.rot, -1, -2), p0.rot, precision=hp
    )
    t10 = jnp.einsum(
        "...ji,...j->...i", p1.rot, p0.trans - p1.trans, precision=hp
    )
    return rot10, t10


def warp(
    homo0: jax.Array,  # [N, 3]
    depth0: jax.Array,  # [N]
    rot10: jax.Array,  # [3, 3]
    t10: jax.Array,  # [3]
    eps: float,
) -> WarpResult:
    """Rigid warp of kf0 rays into frame 1 (kernels :78-97)."""
    rh = homo0 @ rot10.T
    x1 = depth0[..., None] * rh + t10
    return WarpResult(rh, x1, x1[..., 2] > eps)


def safe_points(points: jax.Array, pos: jax.Array) -> jax.Array:
    """Replace the z of depth-gated-OUT points ([..., 2] <= eps) with 1
    so downstream 1/z never produces inf: gated contributions are
    multiplied by a 0 gate, and 0 * inf = NaN would otherwise poison the
    whole reduction (the reference's CUDA threads skip gated points
    before any division, kernels :78-97)."""
    z = jnp.where(pos, points[..., 2], jnp.ones_like(points[..., 2]))
    return points.at[..., 2].set(z)


def project_full_res(points: jax.Array, fx, fy, cx, cy):
    """Pinhole projection at full resolution, NO depth clamp
    (kernels :142-144 use raw z)."""
    z = points[..., 2]
    u = points[..., 0] / z * fx + cx
    v = points[..., 1] / z * fy + cy
    return u, v


def proj_jac_point(points_in_1: jax.Array, fx, fy) -> jax.Array:
    """d(proj2d)/d(point_in_1): [N, 2, 3] with the *level* focal lengths
    (kernels :241-245)."""
    inv_z = 1.0 / points_in_1[..., 2]
    x_z = points_in_1[..., 0] * inv_z
    y_z = points_in_1[..., 1] * inv_z
    zero = jnp.zeros_like(inv_z)
    row0 = jnp.stack([fx * inv_z, zero, -fx * x_z * inv_z], axis=-1)
    row1 = jnp.stack([zero, fy * inv_z, -fy * y_z * inv_z], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def point_jac_pose0(
    points_world: jax.Array,  # [N, 3] world-frame points
    rot1: jax.Array,  # [3, 3] world-from-kf1 rotation
) -> jax.Array:
    """d(point_in_1)/d(pose0 tangent): [N, 3, 6] = R1^T [I | -hat(Xw)]
    (kernels :283-297). The pose1 jacobian is exactly the negative."""
    n = points_world.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points_world.dtype), (n, 3, 3))
    xw, yw, zw = (
        points_world[..., 0],
        points_world[..., 1],
        points_world[..., 2],
    )
    zero = jnp.zeros_like(xw)
    # -hat(Xw)
    neg_hat = jnp.stack(
        [
            jnp.stack([zero, zw, -yw], axis=-1),
            jnp.stack([-zw, zero, xw], axis=-1),
            jnp.stack([yw, -xw, zero], axis=-1),
        ],
        axis=-2,
    )
    block = jnp.concatenate([eye, neg_hat], axis=-1)  # [N, 3, 6]
    # R1^T @ block: contract rot1's FIRST axis (rot1[i, j] = (R1^T)[j, i])
    return jnp.einsum("ij,nik->njk", rot1, block)


def proj_jac_depth(
    rotated_homo: jax.Array,  # [N, 3]
    points_in_1: jax.Array,  # [N, 3]
    fx,
    fy,
) -> jax.Array:
    """d(proj2d)/d(depth0): [N, 2] (kernels :324-325)."""
    inv_z = 1.0 / points_in_1[..., 2]
    jx = fx * (
        rotated_homo[..., 0] * inv_z
        - points_in_1[..., 0] * rotated_homo[..., 2] * inv_z * inv_z
    )
    jy = fy * (
        rotated_homo[..., 1] * inv_z
        - points_in_1[..., 1] * rotated_homo[..., 2] * inv_z * inv_z
    )
    return jnp.stack([jx, jy], axis=-1)


def points_world(
    homo0: jax.Array, depth0: jax.Array, p0: SE3
) -> jax.Array:
    """Xw = d0 * R0 homo0 + t0 (kernels :247-255)."""
    return depth0[..., None] * (homo0 @ p0.rot.T) + p0.trans
