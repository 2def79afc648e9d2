"""SE(3) utilities with the reference system's tangent conventions.

Conventions (must match the reference bit-for-bit to reproduce GN iterates):

* tangent layout is ``[translation(3), rotation(3)]``
  (reference: system/sources/core/gtsam/gtsam_traits.h:56-58),
* retract is LEFT-multiplicative: ``T_new = Exp(delta) * T``
  (gtsam_traits.h:45-70),
* ``local(a, b)`` is the *raw* translation of ``b * a^-1`` for the
  translation part (NO V^-1 applied) and ``Log(R_b R_a^-1)`` for rotation
  (gtsam_traits.h:78-89),
* the exponential clamps theta to >= 1e-14 and uses a fixed fallback axis
  for theta == 0 (gtsam_traits.h:107-137).

Everything here is batched (leading dims broadcast) and jit/vmap friendly.
Poses are stored as a pytree pair ``(rot [..., 3, 3], trans [..., 3])``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_THETA_MIN = 1.0e-14

# 3x3 pose-chain products are negligible FLOPs but their error compounds
# over long keyframe chains; TPU default matmul precision is bfloat16
# (~1e-3 relative), so pin these tiny contractions to full float32.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _rotv(rot, v):
    return jnp.einsum("...ij,...j->...i", rot, v, precision=_PREC)


class SE3(NamedTuple):
    """A rigid transform: x_out = rot @ x + trans."""

    rot: jax.Array  # [..., 3, 3]
    trans: jax.Array  # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        trans = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(rot, trans)

    @property
    def batch_shape(self):
        return self.trans.shape[:-1]

    def matrix(self) -> jax.Array:
        """[..., 4, 4] homogeneous matrix."""
        bottom = jnp.zeros((*self.batch_shape, 1, 4), self.rot.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.rot, self.trans[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


def hat(omega: jax.Array) -> jax.Array:
    """so(3) hat operator: [..., 3] -> [..., 3, 3]."""
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(ox)
    rows = jnp.stack(
        [
            jnp.stack([zero, -oz, oy], axis=-1),
            jnp.stack([oz, zero, -ox], axis=-1),
            jnp.stack([-oy, ox, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def _exp_coefficients(omega: jax.Array):
    """Smooth Rodrigues coefficients A = sin(t)/t, B = (1-cos(t))/t^2,
    C = (t-sin(t))/t^3 as functions of t^2 = |omega|^2.

    Mathematically identical to the reference's normalized-axis
    formulation (gtsam_traits.h:107-137; sin(t)*hat(w/t) == A*hat(w) etc.)
    but differentiable at omega == 0 — the reference clamps t to 1e-14
    which is indistinguishable in float32; we use the Taylor series below
    t^2 < 1e-8 instead so autodiff of retract at zero tangent is exact.
    """
    t2 = jnp.sum(omega**2, axis=-1)
    small = t2 < 1e-8
    # guard sqrt for differentiability at 0
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(t2), t2))
    st, ct = jnp.sin(t), jnp.cos(t)
    safe_t2 = jnp.where(small, jnp.ones_like(t2), t2)
    a = jnp.where(small, 1.0 - t2 / 6.0, st / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - ct) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - st) / (safe_t2 * t))
    return a, b, c


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues: matches the reference exp (gtsam_traits.h:107-137)."""
    a, b, _ = _exp_coefficients(omega)
    k = hat(omega)
    k2 = _mm(k, k)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def se3_exp(tau: jax.Array) -> SE3:
    """Exp of tangent [trans(3), rot(3)] -> SE3 (gtsam_traits.h:107-137)."""
    v, omega = tau[..., :3], tau[..., 3:6]
    a, b, c = _exp_coefficients(omega)
    k = hat(omega)
    k2 = _mm(k, k)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tau.dtype), k.shape)
    rot = eye + a[..., None, None] * k + b[..., None, None] * k2
    big_v = eye + b[..., None, None] * k + c[..., None, None] * k2
    trans = _rotv(big_v, v)
    return SE3(rot, trans)


def so3_log(rot: jax.Array) -> jax.Array:
    """Log map of SO(3): [..., 3, 3] -> [..., 3] (angle*axis).

    Numerically-safe standard formulation (used for pose distance and
    local(); the reference defers to Sophus' log here).
    """
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # near theta=0 use the smooth series in (3 - trace) ~ theta^2 so the
    # whole map is differentiable (arccos' grad blows up at cos=1)
    small = cos_theta > 1.0 - 1e-6
    # for small angles arccos is evaluated at a CONSTANT (pi/2) so no
    # unbounded gradient leaks through the untaken where-branch; the
    # small-angle omega below never uses theta itself
    theta = jnp.arccos(jnp.where(small, jnp.zeros_like(cos_theta), cos_theta))
    # vee of the antisymmetric part
    w = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # theta / (2 sin theta), safe at theta -> 0 (limit 1/2)
    theta_sq_small = 3.0 - trace  # ~ theta^2, smooth in R
    factor = jnp.where(
        small,
        0.5 + theta_sq_small / 12.0,
        theta / jnp.where(small, jnp.ones_like(sin_theta), 2.0 * sin_theta),
    )
    omega = factor[..., None] * w
    # near theta == pi, w ~ 0; fall back to diagonal-based extraction
    near_pi = theta > (jnp.pi - 1e-3)

    def _pi_branch():
        # R = I + 2*hat(a)^2 at theta=pi => a_i^2 = (R_ii + 1)/2
        diag = jnp.stack(
            [rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1
        )
        axis_sq = jnp.clip((diag + 1.0) * 0.5, 1e-12, 1.0)
        axis = jnp.sqrt(axis_sq)
        # fix signs using off-diagonal sums
        sx = jnp.where(rot[..., 2, 1] - rot[..., 1, 2] < 0, -1.0, 1.0)
        sy = jnp.where(rot[..., 0, 2] - rot[..., 2, 0] < 0, -1.0, 1.0)
        sz = jnp.where(rot[..., 1, 0] - rot[..., 0, 1] < 0, -1.0, 1.0)
        # prefer consistency with largest component via off-diagonals
        # a_x*a_y = (R01 + R10)/4 etc.; use sign of dominant axis positive
        axy = rot[..., 0, 1] + rot[..., 1, 0]
        axz = rot[..., 0, 2] + rot[..., 2, 0]
        ayz = rot[..., 1, 2] + rot[..., 2, 1]
        dominant = jnp.argmax(axis, axis=-1)
        sign_x = jnp.where(dominant == 0, 1.0, jnp.where(dominant == 1, jnp.sign(axy), jnp.sign(axz)))
        sign_y = jnp.where(dominant == 1, 1.0, jnp.where(dominant == 0, jnp.sign(axy), jnp.sign(ayz)))
        sign_z = jnp.where(dominant == 2, 1.0, jnp.where(dominant == 0, jnp.sign(axz), jnp.sign(ayz)))
        sign_x = jnp.where(sign_x == 0, sx, sign_x)
        sign_y = jnp.where(sign_y == 0, sy, sign_y)
        sign_z = jnp.where(sign_z == 0, sz, sign_z)
        a = axis * jnp.stack([sign_x, sign_y, sign_z], axis=-1)
        return theta[..., None] * a

    omega = jnp.where(near_pi[..., None], _pi_branch(), omega)
    return omega


def compose(a: SE3, b: SE3) -> SE3:
    """a * b (apply b first, then a)."""
    rot = _mm(a.rot, b.rot)
    trans = _rotv(a.rot, b.trans) + a.trans
    return SE3(rot, trans)


def inverse(p: SE3) -> SE3:
    rot_t = jnp.swapaxes(p.rot, -1, -2)
    return SE3(rot_t, -_rotv(rot_t, p.trans))


def act(p: SE3, x: jax.Array) -> jax.Array:
    """Apply transform to points [..., 3]."""
    return _rotv(p.rot, x) + p.trans


def retract(p: SE3, delta: jax.Array) -> SE3:
    """Left-multiplicative retract: Exp(delta) * p (gtsam_traits.h:45-70)."""
    d = se3_exp(delta)
    rot = _mm(d.rot, p.rot)
    trans = _rotv(d.rot, p.trans) + d.trans
    return SE3(rot, trans)


def local(origin: SE3, other: SE3) -> jax.Array:
    """Chart at `origin` mapping `other` to the tangent space.

    Reference semantics (gtsam_traits.h:78-89): for D = other * origin^-1,
    translation part is D.trans *raw* (no V^-1), rotation part is Log(D.rot).
    Note: NOT the exact inverse of `retract` for large rotations — the
    reference keeps this asymmetry and so do we.
    """
    rel_rot = _mm(other.rot, jnp.swapaxes(origin.rot, -1, -2))
    t = other.trans - _rotv(rel_rot, origin.trans)
    return jnp.concatenate([t, so3_log(rel_rot)], axis=-1)


def relative_pose(a: SE3, b: SE3) -> SE3:
    """b expressed in frame a: a^-1 * b (mapping_utils.h:135-141)."""
    return compose(inverse(a), b)


def pose_distance(
    a: SE3, b: SE3, trans_weight: float = 1.0, rot_weight: float = 1.0
) -> jax.Array:
    """Weighted pose distance ignoring roll (mapping_utils.h:372-382).

    drot uses only the first two components of the relative so3 log —
    a pure roll rotation adds no parallax so the reference ignores it.
    """
    rel = relative_pose(a, b)
    omega = so3_log(rel.rot)
    drot = jnp.linalg.norm(omega[..., :2], axis=-1)
    dtrans = jnp.linalg.norm(rel.trans, axis=-1)
    return dtrans * trans_weight + drot * rot_weight


def se3_log(p: SE3) -> jax.Array:
    """Proper SE(3) log (V^-1 applied), tangent = [trans, rot].

    Used for trajectory export / diagnostics (the reference uses Sophus'
    log for printing); the optimizer itself only needs retract/local.
    """
    omega = so3_log(p.rot)
    theta = jnp.linalg.norm(omega, axis=-1)
    k = hat(omega)
    k2 = _mm(k, k)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.rot.dtype), p.rot.shape)
    theta_sq = theta**2
    small = theta < 1e-5
    safe_theta_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (
            1.0
            - theta * jnp.cos(theta / 2.0) / (2.0 * jnp.sin(theta / 2.0) + jnp.where(small, 1.0, 0.0))
        )
        / safe_theta_sq,
    )
    v_inv = eye - 0.5 * k + coef[..., None, None] * k2
    v = _rotv(v_inv, p.trans)
    return jnp.concatenate([v, omega], axis=-1)
