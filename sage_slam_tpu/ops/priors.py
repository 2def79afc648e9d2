"""Prior / pose-graph factors.

Replicates the reference factor semantics:

* ScaleFactor   — log-scale prior (scale_factor.cpp:88-115):
    error = w (log s - log s_init)^2, AtA = w / s^2,
    Atb = (w / s)(log s_init - log s).
* CodeFactor    — zero/init-code prior (code_factor.cpp:50-90):
    AtA = w I, Atb = w (c_init - c); error = w * mean((c_init - c)^2)
    (note the mean-vs-sum asymmetry is the reference's own).
* PoseFactor    — pose prior toward a target (pose_factor.cpp:92-109):
    residual on SE3 log difference with identity Jacobian approximation:
    AtA = w I6, Atb = w (log(T_tgt) - log(T)).
* RelPoseScaleFactor — active loop-closure edge (rel_pose_scale_factor.cpp):
    7-dim residual [t10/s0 - t10*/s0*; sqrt(rw)(Log R10 - Log R10*);
    sqrt(sw)(log(s1/s0) - log ratio*)], T10 = T1^-1 T0.
    Pose Jacobian is the exact derivative w.r.t. left-multiplicative
    tangents (the reference's long Kronecker chain) — we obtain the same
    matrix with forward-mode autodiff. The scale column of the translation
    rows uses the *target* translation (-t10*/s0^2), reproducing the
    reference's choice (rel_pose_scale_factor.cpp pseudo_log_jac_scale).
* RelPoseFactor — pose-graph edge without scale (rel_pose_factor.cpp),
    same structure minus the scale terms.
* gauge prior (PriorFactor<SE3>) — handled by PoseFactor with a large
    weight (deepfactors.cpp:115-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.se3 import SE3


def scale_prior(scale, init_scale, weight):
    """Returns (AtA [1,1], Atb [1], error).

    The reference LOG(FATAL)s on non-positive scale (scale_factor.cpp:93);
    here a huge finite penalty makes the LM loop reject any step that
    drives a scale non-positive (and keeps padded rows NaN-free)."""
    ok = scale > 0
    safe = jnp.where(ok, scale, jnp.ones_like(scale))
    log_diff = jnp.log(init_scale) - jnp.log(safe)
    ata = jnp.reshape(weight / (safe * safe), (1, 1))
    atb = jnp.reshape(jnp.where(ok, weight / safe * log_diff, 0.0), (1,))
    err = jnp.where(ok, weight * log_diff**2, 1e10)
    return ata, atb, err


def code_prior(code, init_code, weight):
    """Returns (AtA [CS,CS], Atb [CS], error)."""
    cs = code.shape[-1]
    diff = init_code - code
    ata = weight * jnp.eye(cs, dtype=code.dtype)
    atb = weight * diff
    err = weight * jnp.mean(diff**2)
    return ata, atb, err


def pose_prior(pose: SE3, target: SE3, weight):
    """Returns (AtA [6,6], Atb [6], error)."""
    diff = se3m.se3_log(target) - se3m.se3_log(pose)
    ata = weight * jnp.eye(6, dtype=diff.dtype)
    atb = weight * diff
    err = weight * jnp.sum(diff**2)
    return ata, atb, err


def _relpose10(p0: SE3, p1: SE3) -> SE3:
    return se3m.compose(se3m.inverse(p1), p0)


def rel_pose_scale_factor(
    p0: SE3,
    p1: SE3,
    scale0,
    scale1,
    target_pose10: SE3,
    target_scale0,
    target_scale1,
    factor_weight,
    rot_weight,
    scale_weight,
):
    """Loop-closure pose+scale edge. Returns (AtA [14,14], Atb [14], error).

    Block layout: [0:6] pose0, [6:12] pose1, [12] scale0, [13] scale1
    (rel_pose_scale_factor.h:66).
    """
    dtype = p0.trans.dtype
    sqrt_rw = jnp.sqrt(jnp.asarray(rot_weight, dtype))
    sqrt_sw = jnp.sqrt(jnp.asarray(scale_weight, dtype))

    def pseudo_log(eps):
        """[t10/s0; sqrt(rw) Log(R10)] as a function of the two pose
        tangents; differentiated at eps = 0."""
        q0 = se3m.retract(p0, eps[:6])
        q1 = se3m.retract(p1, eps[6:12])
        rel = _relpose10(q0, q1)
        return jnp.concatenate(
            [rel.trans / scale0, sqrt_rw * se3m.so3_log(rel.rot)]
        )

    zeros12 = jnp.zeros(12, dtype)
    cur = pseudo_log(zeros12)
    jac_pose = jax.jacfwd(pseudo_log)(zeros12)  # [6, 12]

    tgt = jnp.concatenate(
        [
            target_pose10.trans / target_scale0,
            sqrt_rw * se3m.so3_log(target_pose10.rot),
        ]
    )

    log_ratio = jnp.log(scale1 / scale0)
    log_tgt_ratio = jnp.log(target_scale1 / target_scale0)

    # scale columns: reference uses the TARGET translation here
    jac_scale = jnp.zeros((6, 2), dtype)
    jac_scale = jac_scale.at[0:3, 0].set(
        -target_pose10.trans / (scale0**2)
    )
    scale_row = jnp.zeros((1, 14), dtype)
    scale_row = scale_row.at[0, 12].set(sqrt_sw * (-1.0 / scale0))
    scale_row = scale_row.at[0, 13].set(sqrt_sw * (1.0 / scale1))

    jac = jnp.zeros((7, 14), dtype)
    jac = jac.at[0:6, 0:12].set(jac_pose)
    jac = jac.at[0:6, 12:14].set(jac_scale)
    jac = jac.at[6:7, :].set(scale_row)

    diff = jnp.concatenate(
        [tgt - cur, jnp.reshape(sqrt_sw * (log_tgt_ratio - log_ratio), (1,))]
    )

    ata = factor_weight * (jac.T @ jac)
    atb = factor_weight * (jac.T @ diff)

    rel = _relpose10(p0, p1)
    trans_err = jnp.sum(
        (rel.trans / scale0 - target_pose10.trans / target_scale0) ** 2
    )
    rot_err = rot_weight * jnp.sum(
        (se3m.so3_log(rel.rot) - se3m.so3_log(target_pose10.rot)) ** 2
    )
    scale_err = scale_weight * (log_ratio - log_tgt_ratio) ** 2
    err = factor_weight * (trans_err + rot_err + scale_err)
    return ata, atb, err


def rel_pose_factor(
    p0: SE3,
    p1: SE3,
    target_pose10: SE3,
    factor_weight,
    rot_weight,
):
    """Pose-graph edge without scale (rel_pose_factor.cpp).
    Returns (AtA [12,12], Atb [12], error)."""
    dtype = p0.trans.dtype
    sqrt_rw = jnp.sqrt(jnp.asarray(rot_weight, dtype))

    def pseudo_log(eps):
        q0 = se3m.retract(p0, eps[:6])
        q1 = se3m.retract(p1, eps[6:12])
        rel = _relpose10(q0, q1)
        return jnp.concatenate([rel.trans, sqrt_rw * se3m.so3_log(rel.rot)])

    zeros12 = jnp.zeros(12, dtype)
    cur = pseudo_log(zeros12)
    jac = jax.jacfwd(pseudo_log)(zeros12)  # [6, 12]
    tgt = jnp.concatenate(
        [target_pose10.trans, sqrt_rw * se3m.so3_log(target_pose10.rot)]
    )
    diff = tgt - cur
    ata = factor_weight * (jac.T @ jac)
    atb = factor_weight * (jac.T @ diff)
    rel = _relpose10(p0, p1)
    err = factor_weight * (
        jnp.sum((rel.trans - target_pose10.trans) ** 2)
        + rot_weight
        * jnp.sum(
            (se3m.so3_log(rel.rot) - se3m.so3_log(target_pose10.rot)) ** 2
        )
    )
    return ata, atb, err
