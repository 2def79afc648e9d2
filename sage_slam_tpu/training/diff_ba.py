"""Differentiable two-frame bundle adjustment for training (P4).

The reference trains its networks through an unrolled LM-BA
(representation/models/diff_ba.py — photometric term with learnable
per-level weights, geometry term, code & scale priors, damped
normal-equation solve). Because this framework's runtime factors are
pure JAX, training-time BA is the SAME code differentiated through a
fixed number of unrolled iterations — no separate "diff BA"
implementation to maintain.

Variables: relative pose T_10 (6), code0, code1 (CS each), scale0 (1).
Pose parametrization: p0 = T10, p1 = I, so the factors' relative pose
equals T10 and the factor's left-multiplicative pose0 tangent IS our
pose variable — blocks map over exactly, no frame correction.
The learnable BAParams reweight the residual terms (diff_ba.py:21-25).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3 as se3m
from ..geometry.camera import CameraPyramid
from ..geometry.se3 import SE3, se3_exp
from ..ops import geometric, photometric


class BAParams(NamedTuple):
    """Learnable BA hyper-parameters (diff_ba.py:21-25)."""

    log_photo_weights: jax.Array  # [L]
    log_geo_weight: jax.Array  # []
    log_code_prior: jax.Array  # []
    log_scale_prior: jax.Array  # []
    log_damp: jax.Array  # []

    @staticmethod
    def init(levels: int = 4):
        return BAParams(
            log_photo_weights=jnp.log(
                jnp.asarray([10.0, 9.0, 8.0, 7.0][:levels])
            ),
            log_geo_weight=jnp.log(jnp.asarray(0.1)),
            log_code_prior=jnp.log(jnp.asarray(1.0e-3)),
            log_scale_prior=jnp.log(jnp.asarray(1.0)),
            log_damp=jnp.log(jnp.asarray(1.0e-4)),
        )


class BAState(NamedTuple):
    tau10: jax.Array  # [6] relative pose tangent (frame1-from-frame0)
    code0: jax.Array  # [CS]
    code1: jax.Array
    scale0: jax.Array  # []


def two_frame_ba(
    params: BAParams,
    kf0: photometric.PhotoKf0,
    fr1: photometric.PhotoFr1,
    photo_shared: photometric.PhotoShared,
    geo_kf0: geometric.GeoKf0,
    geo_kf1: geometric.GeoKf1,
    geo_shared: geometric.GeoShared,
    cam_pyr: CameraPyramid,
    init: BAState,
    num_iters: int = 8,
    dpt_eps: float = 1e-6,
    loss_param: float = 0.05,
):
    """Unrolled damped-GN over (pose, codes, scale). Differentiable w.r.t.
    BAParams and all network outputs inside kf0/fr1/geo_*."""
    cs = init.code0.shape[0]
    dim = 6 + 2 * cs + 1  # [tau, c0, c1, s0]
    weights = tuple(jnp.exp(params.log_photo_weights))
    geo_w = jnp.exp(params.log_geo_weight)
    code_w = jnp.exp(params.log_code_prior)
    scale_w = jnp.exp(params.log_scale_prior)
    damp = jnp.exp(params.log_damp)

    idx_tau = jnp.arange(6)
    idx_c0 = jnp.arange(6, 6 + cs)
    idx_c1 = jnp.arange(6 + cs, 6 + 2 * cs)
    idx_s0 = jnp.asarray([6 + 2 * cs])

    def linearize(state: BAState):
        p0 = se3_exp(state.tau10)  # plays pose0 = T10
        p1 = SE3.identity()
        ata = jnp.zeros((dim, dim))
        atb = jnp.zeros((dim,))

        # photometric: block layout [p0(6), p1(6), c0, s0]
        a_p, b_p, err_p, _ = photometric.photometric_jac_error(
            p0, p1, state.code0, state.scale0, kf0, fr1, photo_shared,
            cam_pyr, weights, dpt_eps,
        )
        sub = jnp.concatenate([jnp.arange(6), jnp.arange(12, 13 + cs)])
        dst = jnp.concatenate([idx_tau, idx_c0, idx_s0])
        ata = ata.at[dst[:, None], dst[None, :]].add(a_p[sub][:, sub])
        atb = atb.at[dst].add(b_p[sub])

        # geometric: block layout [p0, p1, c0, c1, s0, s1]; s1 fixed = 1
        a_g, b_g, err_g, _ = geometric.geometric_jac_error(
            p0, p1, state.code0, state.code1, state.scale0,
            jnp.asarray(1.0), geo_kf0, geo_kf1, geo_shared, cam_pyr[0],
            geo_w, loss_param, dpt_eps,
        )
        sub_g = jnp.concatenate(
            [jnp.arange(6), jnp.arange(12, 12 + 2 * cs), jnp.asarray([12 + 2 * cs])]
        )
        dst_g = jnp.concatenate([idx_tau, idx_c0, idx_c1, idx_s0])
        ata = ata.at[dst_g[:, None], dst_g[None, :]].add(
            a_g[sub_g][:, sub_g]
        )
        atb = atb.at[dst_g].add(b_g[sub_g])

        # zero-code priors + log-scale prior
        ccat = jnp.concatenate([idx_c0, idx_c1])
        ata = ata.at[ccat, ccat].add(code_w)
        atb = atb.at[idx_c0].add(-code_w * state.code0)
        atb = atb.at[idx_c1].add(-code_w * state.code1)
        s = state.scale0
        ata = ata.at[6 + 2 * cs, 6 + 2 * cs].add(scale_w / (s * s))
        atb = atb.at[6 + 2 * cs].add(-scale_w / s * jnp.log(s))
        return ata, atb, err_p + err_g

    def step(state: BAState, _):
        ata, atb, err = linearize(state)
        damped = (
            ata + damp * jnp.diag(jnp.diagonal(ata)) + 1e-8 * jnp.eye(dim)
        )
        delta = jnp.linalg.solve(damped, atb)
        new_t10 = se3m.compose(se3_exp(delta[:6]), se3_exp(state.tau10))
        new_state = BAState(
            tau10=se3m.se3_log(new_t10),
            code0=state.code0 + delta[6 : 6 + cs],
            code1=state.code1 + delta[6 + cs : 6 + 2 * cs],
            scale0=jnp.maximum(state.scale0 + delta[6 + 2 * cs], 1e-3),
        )
        return new_state, err

    final, errs = jax.lax.scan(step, init, None, length=num_iters)
    return final, errs


def ba_outputs(state: BAState, bias0_flat, jac0_flat, cam, dpt_eps=1e-6):
    """Supervision outputs (training.py:593-612): final depth map of
    frame 0 and the dense rigid flow 0->1 implied by the BA estimate."""
    from ..geometry import interp
    from ..ops.depth import decode_depth

    depth0 = decode_depth(bias0_flat, jac0_flat, state.code0, state.scale0)
    hw = bias0_flat.shape[0]
    loc = jnp.arange(hw, dtype=jnp.int32)
    homo = interp.locations_1d_to_homo(loc, cam)
    t10 = se3_exp(state.tau10)
    x1 = depth0[:, None] * (homo @ t10.rot.T) + t10.trans
    u = x1[:, 0] / jnp.maximum(x1[:, 2], dpt_eps) * cam.fx + cam.cx
    v = x1[:, 1] / jnp.maximum(x1[:, 2], dpt_eps) * cam.fy + cam.cy
    x0, y0 = interp.locations_1d_to_2d(loc, cam.width)
    flow = jnp.stack([u - x0, v - y0], axis=0).reshape(2, cam.height, cam.width)
    return depth0.reshape(cam.height, cam.width), flow
