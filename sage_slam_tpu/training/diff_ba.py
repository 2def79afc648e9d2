"""Differentiable two-frame bundle adjustment for training (P4).

Re-implements the reference's unrolled LM-BA
(representation/models/diff_ba.py) the JAX way: the same five cost terms
assembled into one (7+CS) damped normal-equation system per iteration,
with reverse-mode differentiation through a fixed-length ``lax.scan``
instead of torch eager unrolling.

Parity map (reference file:line):
* learnable scalars — photo_pow_factor/photo_weight (diff_ba.py:21-25)
  and the match-geom / geometry weights+params shipped in
  pretrained/ba_model.pt (state-dict keys match BAParams field names),
* photometric term per level, weight = |photo_weight*10| *
  scale_level^photo_pow_factor, normalized by valid samples
  (diff_ba.py:110-168, 953-1060),
* match-geometry term: Fair-robust 3D point-pair residuals against
  FIXED matched target depths (diff_ba.py:891-951),
* reprojection term: Cauchy-robust 2D reprojection of keypoints against
  matched 2D locations (diff_ba.py:1063-1162),
* geometry term: Cauchy-robust warped-depth consistency at the finest
  level against the FIXED target depth map (diff_ba.py:1164-1287),
* code prior (diff_ba.py:1289-1299), log-scale prior (:1301-1311),
* LM loop: damped solve, inner damping search with accept test
  ``candidate_error < error and cond < max_cond``, convergence on
  gradient / relative-parameter-increment thresholds
  (diff_ba.py:596-828, 844-869; defaults configs/training.json:69-92).

Variables (solution order matches the reference): pose tangent (6),
scale (1), code of the SOURCE frame (CS). The target frame's depth and
features are fixed.
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
    """Learnable BA scalars — field names = pretrained/ba_model.pt keys
    (defaults: configs/training.json:84-92)."""

    photo_pow_factor: jax.Array  # []
    photo_weight: jax.Array  # []
    match_geom_param_factor: jax.Array  # []
    match_geom_term_weight: jax.Array  # []
    geometry_cauchy_param_factor: jax.Array  # []
    geometry_term_weight: jax.Array  # []
    # constructor constants in the reference (not trained)
    code_term_weight: jax.Array  # []
    scale_term_weight: jax.Array  # []
    reproj_term_weight: jax.Array  # [] (diff_ba.py:1063 reproj_term)
    reproj_cauchy_param: jax.Array  # []

    @staticmethod
    def init(levels: int = 4):
        del levels  # per-level weights derive from the learnable power
        f = lambda v: jnp.asarray(v, jnp.float32)
        return BAParams(
            photo_pow_factor=f(0.0),
            photo_weight=f(0.8),
            match_geom_param_factor=f(0.1),
            match_geom_term_weight=f(0.1),
            geometry_cauchy_param_factor=f(0.1),
            geometry_term_weight=f(0.05),
            code_term_weight=f(1.0e-3),
            scale_term_weight=f(1.0e-4),
            reproj_term_weight=f(0.1),
            reproj_cauchy_param=f(0.03),
        )


def load_ba_model(path: str) -> BAParams:
    """Load the reference's trained BA scalars (pretrained/ba_model.pt)."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]
    base = BAParams.init()

    def get(name, default):
        if name in sd:
            return jnp.asarray(float(np.asarray(sd[name]).reshape(())))
        return default

    return BAParams(
        photo_pow_factor=get("photo_pow_factor", base.photo_pow_factor),
        photo_weight=get("photo_weight", base.photo_weight),
        match_geom_param_factor=get(
            "match_geom_param_factor", base.match_geom_param_factor
        ),
        match_geom_term_weight=get(
            "match_geom_term_weight", base.match_geom_term_weight
        ),
        geometry_cauchy_param_factor=get(
            "geometry_cauchy_param_factor", base.geometry_cauchy_param_factor
        ),
        geometry_term_weight=get(
            "geometry_term_weight", base.geometry_term_weight
        ),
        code_term_weight=get("code_term_weight", base.code_term_weight),
        scale_term_weight=get("scale_term_weight", base.scale_term_weight),
        reproj_term_weight=get("reproj_term_weight", base.reproj_term_weight),
        reproj_cauchy_param=get(
            "reproj_cauchy_param", base.reproj_cauchy_param
        ),
    )


class BAState(NamedTuple):
    tau10: jax.Array  # [6] relative pose tangent (frame1-from-frame0)
    scale0: jax.Array  # []
    code0: jax.Array  # [CS]


class MatchSet(NamedTuple):
    """Keypoint matches for the match-geometry / reprojection terms
    (built from the matcher; diff_ba.py ba_optimize keypoint inputs)."""

    homo0: jax.Array  # [M, 3] keypoint homogeneous rays in frame 0
    bias0: jax.Array  # [M] depth bias at the keypoints
    jac0: jax.Array  # [M, CS] depth jacobian rows at the keypoints
    match_homo1: jax.Array  # [M, 3] matched rays in frame 1
    match_depths: jax.Array  # [M] FIXED matched target depths
    matched_2d: jax.Array  # [M, 2] matched (x, y) pixels in frame 1
    valid: jax.Array  # [M] 0/1


def _match_geometry_term(params, state, ms: MatchSet, mean_sq_depth, t10):
    """Fair-robust 3D point-pair term (diff_ba.py:891-951).

    Residual rows [M*3], jacobian [M*3, 7+CS] in [pose, scale, code]."""
    m = ms.homo0.shape[0]
    cs = state.code0.shape[0]
    depths0 = state.scale0 * (ms.bias0 + ms.jac0 @ state.code0)  # [M]
    rh = ms.homo0 @ t10.rot.T  # [M, 3] rotated rays
    x1 = depths0[:, None] * rh + t10.trans  # [M, 3]
    match_3d = ms.match_depths[:, None] * ms.match_homo1
    diff = (match_3d - x1) * ms.valid[:, None]

    slp = jnp.sqrt(
        jnp.abs(params.match_geom_param_factor * mean_sq_depth)
    )
    norm = jnp.abs(diff) / slp
    fair_err = jnp.sum(2.0 * (norm - jnp.log1p(norm)), axis=-1)  # [M]
    sw = (1.0 / slp) * jnp.sqrt(1.0 / (1.0 + norm))  # [M, 3]

    # d(diff)/d(pose): [-hat(x1) | -I] per reference's
    # compute_loc_3d_diff_jac_rel_pose sign convention folded so that the
    # solve step is delta on the LEFT-multiplied pose tangent
    zeros = jnp.zeros(m)
    hat_rows = jnp.stack(
        [
            jnp.stack([zeros, x1[:, 2], -x1[:, 1]], axis=-1),
            jnp.stack([-x1[:, 2], zeros, x1[:, 0]], axis=-1),
            jnp.stack([-x1[:, 1], -x1[:, 0], zeros], axis=-1),
        ],
        axis=1,
    )  # [M, 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3), (m, 3, 3))
    jac_pose = jnp.concatenate([hat_rows, eye], axis=2)  # [M, 3, 6]
    jac_scale = (rh * (depths0 / state.scale0)[:, None])[..., None]
    jac_code = rh[..., None] * (
        state.scale0 * ms.jac0[:, None, :]
    )  # [M, 3, CS]
    jac = jnp.concatenate([jac_pose, jac_scale, jac_code], axis=2)
    jac = (sw * ms.valid[:, None])[..., None] * jac  # [M, 3, 7+CS]
    res = (sw * diff).reshape(m * 3)
    a = jac.reshape(m * 3, 7 + cs)
    w = jnp.abs(params.match_geom_term_weight)
    ata = w * a.T @ a / m
    atb = w * a.T @ res / m
    err = w * jnp.sum(fair_err * ms.valid) / jnp.maximum(
        jnp.sum(ms.valid), 1.0
    )
    return ata, atb, err


def _reproj_term(params, state, ms: MatchSet, cam, t10, dpt_eps):
    """Cauchy-robust 2D reprojection term (diff_ba.py:1063-1162)."""
    m = ms.homo0.shape[0]
    cs = state.code0.shape[0]
    depths0 = state.scale0 * (ms.bias0 + ms.jac0 @ state.code0)
    rh = ms.homo0 @ t10.rot.T
    x1 = depths0[:, None] * rh + t10.trans
    z = x1[:, 2]
    pos = (z >= dpt_eps).astype(x1.dtype) * ms.valid
    z = jnp.maximum(z, dpt_eps)
    u = x1[:, 0] / z * cam.fx + cam.cx
    v = x1[:, 1] / z * cam.fy + cam.cy
    diff = (ms.matched_2d - jnp.stack([u, v], axis=-1)) * pos[:, None]

    cauchy_param = jnp.abs(params.reproj_cauchy_param) * float(cam.width) ** 2
    w = jnp.abs(params.reproj_term_weight)
    sq = diff.reshape(-1) ** 2
    sqrt_w = jnp.sqrt(w / (sq + cauchy_param))
    err = jnp.sum(w * jnp.log1p(sq / cauchy_param)) / jnp.maximum(
        jnp.sum(pos), 1.0
    )

    # d(u,v)/d(x1): [fx/z, 0, -fx x/z^2; 0, fy/z, -fy y/z^2]
    fx, fy = cam.fx, cam.fy
    zero = jnp.zeros(m)
    jp = jnp.stack(
        [
            jnp.stack([fx / z, zero, -fx * x1[:, 0] / z**2], axis=-1),
            jnp.stack([zero, fy / z, -fy * x1[:, 1] / z**2], axis=-1),
        ],
        axis=1,
    )  # [M, 2, 3]
    # d(x1)/d(pose tangent [trans, rot]) = [I | -hat(x1)]
    hat_x1 = se3m.hat(x1)  # [M, 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3), (m, 3, 3))
    dx_dpose = jnp.concatenate([eye, -hat_x1], axis=2)  # [M, 3, 6]
    jac_pose = jp @ dx_dpose  # [M, 2, 6]
    jac_scale = (jp @ (rh * (depths0 / state.scale0)[:, None])[..., None])
    jac_code = jp @ (rh[..., None] * (state.scale0 * ms.jac0[:, None, :]))
    jac = jnp.concatenate([jac_pose, jac_scale, jac_code], axis=2)
    # residual is (matched - projected): d(res)/d(vars) = -jac
    jac = -(pos[:, None, None] * jac)
    a = (sqrt_w[:, None] * jac.reshape(m * 2, 7 + cs))
    res = sqrt_w * diff.reshape(-1)
    ata = a.T @ a / jnp.maximum(jnp.sum(pos), 1.0)
    atb = a.T @ res / jnp.maximum(jnp.sum(pos), 1.0)
    return ata, atb, err


class BAInputs(NamedTuple):
    """Everything the per-iteration linearization needs (fixed tensors)."""

    kf0: photometric.PhotoKf0
    fr1: photometric.PhotoFr1
    photo_shared: photometric.PhotoShared
    geo_kf0: geometric.GeoKf0
    geo_kf1: geometric.GeoKf1
    geo_shared: geometric.GeoShared
    matches: MatchSet | None
    mean_sq_depth: jax.Array  # [] masked mean of squared target depth
    init_scale: jax.Array  # [] scale-prior target


def _linearize(
    params: BAParams,
    state: BAState,
    inp: BAInputs,
    cam_pyr: CameraPyramid,
    dpt_eps: float,
    use_match_geom: bool,
    use_geom: bool,
    use_reproj: bool,
):
    cs = state.code0.shape[0]
    dim = 7 + cs
    t10 = se3_exp(state.tau10)
    p1 = SE3.identity()

    # solution order [pose(6), scale(1), code(CS)] (diff_ba.py:830-841)
    idx_pose = jnp.arange(6)
    idx_scale = jnp.asarray([6])
    idx_code = jnp.arange(7, 7 + cs)

    ata = jnp.zeros((dim, dim))
    atb = jnp.zeros((dim,))

    # photometric: learnable weight/power per level
    # (weight_l = |photo_weight*10| * scale_l^pow; our pyramid is
    # finest-first so scale_l = 2^l)
    levels = cam_pyr.levels
    weights = tuple(
        jnp.abs(params.photo_weight * 10.0)
        * (2.0**l) ** params.photo_pow_factor
        for l in range(levels)
    )
    a_p, b_p, err_p, _ = photometric.photometric_jac_error(
        t10, p1, state.code0, state.scale0, inp.kf0, inp.fr1,
        inp.photo_shared, cam_pyr, weights, dpt_eps,
    )
    # photometric block layout [p0(6), p1(6), c0(CS), s0(1)]
    sub = jnp.concatenate(
        [jnp.arange(6), jnp.asarray([12 + cs]), jnp.arange(12, 12 + cs)]
    )
    dst = jnp.concatenate([idx_pose, idx_scale, idx_code])
    ata = ata.at[dst[:, None], dst[None, :]].add(a_p[sub][:, sub])
    atb = atb.at[dst].add(b_p[sub])
    err = err_p

    if use_match_geom and inp.matches is not None:
        a_m, b_m, e_m = _match_geometry_term(
            params, state, inp.matches, inp.mean_sq_depth, t10
        )
        ata, atb, err = ata + a_m, atb + b_m, err + e_m

    if use_reproj and inp.matches is not None:
        a_r, b_r, e_r = _reproj_term(
            params, state, inp.matches, cam_pyr[0], t10, dpt_eps
        )
        ata, atb, err = ata + a_r, atb + b_r, err + e_r

    # zero-code prior: A = [0 | I], AtA normalized by CS
    # (diff_ba.py:225-239)
    code_w = jnp.abs(params.code_term_weight) / cs
    ata = ata.at[idx_code, idx_code].add(code_w)
    atb = atb.at[idx_code].add(-code_w * state.code0)
    err = err + jnp.abs(params.code_term_weight) * jnp.mean(state.code0**2)

    if use_geom:
        # geometry at the finest level against the FIXED target depth:
        # the runtime kernel's (c1, s1) blocks are simply not scattered
        a_g, b_g, e_g, _ = geometric.geometric_jac_error(
            t10, p1, state.code0, jnp.zeros(cs), state.scale0,
            jnp.asarray(1.0), inp.geo_kf0, inp.geo_kf1, inp.geo_shared,
            cam_pyr[0],
            jnp.abs(params.geometry_term_weight),
            jnp.abs(params.geometry_cauchy_param_factor) * inp.mean_sq_depth,
            dpt_eps,
        )
        # geometric block layout [p0, p1, c0, c1, s0, s1]
        sub_g = jnp.concatenate(
            [jnp.arange(6), jnp.asarray([12 + 2 * cs]),
             jnp.arange(12, 12 + cs)]
        )
        ata = ata.at[dst[:, None], dst[None, :]].add(a_g[sub_g][:, sub_g])
        atb = atb.at[dst].add(b_g[sub_g])
        err = err + e_g

    # log-scale prior (diff_ba.py:1301-1311)
    scale_w = jnp.abs(params.scale_term_weight)
    s = jnp.maximum(state.scale0, 1e-8)
    log_diff = jnp.log(inp.init_scale) - jnp.log(s)
    ata = ata.at[6, 6].add(scale_w / (s * s))
    atb = atb.at[6].add(scale_w / s * log_diff)
    err = err + scale_w * log_diff**2
    return ata, atb, err


def _update(state: BAState, sol: jax.Array) -> BAState:
    """update_variables (diff_ba.py:830-841): left-multiplicative pose,
    additive scale/code; solution order [pose, scale, code]."""
    d = se3_exp(sol[:6])
    t10 = se3_exp(state.tau10)
    new_t10 = se3m.compose(d, t10)
    return BAState(
        tau10=se3m.se3_log(new_t10),
        scale0=jnp.maximum(state.scale0 + sol[6], 1e-3),
        code0=state.code0 + sol[7:],
    )


@jax.custom_vjp
def _bwd_clip(x, max_norm):
    """Identity forward; clips the COTANGENT's norm on the backward pass.

    Inserted between unrolled LM iterations it bounds the geometric
    growth of gradients through the scan (the recorded r04 flagship
    joint-phase divergence is the failure mode this prevents) — the
    unroll analog of truncated-BPTT clipping. max_norm <= 0 disables."""
    return x


def _bwd_clip_fwd(x, max_norm):
    return x, max_norm


def _bwd_clip_bwd(max_norm, g):
    norm = jnp.sqrt(jnp.sum(g * g))
    factor = jnp.where(
        max_norm > 0,
        jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12)),
        1.0,
    )
    return g * factor, None


_bwd_clip.defvjp(_bwd_clip_fwd, _bwd_clip_bwd)


def _clip_state_grad(state: "BAState", max_norm: float) -> "BAState":
    """Jointly clip the backward cotangent of the whole BA state."""
    flat = jnp.concatenate(
        [state.tau10, jnp.reshape(state.scale0, (1,)), state.code0]
    )
    flat = _bwd_clip(flat, max_norm)
    return BAState(
        tau10=flat[:6], scale0=flat[6], code0=flat[7:]
    )


def ba_optimize(
    params: BAParams,
    inp: BAInputs,
    cam_pyr: CameraPyramid,
    init: BAState,
    max_iters: int = 8,
    inner_attempts: int = 3,
    init_damp: float = 1.0e-4,
    damp_min: float = 1.0e-8,
    damp_max: float = 1.0e8,
    damp_inc: float = 10.0,
    damp_dec: float = 10.0,
    grad_thresh: float = 1.0e-4,
    param_thresh: float = 1.0e-2,
    max_cond: float = 1.0e9,
    dpt_eps: float = 1.0e-3,
    use_match_geom: bool = True,
    use_geom: bool = True,
    use_reproj: bool = False,
    bwd_clip: float = 0.0,
):
    """The reference LM schedule (diff_ba.py:596-828) as a fixed-length,
    reverse-differentiable ``lax.scan``:

    each iteration linearizes, solves the damped system, runs a fixed
    inner damping search (accept iff candidate error decreases AND the
    damped system's condition number is below max_cond), applies the
    accepted update, and sets a converged flag from the gradient /
    relative-parameter-increment thresholds (lm_convergence,
    diff_ba.py:844-869). Returns (final_state, per-iteration errors).
    """
    cs = init.code0.shape[0]
    dim = 7 + cs

    def linearize(state):
        return _linearize(
            params, state, inp, cam_pyr, dpt_eps,
            use_match_geom, use_geom, use_reproj,
        )

    def error_of(state):
        return linearize(state)[2]

    def solve(ata, atb, damp):
        damped = ata + damp * jnp.diag(jnp.diagonal(ata)) + 1e-10 * jnp.eye(dim)
        sol = jnp.linalg.solve(damped, atb)
        cond = jnp.linalg.cond(damped)
        return jnp.where(jnp.isfinite(sol), sol, 0.0), cond

    def step(carry, _):
        state, damp, done = carry
        if bwd_clip > 0:
            state = _clip_state_grad(state, bwd_clip)
        ata, atb, err0 = linearize(state)
        sol, cond = solve(ata, atb, damp)

        # convergence (lm_convergence, diff_ba.py:844-869)
        max_grad = jnp.max(jnp.abs(atb))
        rotvec = state.tau10[3:6]
        denom = jnp.concatenate(
            [
                jnp.abs(rotvec) + 1e-8,
                jnp.abs(state.tau10[:3]) + 1e-8,
                state.scale0[None],
                jnp.abs(state.code0) + 1e-8,
            ]
        )
        sol_perm = jnp.concatenate(
            [sol[3:6], sol[:3], sol[6:7], sol[7:]]
        )
        rel_inc = jnp.max(jnp.abs(sol_perm / denom))
        converged = jnp.logical_or(
            max_grad <= grad_thresh, rel_inc <= param_thresh
        )

        # inner damping search (diff_ba.py:696-760), fixed unroll
        best_state = state
        accepted = jnp.asarray(False)
        cur_damp = damp
        cur_sol = sol
        cur_cond = cond
        for _ in range(inner_attempts):
            cand = _update(state, cur_sol)
            cand_err = error_of(cand)
            ok = jnp.logical_and(
                jnp.logical_and(cand_err < err0, cur_cond < max_cond),
                jnp.logical_not(accepted),
            )
            best_state = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), cand, best_state
            )
            accepted = jnp.logical_or(accepted, ok)
            next_damp = jnp.clip(cur_damp * damp_inc, damp_min, damp_max)
            nsol, ncond = solve(ata, atb, next_damp)
            cur_damp = jnp.where(accepted, cur_damp, next_damp)
            cur_sol = jnp.where(accepted, cur_sol, nsol)
            cur_cond = jnp.where(accepted, cur_cond, ncond)

        new_damp = jnp.where(
            accepted,
            jnp.clip(cur_damp / damp_dec, damp_min, damp_max),
            cur_damp,
        )
        give_up = jnp.logical_and(
            jnp.logical_not(accepted), cur_damp >= damp_max
        )
        active = jnp.logical_not(done)
        new_state = jax.tree.map(
            lambda a, b: jnp.where(jnp.logical_and(active, accepted), a, b),
            best_state,
            state,
        )
        new_done = jnp.logical_or(
            done, jnp.logical_or(converged, give_up)
        )
        return (
            new_state,
            jnp.where(active, new_damp, damp),
            new_done,
        ), err0

    init_carry = (init, jnp.asarray(init_damp), jnp.asarray(False))
    (final, _, _), errs = jax.lax.scan(
        step, init_carry, None, length=max_iters
    )
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
