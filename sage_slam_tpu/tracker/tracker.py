"""Camera tracker — 6-DoF / 7-DoF LM alignment of a frame to a keyframe.

TPU-native re-design of CameraTracker (camera_tracker.cpp):

* the whole LM optimization runs inside one jitted lax.while_loop — the
  reference's per-iteration GPU->CPU Eigen solve round-trip
  (camera_tracker.cpp:1182-1183) disappears; the damped 6x6/7x7 solve is
  trivial on device,
* semantics replicated: lazy Jacobian refresh (skip when the relative
  error change is below jac_update_err_inc_threshold, :1158), damping on
  diag(AtA) with accept/reject inner loop (:1192-1246), convergence on
  max|Atb| / max relative parameter increment (:527-560), left-multiplied
  se3 updates of the relative pose (:491-513),
* 6-DoF TrackNewFrame = photometric + reprojection terms (:1034-1310);
  7-DoF TrackFrame = photometric(+scale) + match-geometry(+scale) for
  loop verification (:1312+).

Variables are the relative pose T_ck (keyframe -> current frame), plus a
depth scale in the 7-DoF variant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import interp
from ..geometry.camera import CameraPyramid
from ..ops import match_geometry as mg_ops
from ..ops import reprojection as rp_ops


class TrackerRef(NamedTuple):
    """Per-keyframe data the tracker needs (prepared once per keyframe,
    camera_tracker.cpp:1073-1125)."""

    photo_homo0: jax.Array  # [N, 3] sampled photometric rays
    photo_dpts0: jax.Array  # [N] scaled depths at those rays
    cat_photo_feats0: jax.Array  # [L, N, C] source features per level


class TrackerTarget(NamedTuple):
    """Frame-to-track data.

    packed_fg / packed_feat are optional quad-packed gather tables (see
    ops/photometric.build_packed_tables); prebuild them per frame so the
    LM while_loop's per-level sampling costs ONE gather instead of 8."""

    feat_pyr: jax.Array  # [C, T]
    grad_pyr: jax.Array  # [2, C, T]
    mask_flat: jax.Array  # [HW] full-res video mask
    packed_fg: jax.Array | None = None  # [Tq, 4*3C]
    packed_feat: jax.Array | None = None  # [Tq, 4*C]

    def with_packed(self, cam_pyr) -> "TrackerTarget":
        from ..ops.photometric import build_packed_tables

        if self.packed_fg is not None:
            return self
        packed_fg, packed_feat = build_packed_tables(
            self.feat_pyr, self.grad_pyr, cam_pyr
        )
        return self._replace(packed_fg=packed_fg, packed_feat=packed_feat)


def _sample_source_features(
    feat_pyr: jax.Array,  # [C, T]
    loc1d: jax.Array,  # [N]
    cam_pyr: CameraPyramid,
):
    """Bilinear-sample the keyframe's own features at its sampled points
    for every level -> [L, N, C] (camera_tracker.cpp:1105-1121)."""
    from ..ops.photometric import sample_source_features

    return sample_source_features(feat_pyr, loc1d, cam_pyr)


def tracker_photo_jac_error(
    rot10: jax.Array,  # [3, 3] relative rotation (kf -> frame)
    t10: jax.Array,  # [3]
    ref: TrackerRef,
    target: TrackerTarget,
    cam_pyr: CameraPyramid,
    weights,
    eps: float,
    scale0=None,  # scalar -> 7-DoF variant
):
    """Tracker photometric term (tracker_photo_jac_error_calculate,
    photometric_factor_kernels.cpp:524-873, host :1166-1325).

    Returns (AtA [D,D], Atb [D], error, n_inl) with D = 6 or 7."""
    dim = 6 if scale0 is None else 7
    dtype = ref.photo_homo0.dtype
    cam0 = cam_pyr[0]

    rh = ref.photo_homo0 @ rot10.T  # [N, 3]
    x1 = ref.photo_dpts0[:, None] * rh + t10
    pos = (x1[:, 2] > eps).astype(dtype)
    u = x1[:, 0] / x1[:, 2] * cam0.fx + cam0.cx
    v = x1[:, 1] / x1[:, 2] * cam0.fy + cam0.cy
    within = interp.nearest_flat(
        target.mask_flat, u, v, cam0.width, cam0.height
    )
    gate = pos * within

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
    )  # [N, 3, 6]

    err_total = jnp.zeros((), dtype)
    n_inl = jnp.zeros((), dtype)

    from ..ops.photometric import build_packed_tables

    packed_fg = (
        target.packed_fg
        if target.packed_fg is not None
        else build_packed_tables(target.feat_pyr, target.grad_pyr, cam_pyr)[0]
    )
    c = target.feat_pyr.shape[0]
    n = u.shape[0]
    # channel-sum collapse via the per-point 2x2 gradient Gram, and level
    # collapse via K_l = diag(rx_l, ry_l) K_0 (see ops/photometric.py):
    # accumulate sum_l w_l S_l Gram_l S_l per point, contract once.
    g_acc = jnp.zeros((n, 2, 2), dtype)
    hv_acc = jnp.zeros((n, 2), dtype)
    for lvl in range(cam_pyr.levels):
        cam_l = cam_pyr[lvl]
        rx = cam_l.fx / cam0.fx
        ry = cam_l.fy / cam0.fy
        ul, vl = interp.level_coords(u, v, rx, ry)
        fg = interp.bilinear_quad(
            packed_fg, ul, vl, cam_l.width, cam_l.height,
            cam_pyr.quad_level_offsets[lvl],
        )  # [N, 3C]
        f1 = fg[:, :c]  # [N, C]
        # packed grad columns are (d, c)-ordered -> [N, 2, C], no transpose
        g1 = fg[:, c:].reshape(-1, 2, c) * gate[:, None, None]

        f0 = ref.cat_photo_feats0[lvl]  # [N, C]
        diff = gate[:, None] * (f0 - f1)  # [N, C]
        err_pt = gate * jnp.sum((f0 - f1) ** 2, axis=-1)
        if lvl == 0:
            n_inl = jnp.sum(gate)

        gram = jnp.einsum("ndc,nec->nde", g1, g1)  # [N, 2, 2]
        h_vec = jnp.einsum("ndc,nc->nd", g1, diff)  # [N, 2]
        wl = jnp.asarray(weights[lvl], dtype)
        s = jnp.asarray([rx, ry], dtype)
        g_acc = g_acc + (wl * s[:, None] * s[None, :]) * gram
        hv_acc = hv_acc + (wl * s) * h_vec
        err_total = err_total + wl * jnp.sum(err_pt)

    # geometry rows once, at full-res intrinsics
    inv_z = 1.0 / x1[:, 2]
    x_z = x1[:, 0] * inv_z
    y_z = x1[:, 1] * inv_z
    pj = jnp.stack(
        [
            jnp.stack(
                [cam0.fx * inv_z, zero, -cam0.fx * x_z * inv_z], axis=-1
            ),
            jnp.stack(
                [zero, cam0.fy * inv_z, -cam0.fy * y_z * inv_z], axis=-1
            ),
        ],
        axis=-2,
    )  # [N, 2, 3]
    j2d = jnp.einsum("nij,njk->nik", pj, jac_rel)  # [N, 2, 6]
    if scale0 is not None:
        jdpt = jnp.stack(
            [
                cam0.fx * (rh[:, 0] * inv_z - x1[:, 0] * rh[:, 2] * inv_z**2),
                cam0.fy * (rh[:, 1] * inv_z - x1[:, 1] * rh[:, 2] * inv_z**2),
            ],
            axis=-1,
        )  # [N, 2]
        jscale2d = jdpt * (ref.photo_dpts0 / scale0)[:, None]
        k_rows = jnp.concatenate([j2d, jscale2d[..., None]], axis=-1)
    else:
        k_rows = j2d  # [N, 2, dim]
    kg = jnp.einsum("nab,nbq->naq", g_acc, k_rows)  # [N, 2, dim]
    k_flat = k_rows.reshape(-1, dim)  # [2N, dim]
    ata = k_flat.T @ kg.reshape(-1, dim)
    atb = k_flat.T @ hv_acc.reshape(-1)

    w_sum = jnp.sum(jnp.asarray(weights, dtype))
    has = n_inl > 0
    inv = jnp.where(has, 1.0 / jnp.maximum(n_inl, 1.0), 0.0)
    error = jnp.where(has, err_total * inv, w_sum * 10.0)
    return ata * inv, atb * inv, error, n_inl


def tracker_photo_error(
    rot10, t10, ref: TrackerRef, target: TrackerTarget, cam_pyr, weights, eps
):
    """Error-only photometric evaluation for the LM inner loop."""
    dtype = ref.photo_homo0.dtype
    cam0 = cam_pyr[0]
    rh = ref.photo_homo0 @ rot10.T
    x1 = ref.photo_dpts0[:, None] * rh + t10
    pos = (x1[:, 2] > eps).astype(dtype)
    u = x1[:, 0] / x1[:, 2] * cam0.fx + cam0.cx
    v = x1[:, 1] / x1[:, 2] * cam0.fy + cam0.cy
    within = interp.nearest_flat(
        target.mask_flat, u, v, cam0.width, cam0.height
    )
    gate = pos * within
    err_total = jnp.zeros((), dtype)
    n_inl = jnp.zeros((), dtype)
    if target.packed_feat is not None:
        packed_feat = target.packed_feat
    else:
        from ..ops.photometric import build_packed_tables

        packed_feat = build_packed_tables(
            target.feat_pyr, target.grad_pyr, cam_pyr
        )[1]
    for lvl in range(cam_pyr.levels):
        cam_l = cam_pyr[lvl]
        ul, vl = interp.level_coords(
            u, v, cam_l.fx / cam0.fx, cam_l.fy / cam0.fy
        )
        f1 = interp.bilinear_quad(
            packed_feat, ul, vl, cam_l.width, cam_l.height,
            cam_pyr.quad_level_offsets[lvl],
        )  # [N, C]
        f0 = ref.cat_photo_feats0[lvl]  # [N, C]
        err_pt = gate * jnp.sum((f0 - f1) ** 2, axis=-1)
        err_total = err_total + weights[lvl] * jnp.sum(err_pt)
        if lvl == 0:
            n_inl = jnp.sum(gate)
    w_sum = jnp.sum(jnp.asarray(weights, dtype))
    return jnp.where(
        n_inl > 0, err_total / jnp.maximum(n_inl, 1.0), w_sum * 10.0
    ), n_inl


class TrackTerms(NamedTuple):
    """Optional match-based terms for the tracker LM."""

    # reprojection (6-DoF tracking): matched 2D pixels in frame 1
    reproj_dpts0: jax.Array | None = None  # [M]
    reproj_homo0: jax.Array | None = None  # [M, 3]
    reproj_matched_2d: jax.Array | None = None  # [M, 2]
    reproj_valid: jax.Array | None = None  # [M]
    reproj_weight: float = 0.0
    reproj_loss_param: float = 1.0
    # match-geometry (7-DoF loop verification)
    mg_dpts0: jax.Array | None = None
    mg_homo0: jax.Array | None = None
    mg_dpts1: jax.Array | None = None
    mg_homo1: jax.Array | None = None
    mg_valid: jax.Array | None = None
    mg_weight: float = 0.0
    mg_loss_param: float = 1.0


class LMResult(NamedTuple):
    rot: jax.Array  # [3, 3] final relative rotation
    trans: jax.Array  # [3]
    scale: jax.Array  # scalar (7-DoF; unchanged in 6-DoF)
    error: jax.Array
    iterations: jax.Array


def _rotation_to_angle_axis(rot):
    from ..geometry.se3 import so3_log

    return so3_log(rot)


def lm_track(
    init_rot: jax.Array,
    init_trans: jax.Array,
    ref: TrackerRef,
    target: TrackerTarget,
    cam_pyr: CameraPyramid,
    cfg,
    terms: TrackTerms = TrackTerms(),
    use_photo: bool = True,
    with_scale: bool = False,
    init_scale: jax.Array | float = 1.0,
    max_iters: int | None = None,
):
    """The reference LM loop (camera_tracker.cpp:1156-1279), fully jitted.

    cfg needs: init_damp, min_damp, max_damp, damp_dec_factor,
    damp_inc_factor, min_grad_thresh, min_param_inc_thresh,
    jac_update_err_inc_threshold, max_num_iters, photo_factor_weights,
    dpt_eps.
    """
    from ..geometry.se3 import se3_exp

    # hoist the quad-packed gather tables out of the LM while_loop
    target = target.with_packed(cam_pyr)

    dim = 7 if with_scale else 6
    dtype = init_trans.dtype
    iters_budget = max_iters if max_iters is not None else cfg.max_num_iters
    eps = cfg.dpt_eps
    weights = cfg.photo_factor_weights

    def jac_error(rot, trans, scale):
        ata = jnp.zeros((dim, dim), dtype)
        atb = jnp.zeros((dim,), dtype)
        err = jnp.zeros((), dtype)
        if use_photo:
            a, b, e, _ = tracker_photo_jac_error(
                rot, trans, ref, target, cam_pyr, weights, eps,
                scale0=scale if with_scale else None,
            )
            ata, atb, err = ata + a, atb + b, err + e
        if terms.reproj_dpts0 is not None:
            a, b, e, _ = rp_ops.tracker_reproj_jac_error(
                rot, trans, terms.reproj_dpts0, terms.reproj_homo0,
                terms.reproj_matched_2d, terms.reproj_valid, cam_pyr[0],
                terms.reproj_weight, terms.reproj_loss_param, eps,
                scale0=scale if with_scale else None,
            )
            ata, atb, err = ata + a, atb + b, err + e
        if terms.mg_dpts0 is not None:
            a, b, e = mg_ops.tracker_mg_jac_error(
                rot, trans, terms.mg_dpts0, terms.mg_dpts1,
                terms.mg_homo0, terms.mg_homo1, terms.mg_valid,
                terms.mg_weight, terms.mg_loss_param,
                scale0=scale if with_scale else None,
            )
            ata, atb, err = ata + a, atb + b, err + e
        return ata, atb, err

    def error_only(rot, trans, scale):
        err = jnp.zeros((), dtype)
        if use_photo:
            e, _ = tracker_photo_error(
                rot, trans, ref, target, cam_pyr, weights, eps
            )
            err = err + e
        if terms.reproj_dpts0 is not None:
            err = err + _reproj_error(rot, trans, terms, cam_pyr[0], eps)
        if terms.mg_dpts0 is not None:
            err = err + _mg_error(rot, trans, terms)
        return err

    def apply_delta(rot, trans, scale, sol):
        d = se3_exp(sol[:6])
        new_rot = d.rot @ rot
        new_trans = d.rot @ trans + d.trans
        new_scale = scale + (sol[6] if with_scale else 0.0)
        return new_rot, new_trans, new_scale

    def converged(rot, trans, scale, atb, sol):
        rotvec = _rotation_to_angle_axis(rot)
        max_grad = jnp.max(jnp.abs(atb))
        params = jnp.concatenate([trans, rotvec])
        if with_scale:
            params = jnp.concatenate([params, jnp.reshape(scale, (1,))])
        max_inc = jnp.max(sol / (jnp.abs(params) + 1e-8))
        return jnp.logical_or(
            max_grad < cfg.min_grad_thresh,
            max_inc < cfg.min_param_inc_thresh,
        )

    def solve(ata, atb, damp):
        damped = ata + damp * jnp.diag(jnp.diagonal(ata))
        sol = jnp.linalg.solve(
            damped + 1e-12 * jnp.eye(dim, dtype=dtype), atb
        )
        return jnp.where(jnp.isfinite(sol), sol, 0.0)

    # state: rot, trans, scale, ata, atb, prev_err, curr_err, damp, it, done
    ata0, atb0, err0 = jac_error(init_rot, init_trans, jnp.asarray(init_scale, dtype))

    def cond(s):
        return jnp.logical_and(s["it"] < iters_budget, ~s["done"])

    def body(s):
        # lazy jacobian refresh (camera_tracker.cpp:1158-1171)
        rel_change = jnp.abs(s["curr_err"] - s["prev_err"]) / jnp.maximum(
            s["prev_err"], 1e-20
        )
        refresh = rel_change > cfg.jac_update_err_inc_threshold
        ata, atb, err_new = jax.lax.cond(
            refresh,
            lambda: jac_error(s["rot"], s["trans"], s["scale"]),
            lambda: (s["ata"], s["atb"], s["curr_err"]),
        )
        curr_err = jnp.where(refresh, err_new, s["curr_err"])

        sol = solve(ata, atb, s["damp"])
        is_conv = converged(s["rot"], s["trans"], s["scale"], atb, sol)

        # inner damping loop (:1192-1246)
        def inner_cond(t):
            return ~t["stop"]

        def inner_body(t):
            rot_c, trans_c, scale_c = apply_delta(
                s["rot"], s["trans"], s["scale"], t["sol"]
            )
            cand_err = error_only(rot_c, trans_c, scale_c)
            accept = cand_err < curr_err
            at_max = t["damp"] >= cfg.max_damp
            new_damp = jnp.where(
                accept | at_max,
                t["damp"],
                jnp.clip(
                    t["damp"] * cfg.damp_inc_factor,
                    cfg.min_damp,
                    cfg.max_damp,
                ),
            )
            new_sol = jnp.where(
                accept | at_max, t["sol"], solve(ata, atb, new_damp)
            )
            return dict(
                sol=new_sol,
                damp=new_damp,
                rot=jnp.where(accept, rot_c, t["rot"]),
                trans=jnp.where(accept, trans_c, t["trans"]),
                scale=jnp.where(accept, scale_c, t["scale"]),
                cand_err=cand_err,
                accepted=accept,
                stop=accept | at_max,
            )

        inner0 = dict(
            sol=sol,
            damp=s["damp"],
            rot=s["rot"],
            trans=s["trans"],
            scale=s["scale"],
            cand_err=jnp.asarray(jnp.inf, dtype),
            accepted=jnp.asarray(False),
            stop=jnp.asarray(False),
        )
        t = jax.lax.while_loop(inner_cond, inner_body, inner0)

        # the reference breaks before applying when already converged
        accepted = t["accepted"] & ~is_conv
        new_prev = jnp.where(refresh, curr_err, s["prev_err"])
        next_state = dict(
            rot=jnp.where(accepted, t["rot"], s["rot"]),
            trans=jnp.where(accepted, t["trans"], s["trans"]),
            scale=jnp.where(accepted, t["scale"], s["scale"]),
            ata=ata,
            atb=atb,
            prev_err=new_prev,
            curr_err=jnp.where(accepted, t["cand_err"], curr_err),
            damp=jnp.where(
                accepted,
                jnp.clip(
                    t["damp"] / cfg.damp_dec_factor,
                    cfg.min_damp,
                    cfg.max_damp,
                ),
                t["damp"],
            ),
            it=s["it"] + 1,
            done=is_conv | (~accepted),
        )
        return next_state

    init_state = dict(
        rot=init_rot,
        trans=init_trans,
        scale=jnp.asarray(init_scale, dtype),
        ata=ata0,
        atb=atb0,
        prev_err=jnp.asarray(0.0, dtype),
        curr_err=err0,
        damp=jnp.asarray(cfg.init_damp, dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init_state)
    return LMResult(
        final["rot"], final["trans"], final["scale"], final["curr_err"],
        final["it"],
    )


def _reproj_error(rot10, t10, terms: TrackTerms, cam, eps):
    from ..ops.robust_loss import fair_error

    rh = terms.reproj_homo0 @ rot10.T
    x1 = terms.reproj_dpts0[:, None] * rh + t10
    pos = (x1[:, 2] > eps).astype(rh.dtype) * terms.reproj_valid
    u = x1[:, 0] / x1[:, 2] * cam.fx + cam.cx
    v = x1[:, 1] / x1[:, 2] * cam.fy + cam.cy
    diff = terms.reproj_matched_2d - jnp.stack([u, v], axis=-1)
    err_pt = fair_error(diff, terms.reproj_loss_param) * pos
    n_inl = jnp.sum(pos)
    return jnp.where(
        n_inl > 0,
        terms.reproj_weight * jnp.sum(err_pt) / jnp.maximum(n_inl, 1.0),
        terms.reproj_weight * 10.0,
    )


def _mg_error(rot10, t10, terms: TrackTerms):
    from ..ops.robust_loss import fair_error

    rh = terms.mg_homo0 @ rot10.T
    x1 = terms.mg_dpts0[:, None] * rh + t10
    matched = terms.mg_dpts1[:, None] * terms.mg_homo1
    diff = matched - x1
    err_pt = fair_error(diff, terms.mg_loss_param) * terms.mg_valid
    m = jnp.maximum(jnp.sum(terms.mg_valid), 1.0)
    has = jnp.sum(terms.mg_valid) > 0
    return jnp.where(
        has,
        terms.mg_weight * jnp.sum(err_pt) / m,
        terms.mg_weight * 10.0,
    )


def area_inlier_motion(
    valid_dpts0: jax.Array,  # [V]
    valid_homo0: jax.Array,  # [V, 3]
    rot10: jax.Array,
    t10: jax.Array,
    cam,
    mask_flat: jax.Array,  # [HW] video mask
    eps: float,
):
    """Device part of ComputeAreaInlierRatio (camera_tracker.cpp:95-169):
    warped 2D points, validity, inlier ratio and normalized average
    motion. The convex-hull areas are computed on host (convex_hull_area)
    from the returned points — off the hot path, matching the reference's
    CPU boost::geometry usage."""
    rh = valid_homo0 @ rot10.T
    x1 = valid_dpts0[:, None] * rh + t10
    pos = (x1[:, 2] > eps).astype(rh.dtype)
    u = x1[:, 0] / x1[:, 2] * cam.fx + cam.cx
    v = x1[:, 1] / x1[:, 2] * cam.fy + cam.cy
    # nearest mask sample with align_corners=true normalization (:115-120)
    xi = jnp.round(u * (cam.width - 1) / cam.width).astype(jnp.int32)
    yi = jnp.round(v * (cam.height - 1) / cam.height).astype(jnp.int32)
    inb = (xi >= 0) & (xi < cam.width) & (yi >= 0) & (yi < cam.height)
    idx = jnp.clip(yi, 0, cam.height - 1) * cam.width + jnp.clip(
        xi, 0, cam.width - 1
    )
    within = jnp.take(mask_flat, idx) * inb.astype(rh.dtype) * pos

    u0 = valid_homo0[:, 0] * cam.fx + cam.cx
    v0 = valid_homo0[:, 1] * cam.fy + cam.cy
    motion = jnp.sqrt((u - u0) ** 2 + (v - v0) ** 2)
    avg_motion = jnp.sum(motion * pos) / jnp.maximum(jnp.sum(pos), 1.0)
    diag = (cam.width**2 + cam.height**2) ** 0.5
    inlier_ratio = jnp.sum(within) / valid_homo0.shape[0]
    return dict(
        warped_2d=jnp.stack([u, v], axis=-1),
        source_2d=jnp.stack([u0, v0], axis=-1),
        within=within,
        pos=pos,
        inlier_ratio=inlier_ratio,
        average_motion=avg_motion / diag,
    )


def convex_hull_area(points) -> float:
    """Monotone-chain convex hull area on host (numpy). Replaces
    boost::geometry::convex_hull + area (camera_tracker.cpp:131-155)."""
    import numpy as np

    pts = np.asarray(points, dtype=np.float64)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) < 3:
        return 0.0

    def cross2(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2 and cross2(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    x, y = hull[:, 0], hull[:, 1]
    return float(
        0.5 * np.abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )
