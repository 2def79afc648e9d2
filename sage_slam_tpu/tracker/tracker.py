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

    packed_fg / packed_feat are optional TRANSPOSED (channel-major) quad
    gather tables with the folded mask column, dense_fg / dense_feat the
    coarse-level dense tables (see ops/photometric.build_photo_tables);
    prebuild them per frame so the LM while_loop's per-level sampling
    costs ONE gather (or a gather-free MXU hat-matmul)."""

    feat_pyr: jax.Array  # [C, T]
    grad_pyr: jax.Array  # [2, C, T]
    mask_flat: jax.Array  # [HW] full-res video mask
    packed_fg: jax.Array | None = None  # [4*(3C+1), Tq]
    packed_feat: jax.Array | None = None  # [4*(C+1), Tq]
    dense_fg: tuple = ()  # per dense level: [1, 3C, M_l]
    dense_feat: tuple = ()  # per dense level: [1, C, M_l]
    mega_fg: jax.Array | None = None  # levels 0+1 in one gather row
    mega_feat: jax.Array | None = None

    def with_packed(self, cam_pyr) -> "TrackerTarget":
        from ..ops.photometric import build_photo_tables

        if self.packed_fg is not None:
            return self
        tables = build_photo_tables(
            self.feat_pyr, self.grad_pyr, self.mask_flat, cam_pyr
        )
        return self._replace(
            packed_fg=tables[0],
            packed_feat=tables[1],
            dense_fg=tables[2],
            dense_feat=tables[3],
            mega_fg=tables[4],
            mega_feat=tables[5],
        )

    def _tables(self, cam_pyr):
        if self.packed_fg is not None:
            return (
                self.packed_fg,
                self.packed_feat,
                self.dense_fg,
                self.dense_feat,
                self.mega_fg,
                self.mega_feat,
            )
        from ..ops.photometric import build_photo_tables

        return build_photo_tables(
            self.feat_pyr, self.grad_pyr, self.mask_flat, cam_pyr
        )


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
    soft: bool = False,
):
    """Tracker photometric term (tracker_photo_jac_error_calculate,
    photometric_factor_kernels.cpp:524-873, host :1166-1325).

    Channel-major formulation (see ops/photometric.photometric_jac_error):
    [N]-lane per-point scalars, [C, N] samples, K-rows [D, N], Gram via
    two MXU matmuls.

    Returns (AtA [D,D], Atb [D], error, n_inl) with D = 6 or 7."""
    from ..ops.photometric import _target_samples_cm

    dtype = ref.photo_homo0.dtype
    cam0 = cam_pyr[0]
    hp = jax.lax.Precision.HIGHEST

    rh = jnp.matmul(rot10, ref.photo_homo0.T, precision=hp)  # [3, N]
    x1 = ref.photo_dpts0[None] * rh + t10[:, None]  # [3, N]
    pos = (x1[2] > eps).astype(dtype)
    x1 = x1.at[2].set(jnp.where(x1[2] > eps, x1[2], 1.0))
    u = x1[0] / x1[2] * cam0.fx + cam0.cx
    v = x1[1] / x1[2] * cam0.fy + cam0.cy

    c = target.feat_pyr.shape[0]
    packed_fg, _, dense_fg, _, mega_fg, _ = target._tables(cam_pyr)
    fgs, within = _target_samples_cm(
        target.mask_flat, cam_pyr, u, v, 0, packed_fg, dense_fg, 3 * c,
        mega_fg, soft=soft,
    )
    gate = pos * within
    gate2 = gate * gate

    gxx = gxy = gyy = hx = hy = jnp.zeros_like(gate)
    err_total = jnp.zeros((), dtype)
    for lvl in range(cam_pyr.levels):
        cam_l = cam_pyr[lvl]
        fg = fgs[lvl]  # [3C, N]
        f0 = ref.cat_photo_feats0[lvl].T  # [C, N]
        f1 = fg[:c]
        gx = fg[c : 2 * c]  # packed grad rows are (d, c)-ordered
        gy = fg[2 * c :]
        d = f0 - f1
        wl = jnp.asarray(weights[lvl], dtype)
        rx = cam_l.fx / cam0.fx
        ry = cam_l.fy / cam0.fy
        gxx = gxx + (wl * rx * rx) * jnp.sum(gx * gx, axis=0)
        gxy = gxy + (wl * rx * ry) * jnp.sum(gx * gy, axis=0)
        gyy = gyy + (wl * ry * ry) * jnp.sum(gy * gy, axis=0)
        hx = hx + (wl * rx) * jnp.sum(gx * d, axis=0)
        hy = hy + (wl * ry) * jnp.sum(gy * d, axis=0)
        err_total = err_total + wl * jnp.sum(gate2 * jnp.sum(d * d, axis=0))
    n_inl = jnp.sum(gate2)
    gxx, gxy, gyy = gate2 * gxx, gate2 * gxy, gate2 * gyy
    hx, hy = gate2 * hx, gate2 * hy

    # K-rows [D, N] for the relative-pose tangent: jac_rel columns are
    # (I | [z,-y; -z,x; y,-x] pattern), projected through the pinhole
    # jacobian rows (kernels :241-245, :560-610)
    x, y, z = x1[0], x1[1], x1[2]
    inv_z = 1.0 / z
    xz = x * inv_z
    yz = y * inv_z
    fxz = cam0.fx * inv_z
    fyz = cam0.fy * inv_z
    zero = jnp.zeros_like(x)
    kx_cols = [
        fxz,
        zero,
        -fxz * xz,
        -fxz * xz * y,
        fxz * (z + xz * x),
        -fxz * y,
    ]
    ky_cols = [
        zero,
        fyz,
        -fyz * yz,
        fyz * (-z - yz * y),
        fyz * yz * x,
        fyz * x,
    ]
    if scale0 is not None:
        dx = cam0.fx * (rh[0] * inv_z - x * rh[2] * inv_z * inv_z)
        dy = cam0.fy * (rh[1] * inv_z - y * rh[2] * inv_z * inv_z)
        kx_cols.append(dx * (ref.photo_dpts0 / scale0))
        ky_cols.append(dy * (ref.photo_dpts0 / scale0))
    kx = jnp.stack(kx_cols)  # [D, N]
    ky = jnp.stack(ky_cols)

    kgx = gxx[None] * kx + gxy[None] * ky
    kgy = gxy[None] * kx + gyy[None] * ky
    dn_mm = (((1,), (1,)), ((), ()))
    ata = jax.lax.dot_general(
        kx, kgx, dn_mm, precision=hp
    ) + jax.lax.dot_general(ky, kgy, dn_mm, precision=hp)
    dn_mv = (((1,), (0,)), ((), ()))
    atb = jax.lax.dot_general(
        kx, hx, dn_mv, precision=hp
    ) + jax.lax.dot_general(ky, hy, dn_mv, precision=hp)

    w_sum = jnp.sum(jnp.asarray(weights, dtype))
    has = n_inl > 0
    inv = jnp.where(has, 1.0 / jnp.maximum(n_inl, 1.0), 0.0)
    error = jnp.where(has, err_total * inv, w_sum * 10.0)
    return ata * inv, atb * inv, error, n_inl


def tracker_photo_error(
    rot10, t10, ref: TrackerRef, target: TrackerTarget, cam_pyr, weights,
    eps, soft: bool = False,
):
    """Error-only photometric evaluation for the LM inner loop."""
    from ..ops.photometric import _target_samples_cm

    dtype = ref.photo_homo0.dtype
    cam0 = cam_pyr[0]
    hp = jax.lax.Precision.HIGHEST
    rh = jnp.matmul(rot10, ref.photo_homo0.T, precision=hp)  # [3, N]
    x1 = ref.photo_dpts0[None] * rh + t10[:, None]
    pos = (x1[2] > eps).astype(dtype)
    x1 = x1.at[2].set(jnp.where(x1[2] > eps, x1[2], 1.0))
    u = x1[0] / x1[2] * cam0.fx + cam0.cx
    v = x1[1] / x1[2] * cam0.fy + cam0.cy
    c = target.feat_pyr.shape[0]
    _, packed_feat, _, dense_feat, _, mega_feat = target._tables(cam_pyr)
    f1s, within = _target_samples_cm(
        target.mask_flat, cam_pyr, u, v, 0, packed_feat, dense_feat, c,
        mega_feat, soft=soft,
    )
    gate = pos * within
    g2 = gate * gate  # == gate when binary
    err_total = jnp.zeros((), dtype)
    for lvl in range(cam_pyr.levels):
        f0 = ref.cat_photo_feats0[lvl].T  # [C, N]
        f1 = f1s[lvl]  # [C, N]
        err_pt = g2 * jnp.sum((f0 - f1) ** 2, axis=0)
        err_total = err_total + weights[lvl] * jnp.sum(err_pt)
    n_inl = jnp.sum(g2)
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

    if getattr(cfg, "coarse_to_fine", False) and use_photo and len(
        weights
    ) >= 3:
        # two-phase schedule: first align on the two COARSEST pyramid
        # levels only (their basin spans several fine-level pixels),
        # then refine with every level. Summing all levels at once (the
        # reference's formulation, camera_tracker.cpp:1156-1279) relies
        # on features trained to be near-quadratic; with generic or
        # handcrafted features the fine-level gradients dominate the
        # normal equations and the first GN step can jump across the
        # fine levels' basin into a far local minimum
        # (eval/error_budget.py isolates the effect).
        coarse = tuple(
            0.0 if lvl < len(weights) - 2 else weights[lvl]
            for lvl in range(len(weights))
        )
        import dataclasses as _dc

        cfg_coarse = _dc.replace(
            cfg, coarse_to_fine=False, photo_factor_weights=coarse
        )
        cfg_fine = _dc.replace(cfg, coarse_to_fine=False)
        half = max(iters_budget // 2, 1)
        r1 = lm_track(
            init_rot, init_trans, ref, target, cam_pyr, cfg_coarse,
            terms=terms, use_photo=use_photo, with_scale=with_scale,
            init_scale=init_scale, max_iters=half,
        )
        r2 = lm_track(
            r1.rot, r1.trans, ref, target, cam_pyr, cfg_fine,
            terms=terms, use_photo=use_photo, with_scale=with_scale,
            init_scale=r1.scale if with_scale else init_scale,
            max_iters=iters_budget - half,
        )
        return LMResult(
            r2.rot, r2.trans, r2.scale, r2.error,
            r1.iterations + r2.iterations,
        )

    def jac_error(rot, trans, scale):
        ata = jnp.zeros((dim, dim), dtype)
        atb = jnp.zeros((dim,), dtype)
        err = jnp.zeros((), dtype)
        if use_photo:
            a, b, e, _ = tracker_photo_jac_error(
                rot, trans, ref, target, cam_pyr, weights, eps,
                scale0=scale if with_scale else None,
                soft=getattr(cfg, "soft_inlier_gate", False),
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
                rot, trans, ref, target, cam_pyr, weights, eps,
                soft=getattr(cfg, "soft_inlier_gate", False),
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
