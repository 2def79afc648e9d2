"""Sliding-window / global bundle adjustment over the keyframe window.

The TPU-native counterpart of Mapper::MappingStep + ISAM2
(mapper.cpp:469-612): photometric and geometric edges live in padded edge
tables, are linearized by vmapped factor kernels, PSD-corrected, and
scatter-added into one dense block Hessian over the window; priors are
added per keyframe; the damped GN loop (solver.graph.lm_loop) runs the
whole optimization inside a single jit.

Edge semantics follow EnqueueKeyframe/EnqueueLink (mapper.cpp:313-453):
each keyframe link contributes factors in BOTH directions (i->j and j->i).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraPyramid
from ..geometry.se3 import SE3
from ..ops import geometric, photometric, priors
from ..ops import reprojection as rp_ops
from . import graph
from .graph import Variables


class WindowData(NamedTuple):
    """Per-keyframe padded device arrays (leading axis K = window size).

    The concatenated pyramid layout matches Frame (frame.h:100-124)."""

    loc1d: jax.Array  # [K, N] int32 sampled photometric pixel ids
    homo: jax.Array  # [K, N, 3]
    bias_flat: jax.Array  # [K, HW]
    jac_flat: jax.Array  # [K, HW, CS]
    feat_pyr: jax.Array  # [C, K, T] (channel-major: [C, K*T] is free)
    grad_pyr: jax.Array  # [2, C, K, T]
    src_feats: jax.Array  # [K, L, N, C] cached per-level source samples
    avg_sq_bias: jax.Array  # [K] masked mean of squared depth bias
    mask_flat: jax.Array  # [HW] shared video mask (full res)
    # gather tables (ops/photometric.build_photo_tables: masked quad
    # tables + dense coarse-level tables); filled by prepare_problem so
    # the packing is hoisted out of the LM loop
    packed_fg: jax.Array | None = None  # [K*Tq, 4*(3C+1)]
    packed_feat: jax.Array | None = None  # [K*Tq, 4*(C+1)]
    # per-keyframe source decode at the sampled pixels (static per
    # keyframe; prepare_problem hoists these gathers out of the LM loop)
    bias_at: jax.Array | None = None  # [K, N]
    jac_at: jax.Array | None = None  # [K, N, CS]
    dense_fg: tuple = ()  # per dense level: [K, 3C, M_l]
    dense_feat: tuple = ()  # per dense level: [K, C, M_l]
    # mega level-0+1 gather tables (ops/photometric.build_photo_tables)
    mega_fg: jax.Array | None = None
    mega_feat: jax.Array | None = None


def prepare_problem(
    problem: "BAProblem", cam_pyr: CameraPyramid
) -> "BAProblem":
    """Precompute the window's quad-packed gather tables and the
    source-pixel decode tables (idempotent)."""
    w = problem.window
    if w.packed_fg is not None:
        return problem
    c = w.feat_pyr.shape[0]
    packed_fg, packed_feat, dense_fg, dense_feat, mega_fg, mega_feat = (
        photometric.build_photo_tables(
            w.feat_pyr.reshape(c, -1),
            w.grad_pyr.reshape(2, c, -1),
            w.mask_flat,
            cam_pyr,
        )
    )
    bias_at = jax.vmap(jnp.take)(w.bias_flat, w.loc1d)  # [K, N]
    jac_at = jax.vmap(lambda j, l: jnp.take(j, l, axis=0))(
        w.jac_flat, w.loc1d
    )  # [K, N, CS]
    return problem._replace(
        window=w._replace(
            packed_fg=packed_fg,
            packed_feat=packed_feat,
            bias_at=bias_at,
            jac_at=jac_at,
            dense_fg=dense_fg,
            dense_feat=dense_feat,
            mega_fg=mega_fg,
            mega_feat=mega_feat,
        )
    )


def slice_problem_keyframes(
    problem: "BAProblem", kb: int, cam_pyr: CameraPyramid
) -> "BAProblem":
    """Restrict a full-capacity problem to its first ``kb`` keyframes
    (static kb). Edge tables are untouched — every edge index must be
    < kb. Run inside jit so the slices fuse instead of copying: sizing
    the BA step to a geometric bucket of the ACTIVE keyframe count makes
    linearization (and the per-iteration geometric frame-1 table build)
    scale with the real map instead of the store capacity."""
    w = problem.window
    tq = cam_pyr.total_quad_rows

    def cut_cols(t):
        return None if t is None else t[:, : kb * tq]

    window = w._replace(
        loc1d=w.loc1d[:kb],
        homo=w.homo[:kb],
        bias_flat=w.bias_flat[:kb],
        jac_flat=w.jac_flat[:kb],
        feat_pyr=w.feat_pyr[:, :kb],
        grad_pyr=w.grad_pyr[:, :, :kb],
        src_feats=w.src_feats[:kb],
        avg_sq_bias=w.avg_sq_bias[:kb],
        packed_fg=cut_cols(w.packed_fg),
        packed_feat=cut_cols(w.packed_feat),
        bias_at=None if w.bias_at is None else w.bias_at[:kb],
        jac_at=None if w.jac_at is None else w.jac_at[:kb],
        dense_fg=tuple(d[:kb] for d in w.dense_fg),
        dense_feat=tuple(d[:kb] for d in w.dense_feat),
        mega_fg=None,
        mega_feat=None,
    )
    pr = problem.priors
    priors = PriorTable(
        code_valid=pr.code_valid[:kb],
        scale_valid=pr.scale_valid[:kb],
        scale_init=pr.scale_init[:kb],
        pose_valid=pr.pose_valid[:kb],
        pose_target=SE3(
            pr.pose_target.rot[:kb], pr.pose_target.trans[:kb]
        ),
    )
    return problem._replace(window=window, priors=priors)


def compact_problem_keyframes(
    problem: "BAProblem",
    ids: jax.Array,  # [kc] int32 store row per compact slot (distinct)
    pad_valid: jax.Array,  # [kc] 1 for real entries, 0 for padding rows
    cam_pyr: CameraPyramid,
) -> "BAProblem":
    """Gather the window/prior rows of ``ids`` into a compact problem
    (run inside jit so the gathers fuse with the step).

    This is the ISAM2-sublinearity move the windowed mapping step needs
    (SURVEY.md §7.1 / mapper.cpp:469-612): the solve's dense system and
    the per-iteration geometric frame-1 tables are sized by the number
    of WINDOW-INCIDENT keyframes (bounded by the window's edges), not by
    the whole map, so windowed-step cost stays near-flat as keyframes
    accumulate. Edge tables must already be expressed in compact
    indices; ``pad_valid`` zeroes the prior rows of padding entries so
    the compact total error differs from the full-capacity solve only
    by a variable-independent constant (which cancels in every LM
    accept test)."""
    w = problem.window
    k = w.bias_flat.shape[0]

    def cols(t):
        if t is None:
            return None
        cw = t.shape[0]
        return t.reshape(cw, k, -1)[:, ids].reshape(cw, -1)

    window = w._replace(
        loc1d=w.loc1d[ids],
        homo=w.homo[ids],
        bias_flat=w.bias_flat[ids],
        jac_flat=w.jac_flat[ids],
        feat_pyr=w.feat_pyr[:, ids],
        grad_pyr=w.grad_pyr[:, :, ids],
        src_feats=w.src_feats[ids],
        avg_sq_bias=w.avg_sq_bias[ids],
        packed_fg=cols(w.packed_fg),
        packed_feat=cols(w.packed_feat),
        bias_at=None if w.bias_at is None else w.bias_at[ids],
        jac_at=None if w.jac_at is None else w.jac_at[ids],
        dense_fg=tuple(d[ids] for d in w.dense_fg),
        dense_feat=tuple(d[ids] for d in w.dense_feat),
        mega_fg=None,
        mega_feat=None,
    )
    pr = problem.priors
    priors = PriorTable(
        code_valid=pr.code_valid[ids] * pad_valid,
        scale_valid=pr.scale_valid[ids] * pad_valid,
        scale_init=pr.scale_init[ids],
        pose_valid=pr.pose_valid[ids] * pad_valid,
        pose_target=SE3(
            pr.pose_target.rot[ids], pr.pose_target.trans[ids]
        ),
    )
    return problem._replace(window=window, priors=priors)


class EdgeTable(NamedTuple):
    """Directed factor edges kf[i0] -> frame[i1], padded with valid=0."""

    i0: jax.Array  # [E] int32
    i1: jax.Array  # [E] int32
    valid: jax.Array  # [E] float 0/1


class ReprojEdgeTable(NamedTuple):
    """Reprojection edges with their precomputed match sets (the
    reference builds matches in the factor ctor,
    reprojection_factor.cpp:30-193). Padded: E edges x M matches."""

    i0: jax.Array  # [E]
    i1: jax.Array  # [E]
    valid: jax.Array  # [E]
    loc1d_0: jax.Array  # [E, M]
    homo_0: jax.Array  # [E, M, 3]
    matched_2d_1: jax.Array  # [E, M, 2]
    match_valid: jax.Array  # [E, M]
    weight: jax.Array  # [E] inlier_multiplier * factor_weight

    @staticmethod
    def empty(m: int, dtype=jnp.float32) -> "ReprojEdgeTable":
        z = jnp.zeros((0,), jnp.int32)
        return ReprojEdgeTable(
            z, z, jnp.zeros((0,), dtype), jnp.zeros((0, m), jnp.int32),
            jnp.zeros((0, m, 3), dtype), jnp.zeros((0, m, 2), dtype),
            jnp.zeros((0, m), dtype), jnp.zeros((0,), dtype),
        )


class PriorTable(NamedTuple):
    """Per-keyframe priors (mapper.cpp:188-196, df_work.cpp:24-34)."""

    code_valid: jax.Array  # [K] code prior on every active keyframe
    scale_valid: jax.Array  # [K] scale prior (init keyframe / loop anchors)
    scale_init: jax.Array  # [K] target scale
    pose_valid: jax.Array  # [K] pose prior (gauge anchor)
    pose_target: SE3  # [K] target poses


class BAProblem(NamedTuple):
    window: WindowData
    photo_edges: EdgeTable
    geo_edges: EdgeTable
    priors: PriorTable
    reproj_edges: ReprojEdgeTable | None = None


def _photo_inputs(window: WindowData, e: EdgeTable):
    """Per-edge handles + SHARED flat tables (no per-edge table copies)."""
    hw = window.bias_flat.shape[-1]
    t = window.feat_pyr.shape[-1]
    c = window.feat_pyr.shape[0]
    cs = window.jac_flat.shape[-1]
    kf0 = photometric.PhotoKf0(
        loc1d=window.loc1d[e.i0],
        homo0=window.homo[e.i0],
        src_feats=window.src_feats[e.i0],
        base_hw=e.i0 * hw,
        base_pyr=e.i0 * t,
        bias_at=None if window.bias_at is None else window.bias_at[e.i0],
        jac_at=None if window.jac_at is None else window.jac_at[e.i0],
    )
    fr1 = photometric.PhotoFr1(base_pyr=e.i1 * t)
    shared = photometric.PhotoShared(
        bias_flat=window.bias_flat.reshape(-1),
        jac_flat=window.jac_flat.reshape(-1, cs),
        feat_pyr=window.feat_pyr.reshape(c, -1),
        grad_pyr=window.grad_pyr.reshape(2, c, -1),
        mask_flat=window.mask_flat,
        packed_fg=window.packed_fg,
        packed_feat=window.packed_feat,
        dense_fg=window.dense_fg,
        dense_feat=window.dense_feat,
        mega_fg=window.mega_fg,
        mega_feat=window.mega_feat,
    )
    return kf0, fr1, shared


def _geo_inputs(
    window: WindowData, e: EdgeTable, variables: Variables, cam,
    which: str = "both",
):
    hw = window.bias_flat.shape[-1]
    cs = window.jac_flat.shape[-1]
    kf0 = geometric.GeoKf0(
        loc1d=window.loc1d[e.i0],
        homo0=window.homo[e.i0],
        base_hw=e.i0 * hw,
        bias_at=None if window.bias_at is None else window.bias_at[e.i0],
        jac_at=None if window.jac_at is None else window.jac_at[e.i0],
    )
    kf1 = geometric.GeoKf1(base_hw=e.i1 * hw)
    # frame-1 decode + quad pack ONCE PER KEYFRAME per linearization —
    # edges sharing a target keyframe reuse the table (in_axes=None)
    packed_full, packed_dpt = geometric.build_frame1_tables(
        window.bias_flat, window.jac_flat,
        variables.code, variables.scale, cam, window.mask_flat,
        which=which,
    )
    shared = geometric.GeoShared(
        bias_flat=window.bias_flat.reshape(-1),
        jac_flat=window.jac_flat.reshape(-1, cs),
        mask_flat=window.mask_flat,
        packed_full=packed_full,
        packed_dpt=packed_dpt,
    )
    return kf0, kf1, shared


def _edge_vars(variables: Variables, idx: jax.Array) -> SE3:
    return SE3(variables.pose.rot[idx], variables.pose.trans[idx])


def linearize(
    variables: Variables,
    problem: BAProblem,
    cam_pyr: CameraPyramid,
    cfg,
    psd: bool = True,
):
    """Full graph linearization -> (H [D,D], b [D], error scalar)."""
    k = variables.num_kf
    cs = variables.code_size
    bd = variables.block_dim
    dtype = variables.scale.dtype
    h, b = graph.empty_system(k, bd, dtype)
    total_err = jnp.zeros((), dtype)

    sel_pose = jnp.arange(6, dtype=jnp.int32)
    sel_code = jnp.arange(6, 6 + cs, dtype=jnp.int32)
    sel_scale = jnp.arange(6 + cs, 7 + cs, dtype=jnp.int32)

    # ---- photometric edges: vars (p0, p1, c0, s0), dim 13+CS ----
    pe = problem.photo_edges
    if pe.i0.shape[0] > 0:
        kf0, fr1, shared = _photo_inputs(problem.window, pe)

        if getattr(cfg, "photo_reduce", "xla") == "pallas":
            # fused Mosaic reduce over all edges (ops/pallas_kernels);
            # prep (warp+sample+K-rows) stays a vmapped XLA program
            from ..ops import pallas_kernels

            fgs, f0cm, gate, kx, ky = jax.vmap(
                lambda a, b, cc, d, e_, f, sh: photometric.photo_prep(
                    a, b, cc, d, e_, f, sh, cam_pyr, cfg.dpt_eps,
                    soft=getattr(cfg, "soft_inlier_gate", False),
                ),
                in_axes=(0, 0, 0, 0, 0, 0, None),
            )(
                _edge_vars(variables, pe.i0),
                _edge_vars(variables, pe.i1),
                variables.code[pe.i0],
                variables.scale[pe.i0],
                kf0,
                fr1,
                shared,
            )
            ata, atb, err_t, n_inl = pallas_kernels.photo_reduce_pallas(
                fgs, f0cm, gate, kx, ky,
                tuple(cfg.photo_factor_weights),
                photometric.level_ratios(cam_pyr),
                shared.feat_pyr.shape[0],
            )
            ata, atb, err, _ = jax.vmap(
                lambda a, b2, e2, n2: photometric.photo_normalize(
                    a, b2, e2, n2, cfg.photo_factor_weights
                )
            )(ata, atb, err_t, n_inl)
        else:

            def photo_one(p0, p1, c0, s0, kf0_e, fr1_e, sh):
                return photometric.photometric_jac_error(
                    p0, p1, c0, s0, kf0_e, fr1_e, sh, cam_pyr,
                    cfg.photo_factor_weights, cfg.dpt_eps,
                    soft=getattr(cfg, "soft_inlier_gate", False),
                )

            ata, atb, err, _ = jax.vmap(
                photo_one, in_axes=(0, 0, 0, 0, 0, 0, None)
            )(
                _edge_vars(variables, pe.i0),
                _edge_vars(variables, pe.i1),
                variables.code[pe.i0],
                variables.scale[pe.i0],
                kf0,
                fr1,
                shared,
            )
        if psd:
            ata = graph.psd_correct(ata)
        gidx = jnp.concatenate(
            [
                graph.slot_indices(pe.i0, bd, sel_pose),
                graph.slot_indices(pe.i1, bd, sel_pose),
                graph.slot_indices(pe.i0, bd, sel_code),
                graph.slot_indices(pe.i0, bd, sel_scale),
            ],
            axis=-1,
        )  # [E, 13+CS]
        h, b = graph.scatter_hessian(h, b, gidx, ata, atb, pe.valid)
        total_err = total_err + jnp.sum(err * pe.valid)

    # ---- geometric edges: vars (p0, p1, c0, c1, s0, s1), dim 14+2CS ----
    ge = problem.geo_edges
    if ge.i0.shape[0] > 0:
        kf0, kf1, gshared = _geo_inputs(
            problem.window, ge, variables, cam_pyr[0], which="full"
        )
        loss_param = cfg.geo_loss_param_factor * problem.window.avg_sq_bias[
            ge.i0
        ]

        def geo_one(p0, p1, c0, c1, s0, s1, kf0_e, kf1_e, lp, sh):
            return geometric.geometric_jac_error(
                p0, p1, c0, c1, s0, s1, kf0_e, kf1_e, sh, cam_pyr[0],
                cfg.geo_factor_weight, lp, cfg.dpt_eps,
            )

        ata, atb, err, _ = jax.vmap(
            geo_one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None)
        )(
            _edge_vars(variables, ge.i0),
            _edge_vars(variables, ge.i1),
            variables.code[ge.i0],
            variables.code[ge.i1],
            variables.scale[ge.i0],
            variables.scale[ge.i1],
            kf0,
            kf1,
            loss_param,
            gshared,
        )
        if psd:
            ata = graph.psd_correct(ata)
        gidx = jnp.concatenate(
            [
                graph.slot_indices(ge.i0, bd, sel_pose),
                graph.slot_indices(ge.i1, bd, sel_pose),
                graph.slot_indices(ge.i0, bd, sel_code),
                graph.slot_indices(ge.i1, bd, sel_code),
                graph.slot_indices(ge.i0, bd, sel_scale),
                graph.slot_indices(ge.i1, bd, sel_scale),
            ],
            axis=-1,
        )  # [E, 14+2CS]
        h, b = graph.scatter_hessian(h, b, gidx, ata, atb, ge.valid)
        total_err = total_err + jnp.sum(err * ge.valid)

    # ---- reprojection edges: vars (p0, p1, c0, s0), dim 13+CS ----
    re = problem.reproj_edges
    if re is not None and re.i0.shape[0] > 0:
        rep_loss_param = cfg.reproj_loss_param_factor * float(
            cam_pyr[0].width
        ) ** 2  # mapper.cpp:357

        def rp_one(p0, p1, c0, s0, bias0, jac0, matches, w):
            return rp_ops.reprojection_jac_error(
                p0, p1, c0, s0, bias0, jac0, matches, cam_pyr[0], w,
                rep_loss_param, cfg.dpt_eps,
            )

        ata, atb, err, _ = jax.vmap(rp_one)(
            _edge_vars(variables, re.i0),
            _edge_vars(variables, re.i1),
            variables.code[re.i0],
            variables.scale[re.i0],
            problem.window.bias_flat[re.i0],
            problem.window.jac_flat[re.i0],
            rp_ops.ReprojMatchSet(
                re.loc1d_0, re.homo_0, re.matched_2d_1, re.match_valid
            ),
            re.weight,
        )
        if psd:
            ata = graph.psd_correct(ata)
        gidx = jnp.concatenate(
            [
                graph.slot_indices(re.i0, bd, sel_pose),
                graph.slot_indices(re.i1, bd, sel_pose),
                graph.slot_indices(re.i0, bd, sel_code),
                graph.slot_indices(re.i0, bd, sel_scale),
            ],
            axis=-1,
        )
        h, b = graph.scatter_hessian(h, b, gidx, ata, atb, re.valid)
        total_err = total_err + jnp.sum(err * re.valid)

    # ---- priors ----
    pr = problem.priors
    kf_range = jnp.arange(k, dtype=jnp.int32)

    ata_c, atb_c, err_c = jax.vmap(
        lambda c: priors.code_prior(c, jnp.zeros_like(c), cfg.code_factor_weight)
    )(variables.code)
    gidx_c = graph.slot_indices(kf_range, bd, sel_code)
    h, b = graph.scatter_hessian(h, b, gidx_c, ata_c, atb_c, pr.code_valid)
    total_err = total_err + jnp.sum(err_c * pr.code_valid)

    ata_s, atb_s, err_s = jax.vmap(
        lambda s, s0: priors.scale_prior(s, s0, cfg.init_scale_prior_weight)
    )(variables.scale, pr.scale_init)
    gidx_s = graph.slot_indices(kf_range, bd, sel_scale)
    h, b = graph.scatter_hessian(h, b, gidx_s, ata_s, atb_s, pr.scale_valid)
    total_err = total_err + jnp.sum(err_s * pr.scale_valid)

    ata_p, atb_p, err_p = jax.vmap(
        lambda p_rot, p_trans, t_rot, t_trans: priors.pose_prior(
            SE3(p_rot, p_trans), SE3(t_rot, t_trans), cfg.init_pose_prior_weight
        )
    )(
        variables.pose.rot,
        variables.pose.trans,
        pr.pose_target.rot,
        pr.pose_target.trans,
    )
    gidx_p = graph.slot_indices(kf_range, bd, sel_pose)
    h, b = graph.scatter_hessian(h, b, gidx_p, ata_p, atb_p, pr.pose_valid)
    total_err = total_err + jnp.sum(err_p * pr.pose_valid)

    return h, b, total_err


def total_error(variables: Variables, problem: BAProblem, cam_pyr, cfg):
    """Error-only evaluation for LM accept/reject."""
    dtype = variables.scale.dtype
    total = jnp.zeros((), dtype)

    pe = problem.photo_edges
    if pe.i0.shape[0] > 0:
        kf0, fr1, shared = _photo_inputs(problem.window, pe)
        err, _ = jax.vmap(
            lambda p0, p1, c0, s0, kf0_e, fr1_e, sh: photometric.photometric_error(
                p0, p1, c0, s0, kf0_e, fr1_e, sh, cam_pyr,
                cfg.photo_factor_weights, cfg.dpt_eps,
                soft=getattr(cfg, "soft_inlier_gate", False),
            ),
            in_axes=(0, 0, 0, 0, 0, 0, None),
        )(
            _edge_vars(variables, pe.i0),
            _edge_vars(variables, pe.i1),
            variables.code[pe.i0],
            variables.scale[pe.i0],
            kf0,
            fr1,
            shared,
        )
        total = total + jnp.sum(err * pe.valid)

    ge = problem.geo_edges
    if ge.i0.shape[0] > 0:
        kf0, kf1, gshared = _geo_inputs(
            problem.window, ge, variables, cam_pyr[0], which="dpt"
        )
        loss_param = cfg.geo_loss_param_factor * problem.window.avg_sq_bias[
            ge.i0
        ]
        err, _ = jax.vmap(
            lambda p0, p1, c0, c1, s0, s1, kf0_e, kf1_e, lp, sh: geometric.geometric_error(
                p0, p1, c0, c1, s0, s1, kf0_e, kf1_e, sh, cam_pyr[0],
                cfg.geo_factor_weight, lp, cfg.dpt_eps,
            ),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None),
        )(
            _edge_vars(variables, ge.i0),
            _edge_vars(variables, ge.i1),
            variables.code[ge.i0],
            variables.code[ge.i1],
            variables.scale[ge.i0],
            variables.scale[ge.i1],
            kf0,
            kf1,
            loss_param,
            gshared,
        )
        total = total + jnp.sum(err * ge.valid)

    re = problem.reproj_edges
    if re is not None and re.i0.shape[0] > 0:
        rep_loss_param = cfg.reproj_loss_param_factor * float(
            cam_pyr[0].width
        ) ** 2
        err, _ = jax.vmap(
            lambda p0, p1, c0, s0, bias0, jac0, matches, w: rp_ops.reprojection_error(
                p0, p1, c0, s0, bias0, jac0, matches, cam_pyr[0], w,
                rep_loss_param, cfg.dpt_eps,
            )
        )(
            _edge_vars(variables, re.i0),
            _edge_vars(variables, re.i1),
            variables.code[re.i0],
            variables.scale[re.i0],
            problem.window.bias_flat[re.i0],
            problem.window.jac_flat[re.i0],
            rp_ops.ReprojMatchSet(
                re.loc1d_0, re.homo_0, re.matched_2d_1, re.match_valid
            ),
            re.weight,
        )
        total = total + jnp.sum(err * re.valid)

    pr = problem.priors
    _, _, err_c = jax.vmap(
        lambda c: priors.code_prior(c, jnp.zeros_like(c), cfg.code_factor_weight)
    )(variables.code)
    total = total + jnp.sum(err_c * pr.code_valid)
    _, _, err_s = jax.vmap(
        lambda s, s0: priors.scale_prior(s, s0, cfg.init_scale_prior_weight)
    )(variables.scale, pr.scale_init)
    total = total + jnp.sum(err_s * pr.scale_valid)
    _, _, err_p = jax.vmap(
        lambda pr_, pt, tr, tt: priors.pose_prior(
            SE3(pr_, pt), SE3(tr, tt), cfg.init_pose_prior_weight
        )
    )(
        variables.pose.rot,
        variables.pose.trans,
        pr.pose_target.rot,
        pr.pose_target.trans,
    )
    total = total + jnp.sum(err_p * pr.pose_valid)
    return total


def run_ba(
    variables: Variables,
    problem: BAProblem,
    cam_pyr: CameraPyramid,
    cfg,
    update_mask: jax.Array,
    max_iters: int | None = None,
    use_conv: bool = False,
):
    """Window BA: damped GN until convergence/budget. Fully jittable.

    Returns (variables, error, iterations, converged). With
    ``use_conv=True`` the LM loop stops early once an accepted step's
    gradient or parameter increment drops below the mapper's
    relinearization thresholds (cfg.relin_grad_thresh /
    cfg.relin_param_inc_thresh) — the reference's RefineMapping iterates
    ISAM2 update() only while variables relinearize
    (live_demo.cpp:252-257, deepfactors.cpp:296-313)."""
    iters = max_iters if max_iters is not None else cfg.max_gn_iters
    problem = prepare_problem(problem, cam_pyr)
    conv_fn = None
    if use_conv:

        def conv_fn(delta, grad):
            return jnp.logical_or(
                jnp.max(jnp.abs(grad)) < cfg.relin_grad_thresh,
                jnp.max(jnp.abs(delta)) < cfg.relin_param_inc_thresh,
            )

    solver = getattr(cfg, "solver", "dense")
    if solver == "auto":
        solver = (
            "schur"
            if variables.num_kf >= getattr(cfg, "schur_min_keyframes", 48)
            else "dense"
        )
    return graph.lm_loop(
        variables,
        lambda v: linearize(v, problem, cam_pyr, cfg),
        lambda v: total_error(v, problem, cam_pyr, cfg),
        update_mask,
        iters,
        init_damp=cfg.gn_init_damp,
        min_damp=cfg.gn_min_damp,
        max_damp=cfg.gn_max_damp,
        damp_dec=cfg.gn_damp_dec_factor,
        damp_inc=cfg.gn_damp_inc_factor,
        conv_fn=conv_fn,
        solver=solver,
    )
