"""End-to-end trajectory ACCURACY regression (round-3 verdict #1).

The synthetic sequence is an exact lateral camera motion over a
fronto-parallel unit-depth plane (io/dataset.SyntheticInterface emits
the ground-truth poses). The estimator is isolated from learning
quality: the depth network is pinned to the constant (perfect) prior
and the feature network runs the fixed translation-equivariant
handcrafted bank (models/feature_network.handcrafted_apply) — an
under-trained conv net's zero-padding acts as a positional encoding
that biases photometric tracking toward zero motion, which is a
learning problem, not an estimator problem (eval/error_budget.py
separates the two). With perfect priors the full frontend + windowed
mapping + refinement must recover the trajectory to a few percent
Sim3-ATE — the reference's eval role
(slam_run_with_hdf5_dataset.py:162).

Round-3 measured 11.8% of span (bound 15%); round 4 measures 4.2%
frame / 4.4% keyframe on this seeded chain (bound 5.5% / 5.0%) after
the feature/texture/damping fixes. The residual few percent is the
planar scene's translation-vs-rotation near-ambiguity plus the
half-pixel resampling noise floor at this 16x20 diagnostic resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.config import (
    KeyframeConfig,
    MapperConfig,
    SlamConfig,
    TrackerConfig,
)
from sage_slam_tpu.eval import ate
from sage_slam_tpu.frontend.slam import SlamSystem
from sage_slam_tpu.io.dataset import SyntheticInterface
from sage_slam_tpu.models import depth_network, feature_network
from sage_slam_tpu.models.depth_network import constant_depth_params


def perfect_prior_system(num_frames=10, motion=0.06):
    h_out, w_out = 16, 20
    cs, fs = 4, 8
    cfg = SlamConfig(
        net_input_size=(h_out * 2, w_out * 2),
        net_output_size=(h_out, w_out),
        code_size=cs,
        feat_size=fs,
        pyramid_levels=3,
        max_keyframes=12,
        # binary gating on purpose: this scene has an ALL-ONES mask, so
        # the binary gate has no mask-border cliffs to wedge on, while
        # the soft gate's bilinear down-weighting of image-border
        # samples only adds a small border bias here (measured 4.2% vs
        # 6.5% frame ATE). Masked scenes (the Bowl3D error budget) are
        # where soft gating earns its default.
        # coarse_to_fine off: at this 16x20 diagnostic size the "two
        # coarsest levels" are 8x10/4x5 — nearly featureless for the
        # plane texture, so phase 1 wanders before phase 2 recovers
        # (measured 9.2% vs 4.2% frame ATE). Real operating sizes keep
        # the default.
        tracker=TrackerConfig(
            max_num_iters=40, desc_num_keypoints=32,
            use_reprojection=True, soft_inlier_gate=False,
            coarse_to_fine=False,
        ),
        # 256 of the 320 pixels sampled: at 64 samples the gated
        # mean-normalized cost is cliff-quantized (one gate flip moves
        # the mean by err/64) and LM wedges on the cliffs
        mapper=MapperConfig(
            pho_num_samples=256,
            desc_num_keypoints=32,
            window_size=8,
            max_gn_iters=10,
            soft_inlier_gate=False,
        ),
        keyframe=KeyframeConfig(min_average_motion=0.02),
    )
    depth_cfg = depth_network.DepthNetConfig(
        filter_list=(4, 8, 16),
        bottleneck=16,
        bias_inner=(8, 1),
        basis_inner=((8, cs),),
    )
    feat_cfg = feature_network.FeatureNetConfig(
        filter_list=(4, 8, 16),
        bottleneck=16,
        desc_inner=(8, fs),
        map_inner=(8, fs),
        mode="handcrafted",
    )
    dp = constant_depth_params(
        depth_network.init_params(jax.random.key(1), depth_cfg)
    )
    fp = feature_network.init_params(jax.random.key(2), feat_cfg)
    data = SyntheticInterface(
        num_frames=num_frames,
        height=h_out * 2,
        width=w_out * 2,
        seed=0,
        motion_scale=motion,
    )
    out_cam = data.intrinsics().resized(w_out, h_out)
    system = SlamSystem(
        cfg, out_cam, jnp.ones((h_out, w_out)), dp, fp,
        depth_cfg=depth_cfg, feat_cfg=feat_cfg,
    )
    return system, data


def test_ate_on_synthetic_lateral_motion():
    system, data = perfect_prior_system()
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:]:
        res = system.process_frame(rec.timestamp, jnp.asarray(rec.image))
        assert not res.tracking_lost
        if res.new_keyframe:
            system.mapper.mapping_step()
    system.refine_mapping(8)

    est = np.stack(
        [np.array(p.trans) for _, p in system.trajectory]
    )
    gt = np.stack([f.pose_wf[:3, 3] for f in frames])
    err_sim3 = ate.ate_rmse(est, gt, align="sim3")
    span = float(np.linalg.norm(gt[-1] - gt[0]))
    assert span > 0.1
    # measured 0.042 * span on this seeded chain (round 4; was 0.118 in
    # round 3 before the equivariant-feature + damping-range fixes)
    assert err_sim3 < 0.055 * span, (err_sim3, span)

    # keyframe trajectory reflects BA + refinement (SaveResults writes
    # both, deepfactors.cpp:1960-1985); measured 0.044 * span
    kf_traj = system.keyframe_trajectory()
    kf_est = np.stack([np.array(p.trans) for _, p in kf_traj])
    kf_gt = np.stack(
        [frames[int(round(ts))].pose_wf[:3, 3] for ts, _ in kf_traj]
    )
    err_kf = ate.ate_rmse(kf_est, kf_gt, align="sim3")
    assert err_kf < 0.05 * span, (err_kf, span)

    # the estimated trajectory must actually move (not a degenerate
    # all-identity solution aligned by scale ~0)
    assert float(np.linalg.norm(est[-1] - est[0])) > 1e-3

    # depth-RMSE asserted wherever ATE is (round-2 verdict missing #5;
    # reference saves per-KF depths for exactly this eval,
    # deepfactors.cpp:1926-1956): the scene is a unit-depth plane, so
    # every keyframe's decoded depth must match after scale alignment
    h, w = 16, 20
    gt_depth = np.ones((h, w), np.float32)
    mask = np.ones((h, w), np.float32)
    for i in range(system.store.num_active):
        est_depth = np.array(system.store.depth_map(i)).reshape(h, w)
        rmse = ate.depth_rmse(est_depth, gt_depth, mask, align_scale=True)
        assert rmse < 0.05, (i, rmse)


def test_ate_rmse_identity():
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((20, 3))
    # similarity-transformed copy aligns to ~0 error
    s, ang = 2.0, 0.3
    rot = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ]
    )
    est = (gt @ rot.T) * s + np.array([1.0, -2.0, 0.5])
    assert ate.ate_rmse(est, gt, align="sim3") < 1e-9
