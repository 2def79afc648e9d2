"""End-to-end SLAM smoke test on a synthetic sequence (tiny config)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.config import (
    KeyframeConfig,
    MapperConfig,
    SlamConfig,
    TrackerConfig,
)
from sage_slam_tpu.frontend.slam import SlamSystem
from sage_slam_tpu.io import tum_io
from sage_slam_tpu.io.dataset import SyntheticInterface
from sage_slam_tpu.models import depth_network, feature_network


def tiny_system(num_frames=10, seed=0, max_keyframes=8):
    h_out, w_out = 16, 20
    cs, fs = 4, 8
    cfg = SlamConfig(
        net_input_size=(h_out * 2, w_out * 2),
        net_output_size=(h_out, w_out),
        code_size=cs,
        feat_size=fs,
        pyramid_levels=3,
        max_keyframes=max_keyframes,
        tracker=TrackerConfig(
            max_num_iters=10, desc_num_keypoints=32, use_reprojection=True
        ),
        mapper=MapperConfig(
            pho_num_samples=64,
            desc_num_keypoints=32,
            window_size=4,
            max_gn_iters=3,
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
    )
    depth_params = depth_network.init_params(jax.random.key(1), depth_cfg)
    feat_params = feature_network.init_params(jax.random.key(2), feat_cfg)

    data = SyntheticInterface(
        num_frames=num_frames,
        height=h_out * 2,
        width=w_out * 2,
        seed=seed,
        motion_scale=0.02,
    )
    out_cam = data.intrinsics().resized(w_out, h_out)
    mask = jnp.ones((h_out, w_out))
    system = SlamSystem(
        cfg, out_cam, mask, depth_params, feat_params,
        depth_cfg=depth_cfg, feat_cfg=feat_cfg,
    )
    return system, data


def test_slam_pipeline_runs():
    system, data = tiny_system(num_frames=8)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    results = []
    for rec in frames[1:]:
        res = system.process_frame(rec.timestamp, jnp.asarray(rec.image))
        results.append(res)
        if res.new_keyframe:
            system.mapper.mapping_step()

    assert len(system.trajectory) == len(frames)
    # all poses finite
    for ts, pose in system.trajectory:
        assert np.all(np.isfinite(np.array(pose.trans)))
        assert np.all(np.isfinite(np.array(pose.rot)))
    # depth maps stay positive-ish and finite after BA
    for i in range(system.store.num_active):
        d = np.array(system.store.depth_map(i))
        assert np.all(np.isfinite(d))
    # refine and make sure error does not blow up
    err = system.refine_mapping(2)
    assert np.isfinite(err)
    assert err < 1e9, "mapping stuck at the scale-penalty plateau"
    assert float(system.store.variables.scale[:system.store.num_active].min()) > 0


def test_slam_creates_keyframes_under_motion():
    system, data = tiny_system(num_frames=8)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:]:
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    # camera moves every frame; at least one more keyframe expected
    assert system.store.num_active >= 2
    # links exist between keyframes
    assert any(system.store.connections(i) for i in range(system.store.num_active))


def test_keyframe_switch_pose_reexpression():
    """Regression for the pose_ck double-inversion bug (round-1 verdict #1).

    When select_keyframe switches reference keyframes, the re-expressed
    camera-from-keyframe pose must satisfy
    ``pose(kf_new) ∘ inverse(pose_ck) == world_pose_guess``
    (deepfactors.cpp:1989-2017). The old code returned the inverse of the
    correct value, so the reconstructed frame pose was wrong by O(1).
    """
    from sage_slam_tpu.geometry import se3 as se3m
    from sage_slam_tpu.geometry.se3 import se3_exp

    system, data = tiny_system(num_frames=4)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    # add a second keyframe via the normal path
    system.force_keyframe = True
    system.process_frame(frames[1].timestamp, jnp.asarray(frames[1].image))
    assert system.store.num_active >= 2

    # give the two keyframes distinct, non-trivial poses
    rng = np.random.default_rng(7)
    for i in range(2):
        p = se3_exp(jnp.asarray(rng.standard_normal(6) * 0.5, jnp.float32))
        from sage_slam_tpu.mapping.keyframe_store import set_row
        from sage_slam_tpu.solver.graph import Variables
        from sage_slam_tpu.geometry.se3 import SE3

        v = system.store.variables
        system.store.variables = Variables(
            pose=SE3(
                set_row(v.pose.rot, i, p.rot),
                set_row(v.pose.trans, i, p.trans),
            ),
            code=v.code,
            scale=v.scale,
        )

    wpg = se3_exp(jnp.asarray(rng.standard_normal(6) * 0.3, jnp.float32))
    for kf_id in (0, 1):
        pose_ck = system._reexpress_pose_ck(wpg, kf_id)
        recon = se3m.compose(system.store.pose(kf_id), se3m.inverse(pose_ck))
        np.testing.assert_allclose(
            np.array(recon.rot), np.array(wpg.rot), atol=1e-5
        )
        np.testing.assert_allclose(
            np.array(recon.trans), np.array(wpg.trans), atol=1e-5
        )


def test_tum_roundtrip(tmp_path):
    from sage_slam_tpu.geometry.se3 import se3_exp

    traj = [
        (float(i), se3_exp(jnp.asarray(np.random.default_rng(i).standard_normal(6) * 0.3, jnp.float32)))
        for i in range(5)
    ]
    path = os.path.join(tmp_path, "traj.txt")
    tum_io.write_tum(path, traj)
    back = tum_io.read_tum(path)
    assert len(back) == 5
    for (ts, pose), (ts2, t2, r2) in zip(traj, back):
        assert ts == ts2
        np.testing.assert_allclose(np.array(pose.trans), t2, atol=1e-6)
        np.testing.assert_allclose(np.array(pose.rot), r2, atol=1e-5)


def test_finalized_trajectory_follows_keyframe_updates():
    """finalized_trajectory re-expresses every frame from the CURRENT
    keyframe estimates (deepfactors.cpp:1591/:2005 role): after a
    keyframe pose/scale changes (BA, loop closure), frames tracked
    against it move rigidly+scaled with it, while the as-tracked
    self.trajectory snapshot stays frozen."""
    from sage_slam_tpu.geometry import se3 as se3m
    from sage_slam_tpu.geometry.se3 import SE3, se3_exp

    system, data = tiny_system(num_frames=8)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:]:
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))

    assert len(system.frame_refs) == len(system.trajectory)
    fin0 = system.finalized_trajectory()
    assert len(fin0) == len(system.trajectory)
    # before any store change the two agree (scale ratio is 1)
    for (_, a), (_, b) in zip(fin0, system.trajectory):
        np.testing.assert_allclose(
            np.array(a.trans), np.array(b.trans), atol=1e-5
        )

    # mutate one keyframe pose + scale as a loop closure would
    ref_of = {i: r for _, r, _, _ in [
        (ts, ref, p, s) for ts, ref, p, s in system.frame_refs
    ] for i in [r]}
    kf = max(ref_of)  # a keyframe some frames actually reference
    delta = se3_exp(jnp.asarray([0.05, -0.02, 0.01, 0.1, -0.05, 0.2],
                                jnp.float32))
    v = system.store.variables
    new_pose = se3m.compose(delta, system.store.pose(kf))
    q = 1.3
    system.store.variables = v._replace(
        pose=SE3(
            v.pose.rot.at[kf].set(new_pose.rot),
            v.pose.trans.at[kf].set(new_pose.trans),
        ),
        scale=v.scale.at[kf].set(v.scale[kf] * q),
    )
    fin1 = system.finalized_trajectory()
    moved = 0
    for (ts, ref, pose_ck, s_track), (_, a), (_, b) in zip(
        system.frame_refs, fin1, fin0
    ):
        if ref != kf:
            np.testing.assert_allclose(
                np.array(a.trans), np.array(b.trans), atol=1e-5
            )
            continue
        moved += 1
        # expected: new_pose ∘ (inv(pose_ck) with trans scaled by q)
        kc = se3m.inverse(pose_ck)
        want = se3m.compose(new_pose, SE3(kc.rot, kc.trans * q))
        np.testing.assert_allclose(
            np.array(a.trans), np.array(want.trans), atol=1e-5
        )
        np.testing.assert_allclose(
            np.array(a.rot), np.array(want.rot), atol=1e-5
        )
    assert moved > 0
