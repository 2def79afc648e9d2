"""hdf5:// production input path, end-to-end through the demo CLI
(round-3 verdict #6): pack an analytic sequence into the reference's
fusion_data.hdf5 layout (color [N,H,W,3] uint8, mask [H,W,1],
intrinsics [4] — hdf5_interface.cpp:9-112), run the threaded demo CLI
over the hdf5:// URL, and assert exact trajectory parity with the same
uint8 data served through the NpzInterface reader."""

import json
import os

import jax
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from sage_slam_tpu.config import (
    KeyframeConfig,
    MapperConfig,
    SlamConfig,
    TrackerConfig,
)
from sage_slam_tpu.io.dataset import Bowl3DInterface, NpzInterface
from sage_slam_tpu.io import tum_io
from sage_slam_tpu.models import depth_network, feature_network
from sage_slam_tpu.training import export


def _tiny_cfg():
    return SlamConfig(
        net_input_size=(32, 40),
        net_output_size=(16, 20),
        code_size=4,
        feat_size=8,
        pyramid_levels=3,
        max_keyframes=12,
        tracker=TrackerConfig(max_num_iters=10, desc_num_keypoints=32),
        mapper=MapperConfig(
            pho_num_samples=64, desc_num_keypoints=32, window_size=4,
            max_gn_iters=3,
        ),
        keyframe=KeyframeConfig(min_average_motion=0.02),
    )


def test_hdf5_cli_end_to_end(tmp_path):
    data = Bowl3DInterface(
        num_frames=10, height=32, width=40, seed=0,
        orbit_radius=0.16, rot_amp=0.15, mask_margin=2,
    )
    cam = data.intrinsics()
    frames = [data.render(i)[0] for i in range(data.n)]
    color = np.stack(
        [np.clip(f * 255.0, 0, 255).astype(np.uint8).transpose(1, 2, 0)
         for f in frames]
    )
    mask = data.mask().astype(np.float32)

    h5_path = tmp_path / "fusion_data.hdf5"
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("color", data=color)
        f.create_dataset("mask", data=mask[..., None])
        f.create_dataset(
            "intrinsics",
            data=np.array([cam.fx, cam.fy, cam.cx, cam.cy], np.float32),
        )
    npz_path = tmp_path / "fusion_data.npz"
    np.savez(
        npz_path, color=color, mask=mask,
        intrinsics=np.array([cam.fx, cam.fy, cam.cx, cam.cy], np.float32),
    )

    cfg = _tiny_cfg()
    cfg_path = tmp_path / "config.json"
    cfg.to_json(str(cfg_path))

    # tiny nets via the netcfg sidecar (handcrafted features: the CLI
    # must run the learned-prior plumbing, but this test targets the
    # READER chain, not net quality)
    depth_cfg = depth_network.DepthNetConfig(
        filter_list=(4, 8, 16), bottleneck=16, bias_inner=(8, 1),
        basis_inner=((8, 4),),
    )
    feat_cfg = feature_network.FeatureNetConfig(
        filter_list=(4, 8, 16), bottleneck=16, desc_inner=(8, 8),
        map_inner=(8, 8), mode="handcrafted",
    )
    netcfg_path = tmp_path / "net_netcfg.json"
    with open(netcfg_path, "w") as f:
        json.dump(
            {"depth": depth_cfg._asdict(), "feat": feat_cfg._asdict()}, f
        )

    from sage_slam_tpu.demo import run_slam

    run_dir = tmp_path / "run_hdf5"
    summary = run_slam.main([
        "--source_url", f"hdf5://{h5_path}",
        "--config", str(cfg_path),
        "--net_config", str(netcfg_path),
        "--run_log_dir", str(run_dir),
        # deterministic single-threaded cadence so the trajectory is
        # bit-comparable with the reference NpzInterface run below
        "--no_threads",
    ])
    assert summary["frames"] == 10
    traj_h5 = tum_io.read_tum(os.path.join(run_dir, "trajectory.txt"))
    assert len(traj_h5) == 10
    for _, trans, rot in traj_h5:
        assert np.all(np.isfinite(trans)) and np.all(np.isfinite(rot))

    # parity: the SAME uint8 frames through the npz reader and the
    # driver must give the identical trajectory (readers are
    # interchangeable sources; hdf5_interface.cpp role)
    from sage_slam_tpu.frontend.driver import SlamDriver
    from sage_slam_tpu.frontend.slam import SlamSystem
    import jax.numpy as jnp

    npz_data = NpzInterface(str(npz_path))
    out_cam = npz_data.intrinsics().resized(20, 16)
    mask_full = npz_data.mask()
    ys = (np.arange(16) * mask_full.shape[0] / 16).astype(int)
    xs = (np.arange(20) * mask_full.shape[1] / 20).astype(int)
    mask_out = jnp.asarray(mask_full[np.ix_(ys, xs)])
    key = jax.random.key(0)
    system = SlamSystem(
        cfg, out_cam, mask_out,
        depth_network.init_params(key, depth_cfg),
        feature_network.init_params(key, feat_cfg),
        depth_cfg=depth_cfg, feat_cfg=feat_cfg,
        video_mask_in=jnp.asarray(mask_full),
    )
    SlamDriver(system, use_native_threads=False).run(npz_data)
    # trajectory.txt now carries the FINALIZED frame poses (frames
    # re-expressed from the BA'd keyframes) — compare like-for-like
    traj_npz = system.finalized_trajectory()
    assert len(traj_npz) == len(traj_h5)
    for (ts_h, t_h, r_h), (ts_n, pose_n) in zip(traj_h5, traj_npz):
        assert abs(ts_h - ts_n) < 1e-9
        np.testing.assert_allclose(t_h, np.array(pose_n.trans), atol=1e-5)
