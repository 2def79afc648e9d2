"""Threaded driver + demo CLI end-to-end (tiny synthetic run)."""

import json
import os

import numpy as np
import pytest


def test_driver_with_native_threads():
    from sage_slam_tpu.frontend.driver import SlamDriver
    from sage_slam_tpu.io.dataset import SyntheticInterface
    from tests.test_slam_e2e import tiny_system

    system, _ = tiny_system(max_keyframes=16)
    data = SyntheticInterface(
        num_frames=6, height=32, width=40, motion_scale=0.02
    )
    driver = SlamDriver(system, use_native_threads=True)
    results = driver.run(data)
    assert len(results) == 5
    assert system.store.num_active >= 1
    for _, pose in system.trajectory:
        assert np.all(np.isfinite(np.array(pose.trans)))


def test_demo_cli_synthetic(tmp_path):
    from sage_slam_tpu.config import (
        KeyframeConfig, MapperConfig, SlamConfig, TrackerConfig,
    )
    from sage_slam_tpu.demo import run_slam

    cfg = SlamConfig(
        net_input_size=(32, 32),
        net_output_size=(16, 16),
        code_size=4,
        feat_size=16,
        pyramid_levels=3,
        max_keyframes=8,
        tracker=TrackerConfig(max_num_iters=6, desc_num_keypoints=16),
        mapper=MapperConfig(
            pho_num_samples=32, desc_num_keypoints=16, max_gn_iters=2,
            refine_mapping_iters=1,
        ),
    )
    cfg_path = os.path.join(tmp_path, "cfg.json")
    cfg.to_json(cfg_path)
    log_dir = os.path.join(tmp_path, "run")
    summary = run_slam.main(
        [
            "--source_url", "synthetic://",
            "--config", cfg_path,
            "--run_log_dir", log_dir,
            "--max_frames", "5",
            "--no_threads",
            "--save_keyframes",
        ]
    )
    assert summary["frames"] >= 4
    assert os.path.exists(os.path.join(log_dir, "trajectory.txt"))
    assert os.path.exists(os.path.join(log_dir, "summary.json"))
    assert os.path.exists(os.path.join(log_dir, "map.png"))

    # result viewer over the produced trajectory
    from sage_slam_tpu.demo import result_viewer

    result_viewer.main(
        [
            os.path.join(log_dir, "trajectory.txt"),
            "--plot", os.path.join(log_dir, "traj.png"),
        ]
    )
    assert os.path.exists(os.path.join(log_dir, "traj.png"))


def test_voc_builder_cli(tmp_path):
    from sage_slam_tpu.demo import voc_builder

    out = os.path.join(tmp_path, "voc.npz")
    voc_builder.main(
        [
            "--source_url", "synthetic://",
            "--output", out,
            "--k", "3",
            "--levels", "2",
            "--points_per_frame", "50",
            "--max_frames", "2",
            "--input_size", "32,32",
        ]
    )
    assert os.path.exists(out)
    voc = voc_builder.load_npz_vocabulary(out)
    assert voc.num_words > 0
