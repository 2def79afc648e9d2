"""ICL-NUIM / ScanNet directory readers (io/dataset.py, reference S12)."""

import os

import numpy as np
import pytest

from sage_slam_tpu.io import dataset

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_color(path, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)
    return img


def _write_depth16(path, value, h=24, w=32):
    arr = np.full((h, w), value, np.uint16)
    Image.fromarray(arr, mode="I;16").save(path)


def _make_icl(root):
    os.makedirs(root, exist_ok=True)
    lines = []
    for i in range(3):
        _write_color(os.path.join(root, f"rgb_{i}.png"), seed=i)
        _write_depth16(os.path.join(root, f"depth_{i}.png"), 5000 * (i + 1))
        lines.append(f"{i}.0 depth_{i}.png {i}.0 rgb_{i}.png")
    with open(os.path.join(root, "associate.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n")
        f.write("0.0 1.0 2.0 3.0 0 0 0 1\n")
        f.write("1.0 1.5 2.0 3.0 0 0 0 1\n")
        f.write("2.0 2.0 2.5 3.0 0 0 0 1\n")


def test_icl_reader(tmp_path):
    root = str(tmp_path / "icl")
    _make_icl(root)
    ds = dataset.from_url(f"icl://{root}")
    cam = ds.intrinsics()
    assert (cam.fx, cam.fy, cam.width, cam.height) == (481.2, 480.0, 640, 480)
    frames = list(ds.frames())
    assert len(frames) == 2  # last association dropped (pose missing)
    f0, f1 = frames
    assert f0.image.shape == (3, 24, 32)
    # depth PNG value 5000 at 1/5000 scale -> 1 m
    np.testing.assert_allclose(f0.depth, 1.0)
    np.testing.assert_allclose(f1.depth, 2.0)
    # poses are re-expressed relative to the first pose
    np.testing.assert_allclose(f0.pose_wf, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(f1.pose_wf[:3, 3], [0.5, 0.0, 0.0], atol=1e-12)


def _make_scannet(root):
    for sub in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(2):
        img = _write_color(os.path.join(root, "color", f"{i}.jpg"), seed=i)
        _write_depth16(os.path.join(root, "depth", f"{i}.png"), 1500)
        pose = np.eye(4)
        pose[0, 3] = i * 0.1
        np.savetxt(os.path.join(root, "pose", f"{i}.txt"), pose)
    k = np.eye(4)
    k[0, 0], k[1, 1], k[0, 2], k[1, 2] = 30.0, 31.0, 16.0, 12.0
    np.savetxt(os.path.join(root, "intrinsic", "intrinsic_color.txt"), k)
    return img


def test_scannet_reader(tmp_path):
    root = str(tmp_path / "scan")
    _make_scannet(root)
    ds = dataset.from_url(f"scannet://{root}", resize=False)
    cam = ds.intrinsics()
    assert (cam.width, cam.height) == (32, 24)
    assert cam.fx == 30.0 and cam.cy == 12.0
    frames = list(ds.frames())
    assert len(frames) == 2
    np.testing.assert_allclose(frames[0].depth, 1.5)
    np.testing.assert_allclose(frames[1].pose_wf[0, 3], 0.1)

    # the reference rescales to 640x480 (scannet_interface.cpp:67-68)
    ds2 = dataset.from_url(f"scannet://{root}")
    cam2 = ds2.intrinsics()
    assert (cam2.width, cam2.height) == (640, 480)
    f = next(iter(ds2.frames()))
    assert f.image.shape == (3, 480, 640)
