"""Endoscopy training-dataset semantics (endoscopy_dataset.py parity):
FAST keypoints with match/no-match split, distance-ranked close/far
selection, overlap-constrained resampling, median-depth scale
normalization, pose perturbation, rotation augmentation, and the
fusion_data.hdf5 reader with patient filtering."""

import numpy as np
import pytest

from sage_slam_tpu.geometry.camera import PinholeCamera
from sage_slam_tpu.training import dataset as ds


def _checkerboard(h, w, cell=4, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = ((yy // cell + xx // cell) % 2).astype(np.float32)
    img = 0.25 + 0.5 * base + 0.1 * rng.random((h, w))
    return np.stack([img, img * 0.9, img * 0.8], -1).clip(0, 1)


def _make_sequence(n=16, h=48, w=64, step=0.01, seed=0):
    """Forward-translating camera over a textured fronto-parallel plane."""
    color = np.stack([_checkerboard(h, w, seed=i) for i in range(n)], 0)
    depth = np.full((n, h, w), 1.5, np.float32)
    mask = np.ones((h, w), np.float32)
    poses = np.stack([np.eye(4) for _ in range(n)], 0)
    poses[:, 0, 3] = step * np.arange(n)  # lateral track
    intr = np.array([w * 1.1, w * 1.1, w / 2 - 0.5, h / 2 - 0.5])
    return color, depth, mask, intr, poses


def _cfg(**kw):
    base = dict(
        num_keypoints=32,
        frame_interval=2,
        far_frame_interval=8,
        tgt_overlap_ratio=0.5,
        far_overlap_ratio=0.99,  # lateral track: far frame still overlaps
        random_overlap_ratio=0.3,
        max_rot_angle_rad=0.05,
        max_trans_dist_offset=0.02,
        aug_rot_limit=0.3,
        max_resample=40,
    )
    base.update(kw)
    return ds.TripletConfig(**base)


def test_fast_keypoints_on_texture():
    img = _checkerboard(96, 128).transpose(2, 0, 1)
    mask = np.ones((48, 64), np.float32)
    kps = ds.fast_keypoints_1d(img, mask, (48, 64), threshold=1)
    assert kps.size > 10
    assert kps.min() >= 0 and kps.max() < 48 * 64
    assert np.unique(kps).size == kps.size
    # keypoints respect the (eroded) mask: none in a masked-out half
    half = mask.copy()
    half[:, 32:] = 0
    kps2 = ds.fast_keypoints_1d(img, half, (48, 64), threshold=1)
    assert kps2.size > 0
    assert np.all(kps2 % 64 < 32)


def test_scene_overlap_identity_and_disjoint():
    cam = PinholeCamera(fx=50, fy=50, cx=31.5, cy=23.5, width=64, height=48)
    depth = np.full((48, 64), 2.0)
    mask = np.ones((48, 64))
    pr, ar = ds.compute_scene_overlap(np.eye(4), depth, mask, mask, cam)
    assert pr == pytest.approx(1.0)
    assert ar == pytest.approx(1.0)
    # huge lateral shift throws every point off the target mask
    far = np.eye(4)
    far[0, 3] = 100.0
    pr2, _ = ds.compute_scene_overlap(far, depth, mask, mask, cam)
    assert pr2 < 0.05


def test_match_no_match_split():
    cam = PinholeCamera(fx=50, fy=50, cx=31.5, cy=23.5, width=64, height=48)
    depth = np.full((48, 64), 2.0)
    tgt_mask = np.ones((48, 64))
    tgt_mask[:, :32] = 0  # left half of the target is invalid
    # shift pushes src pixels LEFT in the target → left-side keypoints
    # land in the masked-out half → no-match
    rel = np.eye(4)
    rel[0, 3] = 1.0  # ~25 px right
    kps = np.arange(0, 48 * 64, 97, dtype=np.int64)
    m_src, m_tgt, nm = ds.split_match_candidates(kps, depth, rel, cam, tgt_mask)
    assert m_src.size > 0 and nm.size > 0
    assert m_src.size + nm.size == kps.size
    # every match candidate's target id is inside the target mask
    assert np.all(tgt_mask.reshape(-1)[m_tgt] > 0.5)
    # and reprojection agrees with the returned id to rounding
    u, v, _ = ds._project_points(m_src, depth, rel, cam, 1e-2)
    np.testing.assert_array_equal(
        np.round(v).astype(np.int64) * 64 + np.round(u).astype(np.int64),
        m_tgt,
    )


def test_perturb_pose_bounds():
    rng = np.random.default_rng(0)
    rel = np.eye(4)
    rel[:3, :3] = ds._rotvec_to_matrix(np.array([0.0, 0.2, 0.0]))
    rel[:3, 3] = [0.1, 0.0, 0.02]
    cfg = _cfg(max_rot_angle_rad=0.1, max_trans_dist_offset=0.05)
    for _ in range(20):
        guess = ds.perturb_pose(rel, cfg, rng)
        # rotation stays within max_rot_angle of GT
        dr = guess[:3, :3] @ rel[:3, :3].T
        ang = np.linalg.norm(ds._matrix_to_rotvec(dr))
        assert ang <= cfg.max_rot_angle_rad + 1e-6
        # valid rotation matrix
        np.testing.assert_allclose(
            guess[:3, :3] @ guess[:3, :3].T, np.eye(3), atol=1e-9
        )


def test_far_close_distance_ranking():
    cfg = _cfg(frame_interval=2, far_frame_interval=6)
    rng = np.random.default_rng(3)
    t = np.zeros((20, 3))
    t[:, 0] = np.arange(20) * 0.1  # monotone track: distance == frame gap
    for _ in range(10):
        src = 10
        close, far = ds.generate_far_close_idx(src, 20, t, cfg, rng)
        assert abs(close - src) <= cfg.frame_interval
        assert abs(far - src) >= cfg.far_frame_interval - 1
        assert abs(t[far, 0] - t[src, 0]) >= abs(t[close, 0] - t[src, 0])


def test_npz_dataset_full_pipeline(tmp_path):
    color, depth, mask, intr, poses = _make_sequence()
    p = tmp_path / "seq.npz"
    np.savez(p, color=color, depth=depth, mask=mask, intrinsics=intr, poses=poses)
    d = ds.NpzSequenceDataset(str(p), cfg=_cfg(), seed=1)
    t = d.sample()
    h, w = t.depth_src.shape
    assert t.image_src.shape == (3, 2 * h, 2 * w)
    assert t.keypoints_src.shape == (32,)
    assert t.gt_match_close.shape == (32,)
    assert t.no_match_src.shape == (32,)
    assert t.rot_angles.shape == (3,)
    assert np.all(np.abs(t.rot_angles) <= 0.3)
    assert t.init_rel_pose.shape == (4, 4)
    assert t.init_overlap_ratio > 0.3
    # median-depth scale normalization: median of valid src depths == 1
    vals = t.depth_src[(t.mask > 0.5) & (t.depth_src > 0)]
    assert np.median(vals) == pytest.approx(1.0, rel=0.1)
    # keypoint matches verify against GT depth + pose
    u, v, _ = ds._project_points(
        t.keypoints_src, t.depth_src, t.rel_pose_close_src, t.camera, 1e-2
    )
    np.testing.assert_array_equal(
        np.round(v).astype(np.int64) * w + np.round(u).astype(np.int64),
        t.gt_match_close,
    )
    # perturbed init differs from GT but stays in the overlap regime
    assert not np.allclose(t.init_rel_pose, t.rel_pose_close_src)


def test_fusion_hdf5_dataset(tmp_path):
    h5py = pytest.importorskip("h5py")
    color, depth, mask, intr, poses = _make_sequence(n=14)
    k33 = np.array(
        [[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1.0]]
    )
    for bag, n in ((1, 14), (2, 6), (7, 10)):
        root = tmp_path / f"bag_{bag}" / "seq_0"
        root.mkdir(parents=True)
        with h5py.File(root / "fusion_data.hdf5", "w") as f:
            f["color"] = (255 * color[:n]).astype(np.uint8)
            f["mask"] = mask[..., None]
            f["render_depth"] = depth[:n, ..., None]
            f["render_mask"] = np.ones_like(depth[:n, ..., None])
            f["extrinsics"] = poses[:n]
            f["intrinsics"] = k33[None]

    d = ds.FusionHDF5Dataset(
        str(tmp_path), patient_ids=[1, 2], out_hw=(24, 32), in_hw=(48, 64),
        cfg=_cfg(), seed=0,
    )
    # bag_7 filtered out; sqrt(frame-count) sampling over the other two
    assert len(d.files) == 2
    np.testing.assert_allclose(
        d.probability,
        np.sqrt([14, 6]) / (np.sqrt(14) + np.sqrt(6)),
    )
    t = d.sample()
    assert t.depth_src.shape == (24, 32)
    assert t.image_src.shape == (3, 48, 64)
    assert t.keypoints_src.shape == (32,)
    assert np.isfinite(t.rel_pose_close_src).all()
    # intrinsics rescaled from native 48x64 to 24x32
    assert t.camera.fx == pytest.approx(intr[0] * 32 / 64)

    with pytest.raises(FileNotFoundError):
        ds.FusionHDF5Dataset(str(tmp_path), patient_ids=[99])


def test_triplet_to_batch_new_fields():
    from sage_slam_tpu.training import train

    color, depth, mask, intr, poses = _make_sequence()
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "seq.npz")
        np.savez(
            p, color=color, depth=depth, mask=mask, intrinsics=intr,
            poses=poses,
        )
        t = ds.NpzSequenceDataset(p, cfg=_cfg(), seed=2).sample()
    batch = train.triplet_to_batch(t, t.camera)
    assert batch["no_match_src"].shape == (32,)
    assert float(batch["far_valid"]) in (0.0, 1.0)
    assert batch["tau_init"].shape == (6,)
    assert batch["flow_mask"].shape == t.depth_src.shape
    # tau_init reproduces the perturbed init pose
    from sage_slam_tpu.geometry import se3 as se3m

    se = se3m.se3_exp(batch["tau_init"])
    np.testing.assert_allclose(
        np.asarray(se.rot), t.init_rel_pose[:3, :3], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(se.trans), t.init_rel_pose[:3, 3], atol=1e-5
    )
