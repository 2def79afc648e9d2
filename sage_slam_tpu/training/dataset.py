"""Training dataset — (src, close, far) frame triplets with supervision.

Mirrors representation/datasets/endoscopy_dataset.py at the interface
level: each sample provides images, masks, GT depths, relative poses, and
keypoint locations for the descriptor losses. Sources:

* NpzSequenceDataset — sequences stored as .npz (color [N,H,W,3],
  depth [N,H,W], mask [H,W], intrinsics [4], poses [N,4,4] world-from-cam)
  — the h5py-free counterpart of fusion_data.hdf5,
* SyntheticTripletDataset — procedural fixture used by the tests.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

from ..geometry.camera import PinholeCamera


@dataclasses.dataclass
class Triplet:
    image_src: np.ndarray  # [3, H, W]
    image_close: np.ndarray
    image_far: np.ndarray
    mask: np.ndarray  # [h, w] output res
    depth_src: np.ndarray  # [h, w] GT depth at output res
    depth_close: np.ndarray
    rel_pose_close_src: np.ndarray  # [4, 4] T_close_from_src
    keypoints_src: np.ndarray  # [K] 1d pixel ids (output res)
    gt_match_close: np.ndarray  # [K] 1d pixel ids in close frame
    camera: PinholeCamera  # output-res intrinsics


class NpzSequenceDataset:
    def __init__(
        self,
        path: str,
        num_keypoints: int = 128,
        close_range: int = 3,
        far_min: int = 10,
        seed: int = 0,
    ):
        self.d = np.load(path)
        self.rng = np.random.default_rng(seed)
        self.num_keypoints = num_keypoints
        self.close_range = close_range
        self.far_min = far_min
        intr = self.d["intrinsics"].reshape(-1)
        h, w = self.d["depth"].shape[1:3]
        self.cam = PinholeCamera(
            fx=float(intr[0]), fy=float(intr[1]), cx=float(intr[2]),
            cy=float(intr[3]), width=w, height=h,
        )

    def __len__(self):
        return self.d["color"].shape[0]

    def sample(self) -> Triplet:
        n = len(self)
        src = int(self.rng.integers(0, n))
        close = int(
            np.clip(
                src + self.rng.integers(1, self.close_range + 1) *
                self.rng.choice([-1, 1]),
                0, n - 1,
            )
        )
        far_lo = (src + self.far_min) % n
        far = int(far_lo)
        poses = self.d["poses"]
        rel = np.linalg.inv(poses[close]) @ poses[src]
        depth_src = self.d["depth"][src]
        mask = self.d["mask"].astype(np.float32)
        kps, matches = _project_keypoints(
            depth_src, rel, self.cam, mask, self.num_keypoints, self.rng
        )

        def img(i):
            im = np.asarray(self.d["color"][i], np.float32)
            if im.max() > 1.5:
                im = im / 255.0
            return im.transpose(2, 0, 1)

        return Triplet(
            image_src=img(src),
            image_close=img(close),
            image_far=img(far),
            mask=mask,
            depth_src=depth_src.astype(np.float32),
            depth_close=self.d["depth"][close].astype(np.float32),
            rel_pose_close_src=rel.astype(np.float32),
            keypoints_src=kps,
            gt_match_close=matches,
            camera=self.cam,
        )


def _project_keypoints(depth_src, rel, cam, mask, k, rng):
    """GT correspondences by projecting src keypoints into the close
    frame with the GT depth + relative pose."""
    h, w = depth_src.shape
    valid = np.flatnonzero((mask.reshape(-1) > 0.5) & (depth_src.reshape(-1) > 1e-6))
    kps = rng.choice(valid, size=min(k, len(valid)), replace=False)
    xs = kps % w
    ys = kps // w
    z = depth_src.reshape(-1)[kps]
    x3 = (xs - cam.cx) / cam.fx * z
    y3 = (ys - cam.cy) / cam.fy * z
    pts = np.stack([x3, y3, z, np.ones_like(z)], 0)
    warped = rel @ pts
    u = warped[0] / np.maximum(warped[2], 1e-6) * cam.fx + cam.cx
    v = warped[1] / np.maximum(warped[2], 1e-6) * cam.fy + cam.cy
    ui = np.clip(np.round(u), 0, w - 1).astype(np.int64)
    vi = np.clip(np.round(v), 0, h - 1).astype(np.int64)
    return kps.astype(np.int64), (vi * w + ui)


class SyntheticTripletDataset:
    """Textured plane under known lateral motion (test fixture)."""

    def __init__(self, height=32, width=40, num_keypoints=32, seed=0):
        self.h, self.w = height, width
        self.rng = np.random.default_rng(seed)
        self.k = num_keypoints
        self.cam = PinholeCamera(
            fx=width * 1.2, fy=width * 1.2, cx=width / 2 - 0.5,
            cy=height / 2 - 0.5, width=width, height=height,
        )
        yy, xx = np.meshgrid(
            np.arange(height * 4), np.arange(width * 4), indexing="ij"
        )
        self.tex = np.stack(
            [
                0.5 + 0.5 * np.sin(0.13 * xx + 0.09 * yy + p)
                for p in (0.0, 2.0, 4.0)
            ]
        ).astype(np.float32)

    def sample(self) -> Triplet:
        h2, w2 = self.h * 2, self.w * 2  # input res
        shift = int(self.rng.integers(1, 4))

        def window(ox):
            return self.tex[:, :h2, ox : ox + w2]

        depth = np.full((self.h, self.w), 1.5, np.float32)
        mask = np.ones((self.h, self.w), np.float32)
        # lateral translation: shift pixels at input res = shift/2 at out
        tx = shift / 2 / self.cam.fx * 1.5  # world units
        rel = np.eye(4, dtype=np.float32)
        rel[0, 3] = -tx
        kps, matches = _project_keypoints(
            depth, rel, self.cam, mask, self.k, self.rng
        )
        return Triplet(
            image_src=window(0),
            image_close=window(shift),
            image_far=window(w2),
            mask=mask,
            depth_src=depth,
            depth_close=depth,
            rel_pose_close_src=rel,
            keypoints_src=kps,
            gt_match_close=matches,
            camera=self.cam,
        )
