"""Dataset readers (drivers/ equivalents, S12).

URL-prefix factory like CameraInterfaceFactory (camera_interface_factory.cpp):
  hdf5://path   -> HDF5 endoscopy dataset (fusion_data.hdf5 layout:
                   color [N,H,W,3], mask [H,W,1], intrinsics)
  tum://dir     -> TUM RGB-D directory (rgb.txt)
  synthetic://  -> procedurally rendered test sequence

h5py is not available in this environment; the HDF5 reader degrades to a
clear error message if the dependency is missing (stubbed per the build
rules), while the TUM/synthetic readers are pure numpy.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from ..geometry.camera import PinholeCamera


@dataclasses.dataclass
class FrameRecord:
    timestamp: float
    image: np.ndarray  # [3, H, W] float32 in [0, 1]


class CameraInterface:
    """Iterator over frames + intrinsics + mask
    (drivers/camera_interface.h)."""

    def intrinsics(self) -> PinholeCamera:
        raise NotImplementedError

    def mask(self) -> np.ndarray:  # [H, W] float32
        raise NotImplementedError

    def frames(self) -> Iterator[FrameRecord]:
        raise NotImplementedError


def from_url(url: str, **kwargs) -> CameraInterface:
    if url.startswith("hdf5://"):
        return HDF5Interface(url[len("hdf5://") :], **kwargs)
    if url.startswith("tum://"):
        return TumInterface(url[len("tum://") :], **kwargs)
    if url.startswith("synthetic://"):
        return SyntheticInterface(**kwargs)
    raise ValueError(f"unknown dataset url scheme: {url}")


class HDF5Interface(CameraInterface):
    """fusion_data.hdf5 reader (hdf5_interface.cpp:9-112): datasets
    'color' [N,H,W,3] uint8, 'mask' [H,W,1], 'intrinsics' [4] (fx,fy,cx,cy)."""

    def __init__(self, path: str, stride: int = 1):
        try:
            import h5py  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "h5py is not available in this environment; convert the "
                "HDF5 sequence to .npz (color/mask/intrinsics) and use "
                "NpzInterface, or install h5py."
            ) from e
        import h5py

        self._f = h5py.File(path, "r")
        self.stride = stride
        intr = np.array(self._f["intrinsics"]).reshape(-1)
        h, w = self._f["mask"].shape[:2]
        self._cam = PinholeCamera(
            fx=float(intr[0]), fy=float(intr[1]), cx=float(intr[2]),
            cy=float(intr[3]), width=w, height=h,
        )

    def intrinsics(self) -> PinholeCamera:
        return self._cam

    def mask(self) -> np.ndarray:
        return np.array(self._f["mask"]).reshape(
            self._cam.height, self._cam.width
        ).astype(np.float32)

    def frames(self) -> Iterator[FrameRecord]:
        color = self._f["color"]
        for i in range(0, color.shape[0], self.stride):
            img = np.asarray(color[i], np.float32) / 255.0
            yield FrameRecord(float(i), img.transpose(2, 0, 1))


class NpzInterface(CameraInterface):
    """A .npz with color [N,H,W,3] (uint8 or float), mask [H,W],
    intrinsics [4], optional timestamps [N]."""

    def __init__(self, path: str, stride: int = 1):
        self._d = np.load(path)
        self.stride = stride
        intr = self._d["intrinsics"].reshape(-1)
        h, w = self._d["mask"].shape[:2]
        self._cam = PinholeCamera(
            fx=float(intr[0]), fy=float(intr[1]), cx=float(intr[2]),
            cy=float(intr[3]), width=w, height=h,
        )

    def intrinsics(self) -> PinholeCamera:
        return self._cam

    def mask(self) -> np.ndarray:
        return self._d["mask"].astype(np.float32).reshape(
            self._cam.height, self._cam.width
        )

    def frames(self) -> Iterator[FrameRecord]:
        color = self._d["color"]
        ts = self._d.get("timestamps", np.arange(color.shape[0], dtype=np.float64))
        for i in range(0, color.shape[0], self.stride):
            img = np.asarray(color[i], np.float32)
            if img.max() > 1.5:
                img = img / 255.0
            yield FrameRecord(float(ts[i]), img.transpose(2, 0, 1))


class TumInterface(CameraInterface):
    """TUM RGB-D directory: rgb.txt lists 'timestamp filename'
    (tum_interface.cpp)."""

    # TUM fr1 default intrinsics
    DEFAULT = (517.3, 516.5, 318.6, 255.3, 640, 480)

    def __init__(self, root: str, intrinsics: Optional[Tuple] = None):
        self.root = root
        vals = intrinsics or self.DEFAULT
        self._cam = PinholeCamera(
            fx=vals[0], fy=vals[1], cx=vals[2], cy=vals[3],
            width=int(vals[4]), height=int(vals[5]),
        )
        self._list = []
        with open(os.path.join(root, "rgb.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                self._list.append((float(ts), os.path.join(root, rel)))

    def intrinsics(self) -> PinholeCamera:
        return self._cam

    def mask(self) -> np.ndarray:
        return np.ones((self._cam.height, self._cam.width), np.float32)

    def frames(self) -> Iterator[FrameRecord]:
        from PIL import Image  # pillow ships with torch envs

        for ts, path in self._list:
            img = np.asarray(Image.open(path), np.float32) / 255.0
            yield FrameRecord(ts, img.transpose(2, 0, 1))


class SyntheticInterface(CameraInterface):
    """Procedural textured-plane sequence with a known trajectory —
    the fixture for end-to-end tests without data on disk."""

    def __init__(
        self,
        num_frames: int = 20,
        height: int = 64,
        width: int = 80,
        seed: int = 0,
        motion_scale: float = 0.01,
    ):
        self.n = num_frames
        self.h, self.w = height, width
        self.rng = np.random.default_rng(seed)
        self.motion = motion_scale
        self._cam = PinholeCamera(
            fx=width * 1.2, fy=width * 1.2, cx=width / 2 - 0.5,
            cy=height / 2 - 0.5, width=width, height=height,
        )
        yy, xx = np.meshgrid(
            np.arange(height * 2), np.arange(width * 2), indexing="ij"
        )
        self.texture = np.stack(
            [
                0.5 + 0.5 * np.sin(0.11 * xx + 0.07 * yy + p)
                for p in (0.0, 2.1, 4.2)
            ]
        ).astype(np.float32)

    def intrinsics(self) -> PinholeCamera:
        return self._cam

    def mask(self) -> np.ndarray:
        return np.ones((self.h, self.w), np.float32)

    def frames(self) -> Iterator[FrameRecord]:
        for i in range(self.n):
            # translate the texture window -> approximates lateral motion
            ox = int(i * self.motion * self.w)
            oy = int(i * self.motion * self.h * 0.5)
            img = self.texture[:, oy : oy + self.h, ox : ox + self.w]
            yield FrameRecord(float(i), img.copy())
