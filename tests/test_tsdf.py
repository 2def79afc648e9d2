"""TSDF fusion: a fronto-parallel plane fuses to a planar zero-crossing."""

import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.eval import tsdf
from sage_slam_tpu.geometry.camera import PinholeCamera
from sage_slam_tpu.geometry.se3 import SE3


def test_plane_fusion():
    h, w = 32, 40
    cam = PinholeCamera(fx=40.0, fy=40.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    depth = jnp.full((h, w), 1.0)
    mask = jnp.ones((h, w))
    vol = tsdf.TSDFVolume.create(
        origin=(-0.5, -0.5, 0.0), dims=(32, 32, 32), voxel_size=0.05
    )
    vol = tsdf.integrate(vol, depth, mask, SE3.identity(), cam)
    t = np.array(vol.tsdf)
    wgt = np.array(vol.weight)
    assert wgt.sum() > 0
    # zero-crossing near z = 1.0 (voxel index z=20: origin 0 + 20*0.05)
    zc = t[16, 16, :]
    observed = wgt[16, 16, :] > 0
    assert observed.any()
    # in front of the surface (z<1): positive; behind: negative (within trunc)
    assert zc[observed & (np.arange(32) * 0.05 < 0.9)].min() > 0.5
    near = np.abs(np.arange(32) * 0.05 - 1.0) < 0.05
    assert np.abs(zc[near & observed]).max() < 0.5


def test_extract_and_save(tmp_path):
    import os

    h, w = 16, 20
    cam = PinholeCamera(fx=20.0, fy=20.0, cx=w / 2, cy=h / 2, width=w, height=h)
    vol = tsdf.TSDFVolume.create((-0.5, -0.5, 0.0), (16, 16, 16), 0.08)
    vol = tsdf.integrate(
        vol, jnp.full((h, w), 0.7), jnp.ones((h, w)), SE3.identity(), cam
    )
    pts = tsdf.extract_points(vol)
    assert len(pts) > 0
    path = os.path.join(tmp_path, "mesh.ply")
    tsdf.save_ply(path, pts)
    assert os.path.getsize(path) > 100


def test_warp_display(tmp_path):
    """Identity warp reproduces the frame content where valid."""
    import jax.numpy as jnp
    import os

    from sage_slam_tpu.viz import warp_display

    h, w = 16, 20
    cam = PinholeCamera(fx=20.0, fy=20.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, h * w)).astype(np.float32)
    depth = jnp.full((h * w,), 1.0)
    mask = jnp.ones((h * w,))
    warped, valid = warp_display.se3_warp_image(
        jnp.asarray(img), depth, mask, np.eye(3, dtype=np.float32),
        np.zeros(3, np.float32), cam,
    )
    assert valid.min() > 0.5
    np.testing.assert_allclose(
        warped.reshape(3, -1), img, atol=1e-4
    )
    cb = warp_display.checkerboard(h, w)
    assert cb.shape == (h, w) and set(np.unique(cb)) == {0.0, 1.0}
