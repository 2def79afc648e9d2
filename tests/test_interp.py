import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sage_slam_tpu.geometry import interp
from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera


def test_bilinear_matches_torch_grid_sample():
    """Our zero-padding bilinear gather must equal torch grid_sample with
    padding_mode=zeros, align_corners=False — the semantics the reference's
    CUDA corner accumulation reproduces (it cites GridSampler.cuh)."""
    rng = np.random.default_rng(0)
    c, h, w = 3, 16, 20
    img = rng.standard_normal((c, h, w)).astype(np.float32)
    n = 500
    x = rng.uniform(-3, w + 3, n).astype(np.float32)
    y = rng.uniform(-3, h + 3, n).astype(np.float32)

    ours = np.array(
        interp.bilinear_flat(
            jnp.asarray(img.reshape(c, -1)), jnp.asarray(x), jnp.asarray(y), w, h
        )
    )

    gx = (2.0 * x + 1.0) / w - 1.0
    gy = (2.0 * y + 1.0) / h - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], -1)).reshape(1, 1, n, 2)
    ref = (
        F.grid_sample(
            torch.from_numpy(img)[None],
            grid,
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )
        .reshape(c, n)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_matches_torch_grid_sample():
    rng = np.random.default_rng(1)
    h, w = 12, 15
    img = (rng.uniform(size=(1, h, w)) > 0.4).astype(np.float32)
    n = 400
    x = rng.uniform(-2, w + 2, n).astype(np.float32)
    y = rng.uniform(-2, h + 2, n).astype(np.float32)

    ours = np.array(
        interp.nearest_flat(
            jnp.asarray(img.reshape(1, -1)), jnp.asarray(x), jnp.asarray(y), w, h
        )
    )[0]

    # reference mask lookup: round() + WITHIN_BOUNDS zero padding
    # (photometric_factor_kernels.cpp:159-166)
    xr, yr = np.round(x).astype(int), np.round(y).astype(int)
    inb = (xr >= 0) & (xr < w) & (yr >= 0) & (yr < h)
    ref = np.where(inb, img[0, np.clip(yr, 0, h - 1), np.clip(xr, 0, w - 1)], 0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_level_coords_convention():
    cam0 = PinholeCamera(fx=100.0, fy=90.0, cx=80.0, cy=60.0, width=160, height=128)
    pyr = CameraPyramid.build(cam0, 4)
    # (px + 0.5) * ratio - 0.5 with ratio = fx_l / fx_0
    x = np.array([0.0, 10.0, 159.0], np.float32)
    for lvl in range(4):
        ratio = pyr[lvl].fx / pyr[0].fx
        lx, _ = interp.level_coords(
            jnp.asarray(x), jnp.asarray(x), ratio, ratio
        )
        np.testing.assert_allclose(
            np.array(lx), (x + 0.5) * ratio - 0.5, atol=1e-6
        )


def test_camera_pyramid_halving():
    cam0 = PinholeCamera(fx=100.0, fy=90.0, cx=80.0, cy=60.0, width=160, height=128)
    pyr = CameraPyramid.build(cam0, 4)
    assert [c.width for c in pyr.cameras] == [160, 80, 40, 20]
    assert [c.height for c in pyr.cameras] == [128, 64, 32, 16]
    assert pyr.level_offsets == (0, 160 * 128, 160 * 128 + 80 * 64, 160 * 128 + 80 * 64 + 40 * 32)
    # intrinsics rescale by realized ratio (pinhole_camera_impl.h:122-132)
    assert abs(pyr[1].fx - 50.0) < 1e-6
    assert abs(pyr[1].cy - 30.0) < 1e-6


def test_locations_1d_to_homo():
    cam = PinholeCamera(fx=100.0, fy=90.0, cx=80.0, cy=60.0, width=160, height=128)
    loc1d = jnp.array([0, 161, 160 * 128 - 1])
    homo = np.array(interp.locations_1d_to_homo(loc1d, cam))
    np.testing.assert_allclose(homo[0], [(0 - 80) / 100, (0 - 60) / 90, 1.0], atol=1e-6)
    np.testing.assert_allclose(homo[1], [(1 - 80) / 100, (1 - 60) / 90, 1.0], atol=1e-6)
    np.testing.assert_allclose(
        homo[2], [(159 - 80) / 100, (127 - 60) / 90, 1.0], atol=1e-5
    )
