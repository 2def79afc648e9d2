import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sage_slam_tpu.ops import pyramid
from sage_slam_tpu.ops.depth import decode_depth, decode_depth_at


def torch_spatial_grad(feat):
    """Transcription of ComputeSpatialGrad (mapping_utils.h:236-252)."""
    h, w = feat.shape[2], feat.shape[3]
    p = F.pad(feat, (1, 1, 1, 1), mode="replicate")
    gx = 0.5 * (p[:, :, 1 : h + 1, 2 : w + 2] - p[:, :, 1 : h + 1, 0:w])
    gy = 0.5 * (p[:, :, 2 : h + 2, 1 : w + 1] - p[:, :, 0:h, 1 : w + 1])
    return torch.cat([gx, gy], 1)


def test_spatial_grad_matches_reference():
    rng = np.random.default_rng(0)
    c, h, w = 4, 16, 20
    feat = rng.standard_normal((c, h, w)).astype(np.float32)
    ours = np.array(pyramid.spatial_grad(jnp.asarray(feat)))  # [2, C, H, W]
    ref = torch_spatial_grad(torch.from_numpy(feat)[None]).numpy()[0]
    np.testing.assert_allclose(ours[0], ref[:c], atol=1e-6)  # gx
    np.testing.assert_allclose(ours[1], ref[c:], atol=1e-6)  # gy


def test_mask_pyramid_matches_torch_nearest():
    rng = np.random.default_rng(1)
    h, w = 64, 80
    mask = (rng.uniform(size=(h, w)) > 0.3).astype(np.float32)
    ours = pyramid.mask_pyramid(jnp.asarray(mask), 4)
    t = torch.from_numpy(mask)[None, None]
    cur = t
    for lvl in range(1, 4):
        cur = F.interpolate(
            cur, size=(h // 2**lvl, w // 2**lvl), mode="nearest"
        )
        np.testing.assert_allclose(
            np.array(ours[lvl]), cur.numpy()[0, 0], atol=0
        )


def test_gaussian_pyramid_matches_reference():
    """Full transcription check of GenerateGaussianPyramidWithGrad
    (mapper.cpp:1385-1426) against torch conv2d."""
    rng = np.random.default_rng(2)
    c, h, w = 3, 64, 80
    levels = 4
    feat = rng.standard_normal((c, h, w)).astype(np.float32)
    mask = (rng.uniform(size=(h, w)) > 0.2).astype(np.float32)

    masks = pyramid.mask_pyramid(jnp.asarray(mask), levels)
    feat_pyr, grad_pyr = pyramid.gaussian_pyramid_with_grad(
        jnp.asarray(feat), masks, levels
    )

    # torch reference
    kernel = (
        torch.tensor([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])
        / 16.0
    ).reshape(1, 1, 3, 3)
    cur = torch.from_numpy(feat).reshape(c, 1, h, w)
    tmask = torch.from_numpy(mask)[None, None]
    feats, grads = [], []
    g = torch_spatial_grad(cur.reshape(1, c, h, w))
    feats.append(cur.reshape(c, -1))
    grads.append(g.reshape(2, c, -1))
    for lvl in range(levels - 1):
        m = F.interpolate(tmask, size=(h // 2**lvl, w // 2**lvl), mode="nearest") if lvl else tmask
        raw = F.conv2d(cur * m, kernel, stride=2, padding=1)
        mden = F.conv2d(m, kernel, stride=2, padding=1)
        cur = raw / (mden + 1e-8)
        hh, ww = cur.shape[2], cur.shape[3]
        g = torch_spatial_grad(cur.reshape(1, c, hh, ww))
        feats.append(cur.reshape(c, -1))
        grads.append(g.reshape(2, c, -1))
    ref_feat = torch.cat(feats, 1).numpy()
    ref_grad = torch.cat(grads, 2).numpy()

    np.testing.assert_allclose(np.array(feat_pyr), ref_feat, atol=1e-5)
    np.testing.assert_allclose(np.array(grad_pyr), ref_grad, atol=1e-5)


def test_decode_depth():
    rng = np.random.default_rng(3)
    hw, cs = 50, 16
    bias = rng.standard_normal(hw).astype(np.float32)
    jac = rng.standard_normal((hw, cs)).astype(np.float32)
    code = rng.standard_normal(cs).astype(np.float32)
    scale = 1.7
    full = np.array(decode_depth(jnp.asarray(bias), jnp.asarray(jac), jnp.asarray(code), scale))
    np.testing.assert_allclose(full, scale * (bias + jac @ code), rtol=1e-5)
    loc = jnp.array([0, 7, 49])
    at = np.array(
        decode_depth_at(jnp.asarray(bias), jnp.asarray(jac), loc, jnp.asarray(code), scale)
    )
    np.testing.assert_allclose(at, full[[0, 7, 49]], rtol=1e-5)
