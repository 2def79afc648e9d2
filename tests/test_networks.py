"""Partial-conv U-Net parity vs torch transcription + shape checks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sage_slam_tpu.models import depth_network, feature_network
from sage_slam_tpu.models import partial_unet as pu


def torch_partial_conv(x, mask, w, b):
    """Transcription of PartialConv2d.forward (partial_modules.py:18-39)."""
    ones = torch.ones(1, 1, 3, 3)
    update = F.conv2d(mask, ones, padding=1) / 9.0
    binary = (update >= 0.01).float()
    raw = F.conv2d(x * mask, w, b, padding=1)
    bias = b.reshape(1, -1, 1, 1)
    out = (raw - bias) / (update + 1e-8) + bias
    return out * binary, binary


def test_partial_conv_matches_torch():
    rng = np.random.default_rng(0)
    c_in, c_out, h, w = 3, 8, 16, 20
    x = rng.standard_normal((c_in, h, w)).astype(np.float32)
    mask = (rng.uniform(size=(1, h, w)) > 0.3).astype(np.float32)
    wgt = (rng.standard_normal((c_out, c_in, 3, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(c_out).astype(np.float32)

    ours, our_mask = pu.partial_conv(
        {"weight": jnp.asarray(wgt), "bias": jnp.asarray(b)},
        jnp.asarray(x),
        jnp.asarray(mask),
    )
    ref, ref_mask = torch_partial_conv(
        torch.from_numpy(x)[None], torch.from_numpy(mask)[None],
        torch.from_numpy(wgt), torch.from_numpy(b),
    )
    np.testing.assert_allclose(np.array(our_mask), ref_mask.numpy()[0], atol=0)
    np.testing.assert_allclose(np.array(ours), ref.numpy()[0], atol=2e-4)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(1)
    c, h, w = 16, 8, 10
    x = rng.standard_normal((c, h, w)).astype(np.float32)
    wgt = rng.standard_normal(c).astype(np.float32)
    b = rng.standard_normal(c).astype(np.float32)
    groups = 4
    ours = pu.group_norm(
        {"weight": jnp.asarray(wgt), "bias": jnp.asarray(b)},
        jnp.asarray(x), groups,
    )
    ref = F.group_norm(
        torch.from_numpy(x)[None], groups, torch.from_numpy(wgt),
        torch.from_numpy(b),
    )[0]
    np.testing.assert_allclose(np.array(ours), ref.numpy(), atol=1e-5)


def test_maxpool_upsample_match_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 8, 12)).astype(np.float32)
    ours = np.array(pu.max_pool2(jnp.asarray(x)))
    ref = F.max_pool2d(torch.from_numpy(x)[None], 2, 2)[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=0)

    ours_up = np.array(pu.upsample_nearest2(jnp.asarray(x)))
    ref_up = F.interpolate(torch.from_numpy(x)[None], scale_factor=2, mode="nearest")[0].numpy()
    np.testing.assert_allclose(ours_up, ref_up, atol=0)


def test_depth_network_shapes():
    cfg = depth_network.DepthNetConfig()
    params = depth_network.init_params(jax.random.key(0), cfg)
    h, w = 128, 160
    img = jnp.zeros((3, h, w)).at[0].set(0.5)
    mask = jnp.ones((1, h, w))
    bias, basis = depth_network.apply(params, img, mask, cfg)
    assert bias.shape == (1, 64, 80)
    assert basis.shape == (16, 64, 80)
    bias_flat, jac = depth_network.bias_and_jacobian(params, img, mask, cfg)
    assert bias_flat.shape == (64 * 80,)
    assert jac.shape == (64 * 80, 16)
    assert np.all(np.isfinite(np.array(jac)))


def test_feature_network_shapes_and_range():
    cfg = feature_network.FeatureNetConfig()
    params = feature_network.init_params(jax.random.key(1), cfg)
    h, w = 128, 160
    img = jnp.ones((3, h, w)) * 0.3
    mask = jnp.ones((1, h, w))
    fmap, fdesc = feature_network.apply(params, img, mask, cfg)
    assert fmap.shape == (16, 64, 80)
    assert fdesc.shape == (16, 64, 80)
    # tanh outputs in [-1, 1]
    assert float(jnp.abs(fmap).max()) <= 1.0
    assert float(jnp.abs(fdesc).max()) <= 1.0


def test_masked_region_zeroed():
    """Fully-masked-out regions must produce zero outputs at conv level."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 16, 16)).astype(np.float32)
    mask = np.ones((1, 16, 16), np.float32)
    mask[:, :, :8] = 0.0
    wgt = (rng.standard_normal((4, 3, 3, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    out, m = pu.partial_conv(
        {"weight": jnp.asarray(wgt), "bias": jnp.asarray(b)},
        jnp.asarray(x), jnp.asarray(mask),
    )
    # interior of the masked half (away from the boundary) is zero
    assert np.abs(np.array(out)[:, :, :6]).max() == 0.0
    assert np.array(m)[0, :, :6].max() == 0.0
