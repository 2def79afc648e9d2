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


def test_partial_conv_video_mask_wiring():
    """The input-res video mask must reach the partial convs: a bordered
    mask changes the network output near the border (mask-aware
    renormalization) but an all-ones mask is the standard-conv result —
    and the Mapper feeds its video_mask_in through build_frame
    (reference forward_train(x, mask=fine_video_mask),
    training.py:485-521)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sage_slam_tpu.models import depth_network

    cfg = depth_network.DepthNetConfig(
        filter_list=(4, 8), bottleneck=8, bias_inner=(8, 1),
        basis_inner=((8, 4),),
    )
    params = depth_network.init_params(jax.random.key(0), cfg)
    img = jnp.asarray(
        np.random.default_rng(0).random((3, 32, 40)), jnp.float32
    )
    ones = jnp.ones((1, 32, 40))
    bordered = jnp.asarray(
        np.pad(np.ones((28, 36), np.float32), 2)[None]
    )
    b_ones, _ = depth_network.apply(params, img, ones, cfg)
    b_mask, _ = depth_network.apply(params, img, bordered, cfg)
    assert np.isfinite(np.array(b_mask)).all()
    # the mask changes the output (partial conv is mask-aware) ...
    assert not np.allclose(np.array(b_ones), np.array(b_mask))

    # ... and the Mapper actually wires video_mask_in into build_frame
    from sage_slam_tpu.config import MapperConfig, SlamConfig, TrackerConfig
    from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera
    from sage_slam_tpu.mapping.mapper import Mapper
    from sage_slam_tpu.models import feature_network

    fcfg = feature_network.FeatureNetConfig(
        filter_list=(4, 8), bottleneck=8, desc_inner=(8, 8),
        map_inner=(8, 8),
    )
    fparams = feature_network.init_params(jax.random.key(1), fcfg)
    cam = PinholeCamera(fx=24.0, fy=24.0, cx=9.5, cy=7.5, width=20,
                        height=16)
    pyr = CameraPyramid.build(cam, 3)
    scfg = SlamConfig(
        net_input_size=(32, 40), net_output_size=(16, 20), code_size=4,
        feat_size=8, pyramid_levels=3, max_keyframes=4,
        tracker=TrackerConfig(desc_num_keypoints=16),
        mapper=MapperConfig(pho_num_samples=32, desc_num_keypoints=16),
    )
    out_mask = jnp.ones((16, 20))
    mk = lambda m_in: Mapper(
        scfg, pyr, out_mask, params, fparams, cfg, fcfg,
        video_mask_in=m_in,
    )
    fr_ones = mk(None).build_frame(0.0, img)
    fr_mask = mk(bordered[0]).build_frame(0.0, img)
    assert not np.allclose(
        np.array(fr_ones.bias_flat), np.array(fr_mask.bias_flat)
    )
