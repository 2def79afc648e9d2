"""FeatureNet — partial-conv U-Net producing photometric features and
matching descriptors (representation/models/feature_network.py).

Same trunk as DepthNet; two heads: feat_map [16] (tanh) for the
photometric factor, feat_desc [16] (tanh) for matching
(feature_network.cpp:24-37)."""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import partial_unet as pu
from .depth_network import _unet_trunk


class FeatureNetConfig(NamedTuple):
    in_channels: int = 3
    num_pre_steps: int = 1
    filter_list: Sequence[int] = (8, 16, 32, 64, 128)
    bottleneck: int = 128
    desc_inner: Sequence[int] = (64, 64, 16)
    map_inner: Sequence[int] = (64, 64, 16)
    desc_out_activation: str = "tanh"
    map_out_activation: str = "tanh"
    group_size: int = 4


def init_params(key, cfg: FeatureNetConfig = FeatureNetConfig()):
    from .depth_network import DepthNetConfig, init_params as depth_init

    pre_filters = list(cfg.filter_list[: cfg.num_pre_steps])
    inner_filters = list(cfg.filter_list[cfg.num_pre_steps :])
    enc_pre = [cfg.in_channels] + pre_filters
    enc = [enc_pre[-1]] + inner_filters
    dec = [cfg.bottleneck] + list(reversed(inner_filters))

    keys = iter(jax.random.split(key, 64))
    params = {
        "pre_down_convs": [
            pu.init_two_conv_block(next(keys), enc_pre[i], enc_pre[i + 1])
            for i in range(len(enc_pre) - 1)
        ],
        "down_convs": [
            pu.init_two_conv_block(next(keys), enc[i], enc[i + 1])
            for i in range(len(enc) - 1)
        ],
        "bottle_neck": pu.init_two_conv_block(next(keys), enc[-1], cfg.bottleneck),
        "up_convs": [
            pu.init_two_conv_block(
                next(keys), dec[i] + enc[-i - 1], dec[i + 1]
            )
            for i in range(len(dec) - 1)
        ],
        "feat_desc_convs": [],
        "feat_map_convs": [],
    }
    desc_filters = [dec[-1]] + list(cfg.desc_inner)
    for i in range(len(desc_filters) - 1):
        params["feat_desc_convs"].append(
            pu.init_two_conv_block(next(keys), desc_filters[i], desc_filters[i + 1])
        )
    map_filters = [dec[-1]] + list(cfg.map_inner)
    for i in range(len(map_filters) - 1):
        params["feat_map_convs"].append(
            pu.init_two_conv_block(next(keys), map_filters[i], map_filters[i + 1])
        )
    return params


def apply(params, image: jax.Array, mask: jax.Array, cfg: FeatureNetConfig = FeatureNetConfig()):
    """image [3, H, W], mask [1, H, W] -> (feat_map [C, h, w],
    feat_desc [C, h, w])."""
    x, mask0 = _unet_trunk(params, image, mask, cfg)

    desc, m = x, mask0
    for i, p in enumerate(params["feat_desc_convs"]):
        act = (
            cfg.desc_out_activation
            if i == len(params["feat_desc_convs"]) - 1
            else "relu"
        )
        desc, m = pu.block(p, desc, m, act, cfg.group_size)

    fmap, m = x, mask0
    for i, p in enumerate(params["feat_map_convs"]):
        act = (
            cfg.map_out_activation
            if i == len(params["feat_map_convs"]) - 1
            else "relu"
        )
        fmap, m = pu.block(p, fmap, m, act, cfg.group_size)

    return fmap, desc
