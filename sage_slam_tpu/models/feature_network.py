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
    # "unet" = learned partial-conv U-Net (the reference architecture);
    # "handcrafted" = fixed translation-equivariant filter bank (no
    # learned params — see handcrafted_apply). The handcrafted mode is
    # the content-driven fallback/diagnostic path: an UNDER-trained
    # U-Net's features carry a strong absolute-position component (the
    # zero-padding at every conv acts as a positional encoding), which
    # biases photometric tracking toward zero motion; the fixed bank is
    # exactly shift-equivariant, so it isolates tracker/BA accuracy
    # from feature-learning quality (eval/error_budget.py).
    mode: str = "unet"


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
    if cfg.mode == "handcrafted":
        c = cfg.map_inner[-1]
        fmap = handcrafted_apply(image, mask, c, cfg.num_pre_steps)
        return fmap, fmap
    if cfg.mode == "image":
        c = cfg.map_inner[-1]
        fmap = image_apply(image, mask, c, cfg.num_pre_steps)
        return fmap, fmap
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


def _blur3(x: jax.Array) -> jax.Array:
    """Separable [1,2,1]/4 blur per channel with edge-replicate padding
    (padding mode matters: zero padding would re-introduce the absolute
    -position response the handcrafted bank exists to avoid)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="edge")
    x = 0.25 * xp[:, :-2] + 0.5 * xp[:, 1:-1] + 0.25 * xp[:, 2:]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)), mode="edge")
    return 0.25 * xp[:, :, :-2] + 0.5 * xp[:, :, 1:-1] + 0.25 * xp[:, :, 2:]


def image_apply(
    image: jax.Array,  # [3, H, W]
    mask: jax.Array,  # [1, H, W]
    num_channels: int,
    num_pre_steps: int = 1,
) -> jax.Array:
    """Raw-intensity feature mode: pooled RGB, zero-centered — the
    least-biased photometric signal available.

    ANY spatial filter bank (learned conv net or handcrafted band-pass)
    commutes with the inter-view warp only approximately — the
    filter-warp commutator grows with kernel support and parallax, and
    its systematic part shifts the photometric optimum away from the
    true geometry (measured at ~7% trajectory distortion for the 8-px
    handcrafted blurs on the Bowl3D oracle stages vs ~0 for raw pixels
    via a GT-warp alpha scan). The reference avoids this by TRAINING
    its features through the differentiable BA (diff_ba.py role) to be
    warp-consistent; this mode is the unbiased baseline those stages
    (and the error-budget oracle rows) compare against. Channels beyond
    RGB repeat with a 1-px blur (near-zero commutator)."""
    x = image * mask
    for _ in range(num_pre_steps):
        x = 0.25 * (
            x[:, 0::2, 0::2] + x[:, 1::2, 0::2]
            + x[:, 0::2, 1::2] + x[:, 1::2, 1::2]
        )
    feats = 2.0 * x - 1.0
    while feats.shape[0] < num_channels:
        feats = jnp.concatenate([feats, _blur3(feats)], axis=0)
    out_mask = mask[:, ::2**num_pre_steps, ::2**num_pre_steps]
    return feats[:num_channels] * out_mask


def handcrafted_apply(
    image: jax.Array,  # [3, H, W]
    mask: jax.Array,  # [1, H, W]
    num_channels: int,
    num_pre_steps: int = 1,
) -> jax.Array:
    """Fixed translation-equivariant feature bank -> [C, h, w] with
    (h, w) = (H, W) / 2^num_pre_steps (the U-Net's output geometry).

    Channel bank (tanh-bounded, zero-DC where it matters for
    photometric alignment): opponent colors, two band-pass scales of
    luminance, and x/y gradients at two scales. Channels repeat with
    growing blur if num_channels exceeds the bank. Purely functional —
    no parameters — so frame features of a shifted image are the
    shifted features (up to resampling), unlike an under-trained
    padded conv net. Serves as the classical-SLAM fallback feature
    mode and the error-budget diagnostic (FeatureNetConfig.mode)."""
    x = image * mask
    for _ in range(num_pre_steps):
        x = 0.25 * (
            x[:, 0::2, 0::2] + x[:, 1::2, 0::2]
            + x[:, 0::2, 1::2] + x[:, 1::2, 1::2]
        )
    lum = jnp.mean(x, axis=0, keepdims=True)
    rg = (x[0:1] - x[1:2]) if x.shape[0] >= 2 else lum
    by = (x[2:3] - lum) if x.shape[0] >= 3 else lum

    def blur_n(t, n):
        for _ in range(n):
            t = _blur3(t)
        return t

    # SMOOTH channels on purpose: Gauss-Newton photometric alignment
    # needs a convergence basin wider than the expected per-frame pixel
    # motion, so every channel is a difference/gradient of blurred maps
    # (basin ~ blur radius), never a raw fine band-pass
    b1, b2, b4, b8 = (blur_n(lum, n) for n in (1, 2, 4, 8))
    rg2, rg8 = blur_n(rg, 2), blur_n(rg, 8)
    by2, by8 = blur_n(by, 2), blur_n(by, 8)

    def grad_xy(t):
        gx = jnp.pad(t, ((0, 0), (0, 0), (1, 1)), mode="edge")
        gy = jnp.pad(t, ((0, 0), (1, 1), (0, 0)), mode="edge")
        return (
            0.5 * (gx[:, :, 2:] - gx[:, :, :-2]),
            0.5 * (gy[:, 2:] - gy[:, :-2]),
        )

    g2x, g2y = grad_xy(b2)
    g8x, g8y = grad_xy(b8)
    bank = [b1 - b4, b2 - b8, rg2 - rg8, by2 - by8, g2x, g2y, g8x, g8y]

    feats = jnp.concatenate(bank, axis=0)
    while feats.shape[0] < num_channels:
        feats = jnp.concatenate([feats, _blur3(feats)], axis=0)
    out_mask = mask[:, ::2**num_pre_steps, ::2**num_pre_steps]
    return jnp.tanh(4.0 * feats[:num_channels]) * out_mask
