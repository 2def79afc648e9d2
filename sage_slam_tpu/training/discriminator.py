"""Adversarial depth-prior discriminator (models/discriminator.py).

Conv net over (image, depth) pairs: DownBlock(conv-GN-relu, conv-relu,
maxpool2) + Block pairs, a 1x1 conv, and a linear validity head; trained
with the LSGAN objective (training.py:702-720).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..models import partial_unet as pu


class DiscConfig(NamedTuple):
    in_channels: int = 4  # rgb + depth
    filter_base: int = 12
    num_blocks: int = 4
    group_size: int = 4
    img_height: int = 64
    img_width: int = 80


def init_params(key, cfg: DiscConfig = DiscConfig()):
    keys = iter(jax.random.split(key, 32))
    params = {"blocks": []}
    chans = [(cfg.in_channels, cfg.filter_base), (cfg.filter_base, cfg.filter_base)]
    for i in range(cfg.num_blocks - 1):
        c = cfg.filter_base * 2**i
        chans += [(c, c * 2), (c * 2, c * 2)]
    for cin, cout in chans:
        params["blocks"].append(pu.init_two_conv_block(next(keys), cin, cout))
    c_last = cfg.filter_base * 2 ** (cfg.num_blocks - 1)
    k1, k2 = jax.random.split(next(keys))
    params["final_conv"] = {
        "weight": jax.random.normal(k1, (1, c_last, 1, 1)) * 0.05,
        "bias": jnp.zeros((1,)),
    }
    h = cfg.img_height // 2**cfg.num_blocks
    w = cfg.img_width // 2**cfg.num_blocks
    params["adv"] = {
        "weight": jax.random.normal(k2, (h * w, 1)) * 0.05,
        "bias": jnp.zeros((1,)),
    }
    return params


def _plain_conv(p, x):
    out = jax.lax.conv_general_dilated(
        x[None], p["weight"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out + p["bias"][:, None, None]


def apply(params, x, cfg: DiscConfig = DiscConfig()):
    """x [C, H, W] -> validity scalar."""
    for i, p in enumerate(params["blocks"]):
        out_c = p["conv1"]["weight"].shape[0]
        g = max(1, out_c // cfg.group_size)
        x = jax.nn.relu(pu.group_norm(p["bn"], _plain_conv(p["conv1"], x), g))
        x = jax.nn.relu(_plain_conv(p["conv2"], x))
        if i % 2 == 0:  # DownBlocks are the even entries
            x = pu.max_pool2(x)
    fc = params["final_conv"]
    x = jax.lax.conv_general_dilated(
        x[None], fc["weight"], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0] + fc["bias"][:, None, None]
    flat = x.reshape(-1)
    return flat @ params["adv"]["weight"][:, 0] + params["adv"]["bias"][0]


def lsgan_d_loss(d_real, d_fake):
    """Discriminator LSGAN objective (training.py:702-720)."""
    return 0.5 * (jnp.mean((d_real - 1.0) ** 2) + jnp.mean(d_fake**2))


def lsgan_g_loss(d_fake):
    return jnp.mean((d_fake - 1.0) ** 2)
