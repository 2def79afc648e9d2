"""Partial-convolution U-Net primitives — JAX re-implementation.

Faithful to the reference training code (representation/models/
partial_modules.py): mask-aware convolutions renormalize by the local
mask coverage and propagate a binarized mask:

  update = conv(mask, ones3x3)/9;  binary = update >= 0.01
  out = ((conv(x*mask, W) + b - b) / (update + 1e-8) + b) * binary

Blocks: PartialDownConv (conv-GN-relu, conv-relu, maxpool2),
PartialUpConv (nearest-up2, concat[dec, enc], conv-GN-relu, conv-relu),
PartialBlock (conv-GN-relu, conv-activation), PartialDownConvNoPre.

Parameters are nested dicts keyed like the torch modules so a torch
state_dict converts mechanically (load_torch_state_dict below). All
functions operate on single images [C, H, W] + mask [1, H, W]; vmap for
batches. GroupNorm groups = out_channels // group_size (=4), eps 1e-5.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def conv3x3(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """x [C, H, W], w [O, I, 3, 3] -> [O, H', W'] (padding 1)."""
    out = jax.lax.conv_general_dilated(
        x[None],
        w,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]


def partial_conv(params, x: jax.Array, mask: jax.Array):
    """PartialConv2d forward (partial_modules.py:18-39)."""
    ones = jnp.ones((1, 1, 3, 3), x.dtype)
    update = conv3x3(mask, ones) / 9.0
    binary = (update >= 0.01).astype(x.dtype)
    raw = conv3x3(x * mask, params["weight"])
    b = params["bias"][:, None, None]
    out = ((raw) / (update + 1.0e-8) + b) * binary
    return out, binary


def group_norm(params, x: jax.Array, num_groups: int, eps: float = 1e-5):
    """GroupNorm over [C, H, W] with per-channel affine."""
    c, h, w = x.shape
    g = x.reshape(num_groups, c // num_groups, h, w)
    mean = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    out = g.reshape(c, h, w)
    return out * params["weight"][:, None, None] + params["bias"][:, None, None]


def max_pool2(x: jax.Array, factor: int = 2) -> jax.Array:
    """MaxPool kernel=stride=factor on [C, H, W].

    Implemented by reshape + max rather than lax.reduce_window: the
    windowed-max VJP lowers to SelectAndScatter, which TPU XLA rejects
    for rank-3 operands with a single inactive dim; the reshape form
    differentiates through plain masked reductions and fuses better."""
    c, h, w = x.shape
    hf, wf = h // factor, w // factor
    x = x[:, : hf * factor, : wf * factor]
    x = x.reshape(c, hf, factor, wf, factor)
    return jnp.max(x, axis=(2, 4))


def upsample_nearest2(x: jax.Array) -> jax.Array:
    c, h, w = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _activation(x, name: str, eps: float = 1e-8):
    name = name.lower()
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "linear":
        return x
    if name == "abs":
        return jnp.abs(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "normalize":
        return (x + eps) / jnp.linalg.norm(x + eps, axis=0, keepdims=True)
    raise ValueError(f"unknown activation {name}")


def down_conv(params, x, mask, group_size=4, pooling=True, pool_factor=2):
    """PartialDownConv (partial_modules.py:95-134):
    returns (pooled_x, pre_pool_x, pooled_mask)."""
    out_c = params["conv1"]["weight"].shape[0]
    x, mask = partial_conv(params["conv1"], x, mask)
    x = jax.nn.relu(group_norm(params["bn"], x, max(1, out_c // group_size)))
    x, mask = partial_conv(params["conv2"], x, mask)
    x = jax.nn.relu(x)
    pre_pool = x
    if pooling:
        mask = max_pool2(mask, pool_factor)
        x = max_pool2(x, pool_factor)
    return x, pre_pool, mask


def block(params, x, mask, out_activation, group_size=4):
    """PartialBlock (partial_modules.py:137-178)."""
    out_c = params["conv1"]["weight"].shape[0]
    x, mask = partial_conv(params["conv1"], x, mask)
    x = jax.nn.relu(group_norm(params["bn"], x, max(1, out_c // group_size)))
    x, mask = partial_conv(params["conv2"], x, mask)
    x = _activation(x, out_activation)
    return x, mask


def up_conv(params, enc_out, dec_out, mask, group_size=4):
    """PartialUpConv (partial_modules.py:181-217): concat order [dec, enc]."""
    out_c = params["conv1"]["weight"].shape[0]
    dec_up = upsample_nearest2(dec_out)
    # odd encoder dims: pooling floors (e.g. 4x5 -> 2x2), so the 2x
    # upsample can undershoot by one row/col — edge-pad to the encoder's
    # size (standard U-Net odd-dimension handling; the reference always
    # runs at 128x160 where every level is even)
    eh, ew = enc_out.shape[1:]
    dh, dw = dec_up.shape[1:]
    if (dh, dw) != (eh, ew):
        dec_up = jnp.pad(
            dec_up, ((0, 0), (0, eh - dh), (0, ew - dw)), mode="edge"
        )
    x = jnp.concatenate([dec_up, enc_out], axis=0)
    x, mask = partial_conv(params["conv1"], x, mask)
    x = jax.nn.relu(group_norm(params["bn"], x, max(1, out_c // group_size)))
    x, mask = partial_conv(params["conv2"], x, mask)
    x = jax.nn.relu(x)
    return x, mask


# ---------------------------------------------------------------------------
# parameter construction


def _init_conv(key, in_c, out_c, dtype=jnp.float32):
    """Kaiming-uniform like torch's Conv2d default."""
    k1, k2 = jax.random.split(key)
    fan_in = in_c * 9
    bound = math.sqrt(1.0 / fan_in)
    gain = math.sqrt(2.0)  # kaiming for relu-ish nets
    w = jax.random.uniform(
        k1, (out_c, in_c, 3, 3), dtype, -gain * bound, gain * bound
    )
    b = jax.random.uniform(k2, (out_c,), dtype, -bound, bound)
    return {"weight": w, "bias": b}


def _init_gn(out_c, dtype=jnp.float32):
    return {
        "weight": jnp.ones((out_c,), dtype),
        "bias": jnp.zeros((out_c,), dtype),
    }


def init_two_conv_block(key, in_c, out_c):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _init_conv(k1, in_c, out_c),
        "bn": _init_gn(out_c),
        "conv2": _init_conv(k2, out_c, out_c),
    }


def load_torch_state_dict(params, state_dict, prefix=""):
    """Copy a torch state_dict (name -> np array) into a params pytree with
    the same nesting (keys joined by '.')."""

    def visit(node, path):
        if isinstance(node, dict) and "weight" in node and not isinstance(
            node["weight"], dict
        ):
            out = dict(node)
            for leaf in ("weight", "bias"):
                key = f"{path}.{leaf}" if path else leaf
                if key in state_dict:
                    arr = np.asarray(state_dict[key])
                    out[leaf] = jnp.asarray(arr, node[leaf].dtype)
            return out
        if isinstance(node, dict):
            return {
                k: visit(v, f"{path}.{k}" if path else k)
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return [visit(v, f"{path}.{i}") for i, v in enumerate(node)]
        return node

    return visit(params, prefix)
