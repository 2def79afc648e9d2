"""Feature / mask pyramids and spatial gradients.

Reproduces the reference's preprocessing exactly:

* masked Gaussian pyramid: 3x3 binomial kernel [[1,2,1],[2,4,2],[1,2,1]]/16,
  stride 2, padding 1, normalized by the smoothed mask + 1e-8
  (mapper.cpp:30-38, GenerateGaussianPyramidWithGrad mapper.cpp:1385-1426),
* mask pyramid: nearest-neighbor downsample by 2 per level, matching
  torch::kNearest interpolate (src index = floor(dst * 2))
  (mapping_utils.cpp:321-342),
* spatial gradient: replicate-pad central differences * 0.5
  (ComputeSpatialGrad, mapping_utils.h:236-252).

Outputs use the concatenated flat layout ``[C, N0+N1+...]`` /
``[2, C, N0+N1+...]`` that every factor kernel gathers from.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAUSS_KERNEL = (
    np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 16.0
)


def spatial_grad(feat: jax.Array) -> jax.Array:
    """[C, H, W] -> [2, C, H, W]; grad_x then grad_y; replicate border
    (mapping_utils.h:236-252)."""
    padded = jnp.pad(feat, ((0, 0), (1, 1), (1, 1)), mode="edge")
    h, w = feat.shape[-2], feat.shape[-1]
    gx = 0.5 * (padded[:, 1 : h + 1, 2 : w + 2] - padded[:, 1 : h + 1, 0:w])
    gy = 0.5 * (padded[:, 2 : h + 2, 1 : w + 1] - padded[:, 0:h, 1 : w + 1])
    return jnp.stack([gx, gy], axis=0)


def _gauss_down(img: jax.Array) -> jax.Array:
    """Stride-2 3x3 Gaussian conv with padding 1 on [C, H, W]."""
    k = jnp.asarray(GAUSS_KERNEL, dtype=img.dtype)[None, None]
    out = jax.lax.conv_general_dilated(
        img[:, None],  # [C, 1, H, W] — depthwise via feature dim 1
        k,
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


def mask_pyramid(mask: jax.Array, num_levels: int) -> Tuple[jax.Array, ...]:
    """Nearest-neighbor 2x downsampled masks [H, W] per level
    (mapping_utils.cpp:334-340). torch kNearest picks src = floor(dst * 2),
    i.e. even rows/cols."""
    out = [mask]
    cur = mask
    for _ in range(num_levels - 1):
        cur = cur[::2, ::2]
        out.append(cur)
    return tuple(out)


def gaussian_pyramid_with_grad(
    feat: jax.Array,  # [C, H, W]
    masks: Tuple[jax.Array, ...],  # per-level [H_l, W_l] valid masks
    num_levels: int,
) -> Tuple[jax.Array, jax.Array]:
    """Masked Gaussian pyramid + gradients in flat concatenated layout.

    Returns (feat_pyr [C, sum(N_l)], grad_pyr [2, C, sum(N_l)])
    (mapper.cpp:1385-1426). Level l+1 = gauss(level_l * mask_l) /
    (gauss(mask_l) + 1e-8); gradients are per-level spatial grads.
    """
    c = feat.shape[0]
    feats = []
    grads = []
    cur = feat
    for lvl in range(num_levels):
        if lvl > 0:
            m = masks[lvl - 1].astype(cur.dtype)[None]
            num = _gauss_down(cur * m)
            den = _gauss_down(m)
            cur = num / (den + 1.0e-8)
        g = spatial_grad(cur)
        feats.append(cur.reshape(c, -1))
        grads.append(g.reshape(2, c, -1))
    return jnp.concatenate(feats, axis=-1), jnp.concatenate(grads, axis=-1)
