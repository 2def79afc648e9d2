"""Training losses (representation/losses/*.py, feature_matcher.py).

JAX re-implementations of:
* scale-invariant log depth loss (DepthLoss.py:4-22),
* basis decorrelation (masked ZNCC of basis channels, DepthLoss.py:25-53),
* normalized masked L2 flow loss (FlowLoss.py),
* descriptor response-map losses with a learnable response sigma
  (feature_matcher.py calculate_rr_loss / calculate_no_match_loss),
* triplet loss on descriptor CDF histograms (DescLoss.py).

All functions take a batch leading axis where the torch originals do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_invariant_depth_loss(gt, pred, mask, epsilon=1.0e-3):
    """[B, H, W] each. DepthLoss.py:4-22."""
    ratio = jnp.log(jnp.maximum(mask * pred, epsilon)) - jnp.log(
        jnp.maximum(mask * gt, epsilon)
    )
    wsum = jnp.sum(mask, axis=(1, 2))
    loss1 = jnp.sum(ratio**2, axis=(1, 2)) / wsum
    s2 = jnp.sum(ratio, axis=(1, 2))
    loss2 = (s2 * s2) / (wsum * wsum)
    return jnp.mean(loss1 + loss2)


def basis_decorrelation_loss(basis, mask):
    """basis [B, C, H, W], mask [B, 1, H, W]. DepthLoss.py:25-53."""
    b, c, h, w = basis.shape
    mean = jnp.mean(basis, axis=(2, 3), keepdims=True)
    centered = (basis - mean).reshape(b, c, h * w)
    m = mask.reshape(b, 1, h * w)
    cov = jnp.einsum("bcn,bdn->bcd", centered * m, centered) / jnp.sum(
        m, axis=-1
    )[..., None]
    cov = jnp.maximum(cov, 1.0e-10)
    sigma = jnp.sqrt(jnp.diagonal(cov, axis1=-2, axis2=-1))
    zncc = cov / (sigma[:, :, None] * sigma[:, None, :])
    return jnp.mean(zncc**2)


def normalized_masked_l2_flow_loss(gt_flow, pred_flow, mask, eps=1.0e-2):
    """[B, 2, H, W] flows, [B, 1, H, W] mask. FlowLoss.py."""
    b, _, h, w = gt_flow.shape
    scale = jnp.array([1.0 / w, 1.0 / h], gt_flow.dtype).reshape(1, 2, 1, 1)
    g = gt_flow * scale
    p = pred_flow * scale
    msum = jnp.sum(mask, axis=(1, 2, 3))
    mean_mag = jax.lax.stop_gradient(
        0.5
        * (
            jnp.sum(mask * g**2, axis=(1, 2, 3)) / (1.0 + msum)
            + jnp.sum(mask * p**2, axis=(1, 2, 3)) / (1.0 + msum)
        )
        + eps
    )
    loss = jnp.sum(mask * (g - p) ** 2, axis=(1, 2, 3)) / (
        mean_mag * (msum + 1.0)
    )
    return jnp.mean(loss)


def triplet_histogram_loss(src_cdf, tgt_cdf, far_cdf, margin=0.2):
    """[K, C] CDF histograms per channel. DescLoss.py."""
    pos = jnp.mean((src_cdf - tgt_cdf) ** 2, axis=0)
    neg = jnp.mean((src_cdf - far_cdf) ** 2, axis=0)
    return jnp.mean(jax.nn.relu(pos - neg + margin))


def _response_map(desc_src_at_kp, desc_tgt_flat, sigma):
    """[M, C] keypoint descs vs [HW, C] target -> softmax response [M, HW]
    (feature_matcher.py:36-50).

    Computed as a shift-invariant softmax of -sigma*d2 (identical math
    to exp(-sigma*d2)/sum): the naive form underflows to an all-zero
    row once the learnable sigma grows (the rr loss pushes it up), and
    0/0 NaNs poisoned whole training runs."""
    d2 = jnp.sum(
        (desc_src_at_kp[:, None, :] - desc_tgt_flat[None]) ** 2, axis=-1
    )
    return jax.nn.softmax(-sigma * d2, axis=-1)


def rr_loss(
    desc_src_flat,  # [HW, C]
    desc_tgt_flat,  # [HW, C]
    src_loc1d,  # [M] int
    gt_tgt_loc1d,  # [M] int
    sigma,
    loss_eps=1.0e-10,
):
    """Response-at-the-right-place loss (calculate_rr_loss)."""
    kp = jnp.take(desc_src_flat, src_loc1d, axis=0)
    resp = _response_map(kp, desc_tgt_flat, sigma)  # [M, HW]
    sampled = jnp.take_along_axis(resp, gt_tgt_loc1d[:, None], axis=-1)
    return jnp.mean(-jnp.log(loss_eps + sampled))


def no_match_loss(desc_src_flat, desc_tgt_flat, no_match_loc1d, sigma):
    """Push responses of unmatched keypoints toward uniform
    (calculate_no_match_loss)."""
    hw = desc_tgt_flat.shape[0]
    kp = jnp.take(desc_src_flat, no_match_loc1d, axis=0)
    resp = _response_map(kp, desc_tgt_flat, sigma)
    return jnp.mean(jnp.sum((1.0 / hw - resp) ** 2, axis=-1))


def soft_matching_locations(
    desc_src_flat, desc_tgt_flat, src_loc1d, sigma, width
):
    """Differentiable expected match locations [M, 2] (x, y) — the soft
    counterpart used to feed the training-time BA
    (matching_location_estimation_cycle_consis's soft part)."""
    hw = desc_tgt_flat.shape[0]
    kp = jnp.take(desc_src_flat, src_loc1d, axis=0)
    resp = _response_map(kp, desc_tgt_flat, sigma)  # [M, HW]
    xs = jnp.arange(hw, dtype=resp.dtype) % width
    ys = jnp.floor(jnp.arange(hw, dtype=resp.dtype) / width)
    ex = resp @ xs
    ey = resp @ ys
    return jnp.stack([ex, ey], axis=-1)


def descriptor_cdf_histogram(desc_at_kp, num_bins=32, lo=-1.0, hi=1.0, tau=50.0):
    """Soft per-channel CDF histogram of descriptor values [M, C] ->
    [num_bins, C] (the training.py histogram supervision input)."""
    edges = jnp.linspace(lo, hi, num_bins)
    # soft indicator desc <= edge
    ind = jax.nn.sigmoid(tau * (edges[:, None, None] - desc_at_kp[None]))
    return jnp.mean(ind, axis=1)  # [num_bins, C]
