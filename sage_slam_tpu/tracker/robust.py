"""Robust 3D-3D registration (TEASER++ replacement) — GNC-TLS on device.

The reference filters descriptor matches with TEASER++'s translation
inliers (reprojection_factor.cpp:130-180, camera_tracker.cpp:688-717),
configured with `gnc_tls` rotation estimation (slam_run.flags:80). TEASER
is CPU/combinatorial (max-clique); the TPU-native equivalent here is
GNC-TLS over Horn's closed-form weighted alignment (Yang & Carlone 2020):

  repeat: (R, t) = weighted SVD alignment; r_i = ||dst_i - R src_i - t||;
          TLS weights w_i = clip(mu(mu+1)c_i^2 / r_i^2 - mu, 0, 1);
          mu <- mu * gnc_factor.

Fully jittable (static iteration count, SVD of a 3x3), batched-friendly.
Per-point noise bounds c_i mirror the reference's
`noise_bound_multiplier * dpt_bias_1 / focal` clamped to 5e-4
(reprojection_factor.cpp:148-156).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RegistrationResult(NamedTuple):
    rot: jax.Array  # [3, 3]
    trans: jax.Array  # [3]
    scale: jax.Array  # scalar (1.0 unless estimate_scale)
    inliers: jax.Array  # [M] 0/1 residual <= noise bound
    weights: jax.Array  # [M] final GNC weights


def _weighted_horn(src, dst, w, estimate_scale: bool = False):
    """Closed-form weighted alignment dst ~ s R src + t (Umeyama)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    mu_s = jnp.sum(w[:, None] * src, axis=0) / wsum
    mu_d = jnp.sum(w[:, None] * dst, axis=0) / wsum
    s = src - mu_s
    d = dst - mu_d
    cov = (w[:, None] * d).T @ s  # [3, 3]
    u, sv, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.diag(jnp.array([1.0, 1.0, 1.0], cov.dtype)).at[2, 2].set(det)
    rot = u @ fix @ vt
    if estimate_scale:
        # Umeyama: scale = trace(D * sign-fix) / weighted src variance
        scale = jnp.sum(sv * jnp.diagonal(fix)) / jnp.maximum(
            jnp.sum(w[:, None] * s**2), 1e-12
        )
    else:
        scale = jnp.asarray(1.0, src.dtype)
    trans = mu_d - scale * (rot @ mu_s)
    return rot, trans, scale


def gnc_tls_registration(
    src: jax.Array,  # [M, 3]
    dst: jax.Array,  # [M, 3]
    noise_bounds: jax.Array,  # [M]
    valid: jax.Array,  # [M] 0/1
    num_iters: int = 20,
    gnc_factor: float = 1.4,
    estimate_scale: bool = False,
) -> RegistrationResult:
    dtype = src.dtype
    c2 = jnp.maximum(noise_bounds, 5.0e-4) ** 2

    def residual_sq(rot, trans, scale):
        pred = scale * (src @ rot.T) + trans
        return jnp.sum((dst - pred) ** 2, axis=-1)

    # initial fit on all valid points
    rot, trans, scl = _weighted_horn(src, dst, valid, estimate_scale)
    r2 = residual_sq(rot, trans, scl)
    # GNC-TLS mu init: mu small => nearly-convex surrogate (Yang et al. 2020)
    max_r2 = jnp.max(jnp.where(valid > 0, r2, 0.0))
    cbar2 = jnp.mean(c2)
    mu = jnp.maximum(cbar2 / jnp.maximum(2.0 * max_r2 - cbar2, 1e-9), 1e-6)

    def tls_weights(r2, mu):
        """Three-case GNC-TLS weight update."""
        rhat = jnp.sqrt(jnp.maximum(r2, 1e-18))
        mid = jnp.sqrt(c2) * jnp.sqrt(mu * (mu + 1.0)) / rhat - mu
        upper = (mu + 1.0) / mu * c2  # w = 0 beyond
        lower = mu / (mu + 1.0) * c2  # w = 1 below
        w = jnp.where(
            r2 >= upper,
            0.0,
            jnp.where(r2 <= lower, 1.0, jnp.clip(mid, 0.0, 1.0)),
        )
        return w

    def body(carry, _):
        rot, trans, scl, mu, _ = carry
        r2 = residual_sq(rot, trans, scl)
        w = tls_weights(r2, mu) * valid
        rot, trans, scl = _weighted_horn(src, dst, w, estimate_scale)
        return (rot, trans, scl, mu * gnc_factor, w), None

    (rot, trans, scl, _, w), _ = jax.lax.scan(
        body,
        (rot, trans, scl, mu, valid.astype(dtype)),
        None,
        length=num_iters,
    )
    r2 = residual_sq(rot, trans, scl)
    inliers = ((r2 <= c2) & (valid > 0)).astype(dtype)
    return RegistrationResult(rot, trans, scl, inliers, w)


def translation_inlier_filter(
    src: jax.Array,
    dst: jax.Array,
    depth_bias_dst: jax.Array,  # [M] unscaled depth bias at dst matches
    focal: float,
    valid: jax.Array,
    noise_bound_multiplier: float = 2.0,
    num_iters: int = 20,
) -> jax.Array:
    """The reference's TEASER usage: per-point noise bounds from the dst
    depth bias over focal length; returns the inlier mask [M]."""
    bounds = jnp.maximum(
        noise_bound_multiplier * depth_bias_dst / focal, 5.0e-4
    )
    res = gnc_tls_registration(src, dst, bounds, valid, num_iters)
    return res.inliers
