"""FeatureMatchingGeo — descriptor matching + robust 3D registration.

The tracker/loop-detector's match pipeline (camera_tracker.cpp:575-947):
seeded random keypoints of the reference keyframe, cycle-consistent NN
descriptor matching, then GNC registration of the matched 3D point pairs
(TEASER-equivalent, sim(3) when a scale estimate is requested). Produces
the matched point sets for the tracker's reprojection / match-geometry
terms, the initial (R, t, scale) guess, and the inlier ratios used by
keyframe / loop decisions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import interp
from . import matcher, robust


class MatchGeoResult(NamedTuple):
    matches: matcher.Matches
    inliers: jax.Array  # [K] 0/1 registration survivors
    homo0: jax.Array  # [K, 3]
    homo1: jax.Array  # [K, 3]
    dpts0: jax.Array  # [K] (reference-frame depths used)
    dpts1: jax.Array  # [K]
    matched_2d_1: jax.Array  # [K, 2]
    guess_rot: jax.Array  # [3, 3]
    guess_trans: jax.Array  # [3]
    guess_scale: jax.Array  # scalar
    relative_desc_inlier_ratio: jax.Array  # inliers / cyc-consistent count
    desc_inlier_ratio: jax.Array  # inliers / K


def feature_matching_geo(
    key: jax.Array,
    desc0_flat: jax.Array,  # [HW, C] reference keyframe descriptors
    desc1_flat: jax.Array,  # [HW, C] frame-to-track descriptors
    valid_loc1d: jax.Array,  # [V] valid pixel ids (static mask)
    dpts0_flat: jax.Array,  # [HW] reference depths (scaled)
    dpts1_flat: jax.Array,  # [HW] frame depths (scaled)
    cam,
    num_keypoints: int,
    cyc_consis_thresh: float,
    noise_bound_multiplier: float,
    estimate_scale: bool = False,
    dpt_scale_1: jax.Array | float = 1.0,
) -> MatchGeoResult:
    """Fully jittable. Degenerate cases surface as zero inlier ratios."""
    kps = matcher.select_keypoints(key, valid_loc1d, num_keypoints)
    m = matcher.cycle_consistent_matches(
        kps, desc0_flat, desc1_flat, cam.width, cyc_consis_thresh
    )
    homo0, homo1 = matcher.matches_to_points(m, cam)
    d0 = jnp.take(dpts0_flat, m.loc1d_0)
    d1 = jnp.take(dpts1_flat, m.loc1d_1)

    # registration in the frame-to-track's depth units: the reference
    # divides kf depths by the current frame scale (camera_tracker.cpp:721)
    src = (d0 / dpt_scale_1)[:, None] * homo0
    dst = d1[:, None] * homo1
    focal = (cam.fx + cam.fy) / 2.0
    bounds = jnp.maximum(noise_bound_multiplier * d1 / focal, 5.0e-4)
    reg = robust.gnc_tls_registration(
        src, dst, bounds, m.valid, estimate_scale=estimate_scale
    )

    cyc_count = jnp.maximum(jnp.sum(m.valid), 1.0)
    n_inl = jnp.sum(reg.inliers)
    x1, y1 = interp.locations_1d_to_2d(m.loc1d_1, cam.width)
    return MatchGeoResult(
        matches=m,
        inliers=reg.inliers,
        homo0=homo0,
        homo1=homo1,
        dpts0=d0,
        dpts1=d1,
        matched_2d_1=jnp.stack([x1, y1], axis=-1),
        guess_rot=reg.rot,
        guess_trans=reg.trans,
        guess_scale=reg.scale,
        relative_desc_inlier_ratio=n_inl / cyc_count,
        desc_inlier_ratio=n_inl / num_keypoints,
    )
