"""Descriptor matching with cycle consistency — pure matmul/argmax.

Re-implements the match construction shared by the reprojection /
match-geometry factors and the tracker's FeatureMatchingGeo
(reprojection_factor.cpp:30-120, camera_tracker.cpp:575-947):

1. select K random valid pixels of frame 0 (seeded),
2. nearest-neighbor match descriptors into frame 1:
   response(k, p) = -||desc0_k - desc1_p||^2, argmax over p,
3. match back 1 -> 0 and keep keypoints whose cycle lands within
   `cyc_consis_thresh` pixels of where they started.

Everything is batched; the K x HW distance matrices are two GEMMs on the
MXU (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b). Static shapes: all K keypoints
are kept, failures are masked.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.interp import locations_1d_to_2d, locations_1d_to_homo


class Matches(NamedTuple):
    loc1d_0: jax.Array  # [K] int32 keypoint pixel ids in frame 0
    loc1d_1: jax.Array  # [K] int32 matched pixel ids in frame 1
    valid: jax.Array  # [K] 0/1 cycle-consistency survivors


def select_keypoints(
    key: jax.Array, valid_locations_1d: jax.Array, num_keypoints: int
) -> jax.Array:
    """Seeded random subset of the valid pixel ids (without replacement),
    mirroring the seeded shuffle in reprojection_factor.cpp:44-56."""
    n = valid_locations_1d.shape[0]
    perm = jax.random.permutation(key, n)
    return jnp.take(valid_locations_1d, perm[:num_keypoints])


def _nn_match(desc_q: jax.Array, desc_db: jax.Array) -> jax.Array:
    """argmax_p -||q_k - db_p||^2. desc_q [K, C], desc_db [HW, C] -> [K]."""
    q2 = jnp.sum(desc_q**2, axis=-1, keepdims=True)  # [K, 1]
    db2 = jnp.sum(desc_db**2, axis=-1)[None, :]  # [1, HW]
    cross = desc_q @ desc_db.T  # [K, HW] — MXU
    dist = q2 + db2 - 2.0 * cross
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def cycle_consistent_matches(
    keypoint_loc1d: jax.Array,  # [K] int32
    desc0_flat: jax.Array,  # [HW, C] frame-0 matching descriptors
    desc1_flat: jax.Array,  # [HW, C]
    width: int,
    cyc_consis_thresh: float,
) -> Matches:
    """NN match 0->1 then 1->0; keep cycle-consistent keypoints."""
    d0 = jnp.take(desc0_flat, keypoint_loc1d, axis=0)  # [K, C]
    match1 = _nn_match(d0, desc1_flat)  # [K]
    d1 = jnp.take(desc1_flat, match1, axis=0)
    back0 = _nn_match(d1, desc0_flat)  # [K]

    x0, y0 = locations_1d_to_2d(keypoint_loc1d, width)
    xb, yb = locations_1d_to_2d(back0, width)
    dist_sq = (x0 - xb) ** 2 + (y0 - yb) ** 2
    valid = (dist_sq <= cyc_consis_thresh**2).astype(desc0_flat.dtype)
    return Matches(keypoint_loc1d, match1, valid)


def matches_to_points(matches: Matches, cam):
    """Homogeneous rays for both sides of a match set."""
    homo0 = locations_1d_to_homo(matches.loc1d_0, cam)
    homo1 = locations_1d_to_homo(matches.loc1d_1, cam)
    return homo0, homo1
