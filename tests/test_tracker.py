"""Camera tracker: LM pose recovery on a self-consistent synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.config import TrackerConfig
from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera
from sage_slam_tpu.geometry.interp import locations_1d_to_homo
from sage_slam_tpu.geometry.se3 import se3_exp
from sage_slam_tpu.ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid
from sage_slam_tpu.tracker import tracker


def build_scene(h=48, w=64, fs=4, levels=3, n=400, seed=0):
    """Keyframe with smooth features and flat-ish depth; the frame to
    track has IDENTICAL features, so the optimum relative pose for a
    fronto-parallel plane at the same depth is identity."""
    rng = np.random.default_rng(seed)
    cam = PinholeCamera(
        fx=w * 1.2, fy=w * 1.2, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    pyr = CameraPyramid.build(cam, levels)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    feat = np.stack(
        [
            np.sin(0.18 * xx + 0.9 * c) * np.cos(0.13 * yy + 0.5 * c)
            for c in range(fs)
        ]
    ).astype(np.float32)
    mask = np.ones((h, w), np.float32)
    masks = mask_pyramid(jnp.asarray(mask), levels)
    fpyr, gpyr = gaussian_pyramid_with_grad(jnp.asarray(feat), masks, levels)

    loc1d = rng.choice(h * w, n, replace=False).astype(np.int32)
    homo = locations_1d_to_homo(jnp.asarray(loc1d), cam)
    dpts = jnp.full((n,), 1.5)

    ref = tracker.TrackerRef(
        photo_homo0=homo,
        photo_dpts0=dpts,
        cat_photo_feats0=tracker._sample_source_features(
            fpyr, jnp.asarray(loc1d), pyr
        ),
    )
    target = tracker.TrackerTarget(
        feat_pyr=fpyr, grad_pyr=gpyr, mask_flat=jnp.asarray(mask.reshape(-1))
    )
    return ref, target, pyr, cam


def test_lm_track_recovers_identity():
    ref, target, pyr, cam = build_scene()
    cfg = TrackerConfig()
    # start from a perturbed relative pose
    tau = jnp.asarray([0.02, -0.015, 0.01, 0.01, -0.02, 0.015], jnp.float32)
    p = se3_exp(tau)

    run = jax.jit(
        lambda r, t: tracker.lm_track(
            r, t, ref, target, pyr, cfg, max_iters=30
        )
    )
    res = run(p.rot, p.trans)
    # error should be driven to ~0 and pose to identity
    err0, _ = tracker.tracker_photo_error(
        p.rot, p.trans, ref, target, pyr, cfg.photo_factor_weights, cfg.dpt_eps
    )
    assert float(res.error) < float(err0) * 0.01
    np.testing.assert_allclose(np.array(res.rot), np.eye(3), atol=2e-3)
    np.testing.assert_allclose(np.array(res.trans), np.zeros(3), atol=2e-3)


def test_lm_track_at_optimum_converges_immediately():
    ref, target, pyr, cam = build_scene()
    cfg = TrackerConfig()
    res = tracker.lm_track(
        jnp.eye(3), jnp.zeros(3), ref, target, pyr, cfg, max_iters=10
    )
    assert float(res.error) < 1e-6
    assert int(res.iterations) <= 2


def test_area_inlier_motion():
    ref, target, pyr, cam = build_scene()
    v = 200
    rng = np.random.default_rng(3)
    loc1d = rng.choice(cam.width * cam.height, v, replace=False).astype(np.int32)
    homo = locations_1d_to_homo(jnp.asarray(loc1d), cam)
    dpts = jnp.full((v,), 1.5)
    out = tracker.area_inlier_motion(
        dpts, homo, jnp.eye(3), jnp.zeros(3), cam, target.mask_flat, 1e-6
    )
    # identity warp: all inliers, zero motion
    assert float(out["inlier_ratio"]) == 1.0
    assert float(out["average_motion"]) < 1e-5
    # hull areas equal for identity warp
    a0 = tracker.convex_hull_area(np.array(out["source_2d"]))
    a1 = tracker.convex_hull_area(np.array(out["warped_2d"]))
    assert abs(a0 - a1) / a0 < 1e-5
    assert a0 > 0


def test_convex_hull_area_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]])
    assert abs(tracker.convex_hull_area(pts) - 1.0) < 1e-9


def test_tracker_photo_jac_matches_oracle():
    """Tracker photometric AtA/Atb vs the loopy transcription (both the
    6-DoF and the 7-DoF with-scale variants)."""
    import pytest
    from tests import ref_impl
    from tests.test_photometric import make_scene

    s = make_scene(seed=5, n=48, h=16, w=20, cs=4, fs=3, levels=3)
    pyr = s["pyr"]
    dpts0 = (s["bias"][s["loc1d"]] + s["jac"][s["loc1d"]] @ s["code"]) * s["scale0"]
    feats0 = np.stack(
        [
            np.stack(
                [
                    np.array(
                        tracker._sample_source_features(
                            jnp.concatenate(
                                [jnp.asarray(f.reshape(f.shape[0], -1)) for f in s["feat0_lv"]],
                                axis=-1,
                            ),
                            jnp.asarray(s["loc1d"]),
                            pyr,
                        )
                    )[lvl]
                ]
            )[0]
            for lvl in range(pyr.levels)
        ]
    )  # [L, N, C]
    ref = tracker.TrackerRef(
        photo_homo0=jnp.asarray(s["homo"]),
        photo_dpts0=jnp.asarray(dpts0),
        cat_photo_feats0=jnp.asarray(feats0),
    )
    target = tracker.TrackerTarget(
        feat_pyr=jnp.concatenate(
            [jnp.asarray(f.reshape(f.shape[0], -1)) for f in s["feat1_lv"]],
            axis=-1,
        ),
        grad_pyr=jnp.concatenate(
            [jnp.asarray(g.reshape(2, g.shape[1], -1)) for g in s["grad1_lv"]],
            axis=-1,
        ),
        mask_flat=jnp.asarray(s["mask1"].reshape(-1)),
    )
    rot = np.array(s["p0"].rot)
    t = np.array(s["p0"].trans)
    cams = [(c.fx, c.fy, c.cx, c.cy, c.width, c.height) for c in pyr.cameras]

    for scale0 in (None, 1.3):
        ata, atb, err, ninl = tracker.tracker_photo_jac_error(
            jnp.asarray(rot), jnp.asarray(t), ref, target, pyr,
            s["weights"], s["eps"],
            scale0=None if scale0 is None else jnp.asarray(scale0),
        )
        r_ata, r_atb, r_err, r_ninl = ref_impl.tracker_photo_jac_error_ref(
            rot.astype(np.float64), t.astype(np.float64),
            dpts0.astype(np.float64), s["homo"].astype(np.float64),
            feats0.astype(np.float64),
            [f.astype(np.float64) for f in s["feat1_lv"]],
            [g.astype(np.float64) for g in s["grad1_lv"]],
            s["mask1"].astype(np.float64), cams, s["eps"],
            list(s["weights"]), scale0=scale0,
        )
        assert float(ninl) == r_ninl
        np.testing.assert_allclose(float(err), r_err, rtol=2e-4)
        np.testing.assert_allclose(np.array(atb), r_atb, rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(np.array(ata), r_ata, rtol=5e-3, atol=5e-4)
