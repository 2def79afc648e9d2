"""Geometric factor vs the loopy NumPy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage_slam_tpu.geometry.camera import PinholeCamera
from sage_slam_tpu.geometry.se3 import se3_exp
from sage_slam_tpu.ops import geometric
from sage_slam_tpu.ops.pyramid import spatial_grad
from tests import ref_impl


def make_scene(seed=0, n=80, h=16, w=20, cs=4):
    rng = np.random.default_rng(seed)
    cam = PinholeCamera(
        fx=w * 0.9, fy=h * 0.9, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    bias0 = rng.uniform(0.8, 1.5, h * w).astype(np.float32)
    jac0 = (rng.standard_normal((h * w, cs)) * 0.05).astype(np.float32)
    bias1 = rng.uniform(0.8, 1.5, h * w).astype(np.float32)
    jac1 = (rng.standard_normal((h * w, cs)) * 0.05).astype(np.float32)
    code0 = (rng.standard_normal(cs) * 0.3).astype(np.float32)
    code1 = (rng.standard_normal(cs) * 0.3).astype(np.float32)
    scale0, scale1 = np.float32(1.3), np.float32(0.9)
    mask1 = (rng.uniform(size=(h, w)) > 0.1).astype(np.float32)
    loc1d = rng.choice(h * w, size=n, replace=False).astype(np.int32)
    x2d = (loc1d % w).astype(np.float32)
    y2d = np.floor(loc1d / w).astype(np.float32)
    homo = np.stack(
        [(x2d - cam.cx) / cam.fx, (y2d - cam.cy) / cam.fy, np.ones_like(x2d)],
        axis=-1,
    ).astype(np.float32)
    p0 = se3_exp(jnp.asarray(rng.standard_normal(6) * 0.05, jnp.float32))
    p1 = se3_exp(jnp.asarray(rng.standard_normal(6) * 0.05, jnp.float32))
    return dict(
        cam=cam, bias0=bias0, jac0=jac0, bias1=bias1, jac1=jac1,
        code0=code0, code1=code1, scale0=scale0, scale1=scale1,
        mask1=mask1, loc1d=loc1d, homo=homo, p0=p0, p1=p1,
        weight=0.1, loss_param=0.05, eps=1e-6,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_jac_error_matches_oracle(seed):
    s = make_scene(seed)
    cam = s["cam"]
    hw = cam.height * cam.width
    kf0 = geometric.GeoKf0(
        loc1d=jnp.asarray(s["loc1d"]),
        homo0=jnp.asarray(s["homo"]),
        base_hw=jnp.asarray(0, jnp.int32),
    )
    kf1 = geometric.GeoKf1(base_hw=jnp.asarray(hw, jnp.int32))
    shared = geometric.GeoShared(
        bias_flat=jnp.concatenate(
            [jnp.asarray(s["bias0"]), jnp.asarray(s["bias1"])]
        ),
        jac_flat=jnp.concatenate(
            [jnp.asarray(s["jac0"]), jnp.asarray(s["jac1"])]
        ),
        mask_flat=jnp.asarray(s["mask1"].reshape(-1)),
    )
    ata, atb, err, ninl = geometric.geometric_jac_error(
        s["p0"], s["p1"],
        jnp.asarray(s["code0"]), jnp.asarray(s["code1"]),
        jnp.asarray(s["scale0"]), jnp.asarray(s["scale1"]),
        kf0, kf1, shared, cam, s["weight"], s["loss_param"], s["eps"],
    )

    # oracle inputs (float64)
    rot0 = np.array(s["p0"].rot, np.float64)
    t0 = np.array(s["p0"].trans, np.float64)
    rot1 = np.array(s["p1"].rot, np.float64)
    t1 = np.array(s["p1"].trans, np.float64)
    h, w = cam.height, cam.width
    unscaled1 = (s["bias1"] + s["jac1"] @ s["code1"]).reshape(h, w)
    grad1 = np.array(spatial_grad(jnp.asarray(unscaled1[None])))[:, 0]
    r_ata, r_atb, r_err, r_ninl = ref_impl.geometric_jac_error_ref(
        rot10=rot1.T @ rot0,
        t10=rot1.T @ (t0 - t1),
        rot0=rot0, t0=t0, rot1=rot1, t1=t1,
        bias0_flat=s["bias0"].astype(np.float64),
        jac0_flat=s["jac0"].astype(np.float64),
        code0=s["code0"].astype(np.float64),
        dpt_map_1=float(s["scale1"]) * unscaled1.astype(np.float64),
        dpt_grad_1=float(s["scale1"]) * grad1.astype(np.float64),
        jac1_hwc=s["jac1"].reshape(h, w, -1).astype(np.float64),
        mask1=s["mask1"].astype(np.float64),
        loc1d=s["loc1d"], homo0=s["homo"].astype(np.float64),
        scale0=float(s["scale0"]), scale1=float(s["scale1"]),
        cam=(cam.fx, cam.fy, cam.cx, cam.cy, w, h),
        eps=s["eps"], loss_param=s["loss_param"], weight=s["weight"],
    )
    assert float(ninl) == pytest.approx(r_ninl)
    np.testing.assert_allclose(float(err), r_err, rtol=1e-4)
    np.testing.assert_allclose(np.array(atb), r_atb, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.array(ata), r_ata, rtol=5e-3, atol=1e-4)


def test_error_path_consistent():
    s = make_scene(2)
    cam = s["cam"]
    hw = cam.height * cam.width
    kf0 = geometric.GeoKf0(
        jnp.asarray(s["loc1d"]), jnp.asarray(s["homo"]),
        jnp.asarray(0, jnp.int32),
    )
    kf1 = geometric.GeoKf1(jnp.asarray(hw, jnp.int32))
    shared = geometric.GeoShared(
        jnp.concatenate([jnp.asarray(s["bias0"]), jnp.asarray(s["bias1"])]),
        jnp.concatenate([jnp.asarray(s["jac0"]), jnp.asarray(s["jac1"])]),
        jnp.asarray(s["mask1"].reshape(-1)),
    )
    args = (
        s["p0"], s["p1"], jnp.asarray(s["code0"]), jnp.asarray(s["code1"]),
        jnp.asarray(s["scale0"]), jnp.asarray(s["scale1"]),
        kf0, kf1, shared, cam, s["weight"], s["loss_param"], s["eps"],
    )
    e1, n1 = geometric.geometric_error(*args)
    _, _, e2, n2 = geometric.geometric_jac_error(*args)
    assert float(n1) == float(n2)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-5)
