"""Match-geometry and reprojection factors vs NumPy transcriptions."""

import pytest

import jax.numpy as jnp
import numpy as np
import pytest

from sage_slam_tpu.geometry.camera import PinholeCamera
from sage_slam_tpu.geometry.se3 import se3_exp
from sage_slam_tpu.ops import match_geometry as mg
from sage_slam_tpu.ops import reprojection as rp


def scene(seed=0, m=40, h=16, w=20, cs=4):
    rng = np.random.default_rng(seed)
    cam = PinholeCamera(
        fx=w * 0.9, fy=h * 0.9, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    p0 = se3_exp(jnp.asarray(rng.standard_normal(6) * 0.05, jnp.float32))
    p1 = se3_exp(jnp.asarray(rng.standard_normal(6) * 0.05, jnp.float32))
    bias0 = rng.uniform(0.8, 1.5, h * w).astype(np.float32)
    bias1 = rng.uniform(0.8, 1.5, h * w).astype(np.float32)
    jac0 = (rng.standard_normal((h * w, cs)) * 0.05).astype(np.float32)
    jac1 = (rng.standard_normal((h * w, cs)) * 0.05).astype(np.float32)
    code0 = (rng.standard_normal(cs) * 0.3).astype(np.float32)
    code1 = (rng.standard_normal(cs) * 0.3).astype(np.float32)
    loc0 = rng.choice(h * w, m, replace=False).astype(np.int32)
    loc1 = rng.choice(h * w, m, replace=False).astype(np.int32)

    def homo(loc):
        x = (loc % w - cam.cx) / cam.fx
        y = (loc // w - cam.cy) / cam.fy
        return np.stack([x, y, np.ones_like(x)], -1).astype(np.float32)

    valid = (rng.uniform(size=m) > 0.15).astype(np.float32)
    return dict(
        cam=cam, p0=p0, p1=p1, bias0=bias0, bias1=bias1, jac0=jac0,
        jac1=jac1, code0=code0, code1=code1, loc0=loc0, loc1=loc1,
        homo0=homo(loc0), homo1=homo(loc1), valid=valid,
        scale0=np.float32(1.3), scale1=np.float32(0.8),
        weight=0.1, loss_param=0.05,
    )


def np_fair(diff, lp):
    n = np.abs(diff) / np.sqrt(lp)
    return 2 * np.sum(n - np.log1p(n), axis=-1)


def np_fair_sw(diff, lp):
    n = np.abs(diff) / np.sqrt(lp)
    return np.sqrt(1.0 / (lp * (1.0 + n)))


def test_match_geometry_matches_transcription():
    s = scene()
    matches = mg.MatchSet(
        jnp.asarray(s["loc0"]), jnp.asarray(s["homo0"]),
        jnp.asarray(s["loc1"]), jnp.asarray(s["homo1"]),
        jnp.asarray(s["valid"]),
    )
    ata, atb, err, nv = mg.match_geometry_jac_error(
        s["p0"], s["p1"], jnp.asarray(s["code0"]), jnp.asarray(s["code1"]),
        jnp.asarray(s["scale0"]), jnp.asarray(s["scale1"]),
        jnp.asarray(s["bias0"]), jnp.asarray(s["jac0"]),
        jnp.asarray(s["bias1"]), jnp.asarray(s["jac1"]),
        matches, s["weight"], s["loss_param"],
    )

    # NumPy transcription of the fair kernel (kernels :577-726)
    rot0, t0 = np.array(s["p0"].rot, np.float64), np.array(s["p0"].trans, np.float64)
    rot1, t1 = np.array(s["p1"].rot, np.float64), np.array(s["p1"].trans, np.float64)
    rot10 = rot1.T @ rot0
    t10 = rot1.T @ (t0 - t1)
    cs = 4
    dim = 14 + 2 * cs
    rows_all, diffs_all, errs = [], [], []
    for i in range(len(s["loc0"])):
        if s["valid"][i] == 0:
            continue
        li0, li1 = s["loc0"][i], s["loc1"][i]
        d0 = s["scale0"] * (s["bias0"][li0] + s["jac0"][li0] @ s["code0"])
        d1 = s["scale1"] * (s["bias1"][li1] + s["jac1"][li1] @ s["code1"])
        h0, h1 = s["homo0"][i].astype(np.float64), s["homo1"][i].astype(np.float64)
        rh = rot10 @ h0
        x1 = d0 * rh + t10
        diff = d1 * h1 - x1
        sw = np_fair_sw(diff, s["loss_param"])
        errs.append(np_fair(diff, s["loss_param"]))
        xw = d0 * (rot0 @ h0) + t0
        temp = np.array(
            [
                [1, 0, 0, 0, xw[2], -xw[1]],
                [0, 1, 0, -xw[2], 0, xw[0]],
                [0, 0, 1, xw[1], -xw[0], 0],
            ]
        )
        jp0 = rot1.T @ temp
        row = np.zeros((3, dim))
        row[:, 0:6] = jp0
        row[:, 6:12] = -jp0
        row[:, 12 : 12 + cs] = np.outer(rh, s["scale0"] * s["jac0"][li0])
        row[:, 12 + cs : 12 + 2 * cs] = np.outer(
            -h1, s["scale1"] * s["jac1"][li1]
        )
        row[:, 12 + 2 * cs] = rh * d0 / s["scale0"]
        row[:, 13 + 2 * cs] = -h1 * d1 / s["scale1"]
        rows_all.append(sw[:, None] * row)
        diffs_all.append(sw * diff)
    rows_np = np.concatenate(rows_all)
    diffs_np = np.concatenate(diffs_all)
    mreal = s["valid"].sum()
    r_ata = (s["weight"] / mreal) * rows_np.T @ rows_np
    r_atb = (s["weight"] / mreal) * rows_np.T @ diffs_np
    r_err = s["weight"] * np.sum(errs) / mreal

    assert float(nv) == mreal
    np.testing.assert_allclose(float(err), r_err, rtol=1e-4)
    np.testing.assert_allclose(np.array(atb), r_atb, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.array(ata), r_ata, rtol=2e-3, atol=2e-4)


def test_reprojection_matches_transcription():
    s = scene(seed=3)
    cam = s["cam"]
    m2d = np.stack(
        [s["loc1"] % cam.width, s["loc1"] // cam.width], -1
    ).astype(np.float32)
    matches = rp.ReprojMatchSet(
        jnp.asarray(s["loc0"]), jnp.asarray(s["homo0"]),
        jnp.asarray(m2d), jnp.asarray(s["valid"]),
    )
    eps = 1e-6
    ata, atb, err, ninl = rp.reprojection_jac_error(
        s["p0"], s["p1"], jnp.asarray(s["code0"]), jnp.asarray(s["scale0"]),
        jnp.asarray(s["bias0"]), jnp.asarray(s["jac0"]),
        matches, cam, s["weight"], s["loss_param"] * 100, eps,
    )
    lp = s["loss_param"] * 100

    rot0, t0 = np.array(s["p0"].rot, np.float64), np.array(s["p0"].trans, np.float64)
    rot1, t1 = np.array(s["p1"].rot, np.float64), np.array(s["p1"].trans, np.float64)
    rot10 = rot1.T @ rot0
    t10 = rot1.T @ (t0 - t1)
    cs = 4
    dim = 13 + cs
    rows_all, diffs_all, errs = [], [], []
    n_inl = 0.0
    for i in range(len(s["loc0"])):
        li0 = s["loc0"][i]
        d0 = s["scale0"] * (s["bias0"][li0] + s["jac0"][li0] @ s["code0"])
        h0 = s["homo0"][i].astype(np.float64)
        rh = rot10 @ h0
        x1 = d0 * rh + t10
        pos = x1[2] > eps
        u = x1[0] / x1[2] * cam.fx + cam.cx
        v = x1[1] / x1[2] * cam.fy + cam.cy
        diff = m2d[i] - np.array([u, v])
        if s["valid"][i] == 0 or not pos:
            continue
        n_inl += 1
        sw = np_fair_sw(diff, lp)
        errs.append(np_fair(diff, lp))
        inv_z = 1 / x1[2]
        pj = np.array(
            [
                [cam.fx * inv_z, 0, -cam.fx * x1[0] * inv_z**2],
                [0, cam.fy * inv_z, -cam.fy * x1[1] * inv_z**2],
            ]
        )
        xw = d0 * (rot0 @ h0) + t0
        temp = np.array(
            [
                [1, 0, 0, 0, xw[2], -xw[1]],
                [0, 1, 0, -xw[2], 0, xw[0]],
                [0, 0, 1, xw[1], -xw[0], 0],
            ]
        )
        jp0 = pj @ (rot1.T @ temp)
        jdpt = np.array(
            [
                cam.fx * (rh[0] * inv_z - x1[0] * rh[2] * inv_z**2),
                cam.fy * (rh[1] * inv_z - x1[1] * rh[2] * inv_z**2),
            ]
        )
        row = np.zeros((2, dim))
        row[:, 0:6] = jp0
        row[:, 6:12] = -jp0
        row[:, 12 : 12 + cs] = np.outer(jdpt, s["scale0"] * s["jac0"][li0])
        row[:, 12 + cs] = jdpt * d0 / s["scale0"]
        rows_all.append(sw[:, None] * row)
        diffs_all.append(sw * diff)
    rows_np = np.concatenate(rows_all)
    diffs_np = np.concatenate(diffs_all)
    r_ata = (s["weight"] / n_inl) * rows_np.T @ rows_np
    r_atb = (s["weight"] / n_inl) * rows_np.T @ diffs_np
    r_err = s["weight"] * np.sum(errs) / n_inl

    assert float(ninl) == n_inl
    np.testing.assert_allclose(float(err), r_err, rtol=1e-4)
    np.testing.assert_allclose(np.array(atb), r_atb, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.array(ata), r_ata, rtol=2e-3, atol=2e-4)


def test_priors():
    from sage_slam_tpu.ops import priors
    from sage_slam_tpu.geometry.se3 import SE3, retract

    # scale prior quadratic model: err(s+d) - err(s) ~ d AtA d - 2 Atb d
    s = jnp.asarray(1.5)
    ata, atb, err = priors.scale_prior(s, 1.0, 10.0)
    d = 1e-3
    _, _, err2 = priors.scale_prior(s + d, 1.0, 10.0)
    pred = d * float(ata[0, 0]) * d - 2 * float(atb[0]) * d
    assert float(err2) - float(err) == pytest.approx(pred, rel=0.05)

    # rel pose scale factor: zero residual at the target
    p0 = se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.05, 0.1, -0.05], jnp.float32))
    p1 = se3_exp(jnp.asarray([-0.1, 0.0, 0.2, -0.1, 0.05, 0.1], jnp.float32))
    from sage_slam_tpu.geometry import se3 as se3m

    target = se3m.compose(se3m.inverse(p1), p0)
    ata, atb, err = priors.rel_pose_scale_factor(
        p0, p1, jnp.asarray(1.2), jnp.asarray(0.9), target,
        jnp.asarray(1.2), jnp.asarray(0.9), 5.0, 1.0, 3.0,
    )
    assert float(err) == pytest.approx(0.0, abs=1e-8)
    np.testing.assert_allclose(np.array(atb), 0, atol=1e-5)
    # AtA PSD
    evals = np.linalg.eigvalsh(np.array(ata, np.float64))
    assert evals.min() > -1e-5





def test_reprojection_gated_negative_depth_stays_finite():
    """A match warped to z <= eps is gated out; its 1/z must not poison
    the reduction with 0 * inf = NaN (round-4 fix: residuals.safe_points
    — the reference's CUDA threads skip gated points before dividing)."""
    import jax.numpy as jnp
    import numpy as np

    from sage_slam_tpu.geometry.camera import PinholeCamera
    from sage_slam_tpu.geometry.se3 import SE3
    from sage_slam_tpu.ops import reprojection as rp

    cam = PinholeCamera(fx=20.0, fy=20.0, cx=9.5, cy=7.5, width=20, height=16)
    m = 4
    cs = 3
    hw = cam.width * cam.height
    bias = np.full(hw, 1.0, np.float32)
    jac = np.zeros((hw, cs), np.float32)
    loc = jnp.asarray([5, 6, 7, 8], jnp.int32)
    homo = jnp.asarray(
        [[0.0, 0.0, 1.0]] * m, jnp.float32
    )
    matches = rp.ReprojMatchSet(
        loc1d_0=loc,
        homo_0=homo,
        matched_2d_1=jnp.zeros((m, 2)),
        valid=jnp.ones(m),
    )
    # pose1 two units AHEAD of pose0 along +z: warped z = 1 - 2 < 0 for
    # every match -> all gated; the zero-inlier penalty path must return
    # finite zeros, not NaN
    p0 = SE3.identity()
    p1 = SE3(jnp.eye(3), jnp.asarray([0.0, 0.0, 2.0]))
    ata, atb, err, n = rp.reprojection_jac_error(
        p0, p1, jnp.zeros(cs), jnp.asarray(1.0), jnp.asarray(bias),
        jnp.asarray(jac), matches, cam, 1.0, 10.0, 1e-6,
    )
    assert float(n) == 0.0
    assert np.all(np.isfinite(np.array(ata)))
    assert np.all(np.isfinite(np.array(atb)))
    assert np.isfinite(float(err))
    e, n2 = rp.reprojection_error(
        p0, p1, jnp.zeros(cs), jnp.asarray(1.0), jnp.asarray(bias),
        jnp.asarray(jac), matches, cam, 1.0, 10.0, 1e-6,
    )
    assert np.isfinite(float(e)) and float(n2) == 0.0
