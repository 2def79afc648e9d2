"""Photometric factor vs the loopy NumPy oracle (tests/ref_impl.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera
from sage_slam_tpu.geometry.se3 import SE3, se3_exp
from sage_slam_tpu.ops import photometric
from tests import ref_impl


def make_scene(seed=0, n=64, h=16, w=20, cs=4, fs=3, levels=3, smooth=False):
    """Random test scene. With smooth=True the feature maps are smooth and
    the gradient pyramid is the true spatial gradient (needed for the
    quadratic-model check to be meaningful)."""
    rng = np.random.default_rng(seed)
    cam0 = PinholeCamera(
        fx=w * 0.9, fy=h * 0.9, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    pyr = CameraPyramid.build(cam0, levels)

    bias = rng.uniform(0.8, 1.5, h * w).astype(np.float32)
    jac = (rng.standard_normal((h * w, cs)) * 0.05).astype(np.float32)
    code = rng.standard_normal(cs).astype(np.float32) * 0.3
    scale0 = np.float32(1.3)
    mask1 = (rng.uniform(size=(h, w)) > 0.1).astype(np.float32)

    loc1d = rng.choice(h * w, size=n, replace=False).astype(np.int32)
    x2d = (loc1d % w).astype(np.float32)
    y2d = np.floor(loc1d / w).astype(np.float32)
    homo = np.stack(
        [
            (x2d - cam0.cx) / cam0.fx,
            (y2d - cam0.cy) / cam0.fy,
            np.ones_like(x2d),
        ],
        axis=-1,
    ).astype(np.float32)

    feat0_lv, feat1_lv, grad1_lv = [], [], []
    for lvl in range(levels):
        cl = pyr[lvl]
        if smooth:
            yy, xx = np.meshgrid(
                np.arange(cl.height, dtype=np.float32),
                np.arange(cl.width, dtype=np.float32),
                indexing="ij",
            )
            phase = rng.uniform(0, 2 * np.pi, (fs, 2))
            freq = rng.uniform(0.1, 0.4, (fs, 2)) / (lvl + 1)

            def smooth_map(off=0.0):
                return np.stack(
                    [
                        np.sin(freq[c, 0] * xx + phase[c, 0] + off)
                        * np.cos(freq[c, 1] * yy + phase[c, 1])
                        for c in range(fs)
                    ]
                ).astype(np.float32)

            f0 = smooth_map()
            f1 = smooth_map(0.3)
            from sage_slam_tpu.ops.pyramid import spatial_grad

            g1 = np.array(spatial_grad(jnp.asarray(f1)))
            feat0_lv.append(f0)
            feat1_lv.append(f1)
            grad1_lv.append(g1)
        else:
            feat0_lv.append(
                rng.standard_normal((fs, cl.height, cl.width)).astype(
                    np.float32
                )
            )
            feat1_lv.append(
                rng.standard_normal((fs, cl.height, cl.width)).astype(
                    np.float32
                )
            )
            grad1_lv.append(
                (
                    rng.standard_normal((2, fs, cl.height, cl.width)) * 0.3
                ).astype(np.float32)
            )

    tau0 = rng.standard_normal(6) * 0.05
    tau1 = rng.standard_normal(6) * 0.05
    p0 = se3_exp(jnp.asarray(tau0, jnp.float32))
    p1 = se3_exp(jnp.asarray(tau1, jnp.float32))
    return dict(
        pyr=pyr,
        bias=bias,
        jac=jac,
        code=code,
        scale0=scale0,
        mask1=mask1,
        loc1d=loc1d,
        homo=homo,
        feat0_lv=feat0_lv,
        feat1_lv=feat1_lv,
        grad1_lv=grad1_lv,
        p0=p0,
        p1=p1,
        weights=tuple(float(x) for x in [2.0, 1.5, 1.0][:levels]),
        eps=1e-6,
    )


def to_jax_inputs(s):
    feat0_pyr = jnp.concatenate(
        [jnp.asarray(f.reshape(f.shape[0], -1)) for f in s["feat0_lv"]],
        axis=-1,
    )
    zero = jnp.asarray(0, jnp.int32)
    kf0 = photometric.PhotoKf0(
        loc1d=jnp.asarray(s["loc1d"]),
        homo0=jnp.asarray(s["homo"]),
        src_feats=photometric.sample_source_features(
            feat0_pyr, jnp.asarray(s["loc1d"]), s["pyr"]
        ),
        base_hw=zero,
        base_pyr=zero,
    )
    fr1 = photometric.PhotoFr1(base_pyr=zero)
    shared = photometric.PhotoShared(
        bias_flat=jnp.asarray(s["bias"]),
        jac_flat=jnp.asarray(s["jac"]),
        feat_pyr=jnp.concatenate(
            [jnp.asarray(f.reshape(f.shape[0], -1)) for f in s["feat1_lv"]],
            axis=-1,
        ),
        grad_pyr=jnp.concatenate(
            [
                jnp.asarray(g.reshape(2, g.shape[1], -1))
                for g in s["grad1_lv"]
            ],
            axis=-1,
        ),
        mask_flat=jnp.asarray(s["mask1"].reshape(-1)),
    )
    return kf0, fr1, shared


def ref_args(s):
    p0, p1 = s["p0"], s["p1"]
    rot0 = np.array(p0.rot, np.float64)
    t0 = np.array(p0.trans, np.float64)
    rot1 = np.array(p1.rot, np.float64)
    t1 = np.array(p1.trans, np.float64)
    rot10 = rot1.T @ rot0
    t10 = rot1.T @ (t0 - t1)
    cams = [
        (c.fx, c.fy, c.cx, c.cy, c.width, c.height) for c in s["pyr"].cameras
    ]
    return dict(
        rot10=rot10,
        t10=t10,
        rot0=rot0,
        t0=t0,
        rot1=rot1,
        t1=t1,
        bias_flat=s["bias"].astype(np.float64),
        jac_flat=s["jac"].astype(np.float64),
        code=s["code"].astype(np.float64),
        mask1=s["mask1"].astype(np.float64),
        loc1d=s["loc1d"],
        homo0=s["homo"].astype(np.float64),
        feat0_levels=[f.astype(np.float64) for f in s["feat0_lv"]],
        feat1_levels=[f.astype(np.float64) for f in s["feat1_lv"]],
        grad1_levels=[g.astype(np.float64) for g in s["grad1_lv"]],
        cams=cams,
        scale0=float(s["scale0"]),
        eps=s["eps"],
        weights=list(s["weights"]),
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_jac_error_matches_oracle(seed):
    s = make_scene(seed)
    kf0, fr1, shared = to_jax_inputs(s)
    ata, atb, err, n_inl = photometric.photometric_jac_error(
        s["p0"],
        s["p1"],
        jnp.asarray(s["code"]),
        jnp.asarray(s["scale0"]),
        kf0,
        fr1,
        shared,
        s["pyr"],
        s["weights"],
        s["eps"],
    )
    r_ata, r_atb, r_err, r_ninl = ref_impl.photometric_jac_error_ref(
        **ref_args(s)
    )
    assert float(n_inl) == pytest.approx(r_ninl)
    np.testing.assert_allclose(float(err), r_err, rtol=2e-4)
    np.testing.assert_allclose(np.array(atb), r_atb, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.array(ata), r_ata, rtol=5e-3, atol=5e-4)


def test_error_path_consistent_with_jac_path():
    s = make_scene(2)
    kf0, fr1, shared = to_jax_inputs(s)
    args = (
        s["p0"],
        s["p1"],
        jnp.asarray(s["code"]),
        jnp.asarray(s["scale0"]),
        kf0,
        fr1,
        shared,
        s["pyr"],
        s["weights"],
        s["eps"],
    )
    err_only, n1 = photometric.photometric_error(*args)
    _, _, err_jac, n2 = photometric.photometric_jac_error(*args)
    assert float(n1) == float(n2)
    np.testing.assert_allclose(float(err_only), float(err_jac), rtol=1e-5)


def test_quadratic_model_predicts_error_change():
    """err(x+d) - err(x) ≈ dᵀ AtA d - 2 Atbᵀ d — the reference's own
    commented-out verification (photometric_factor.cpp:124-143)."""
    s = make_scene(3, n=128, h=32, w=40, smooth=True)
    kf0, fr1, shared = to_jax_inputs(s)
    code = jnp.asarray(s["code"])
    scale0 = jnp.asarray(s["scale0"])
    base = (s["p0"], s["p1"], code, scale0, kf0, fr1, shared, s["pyr"], s["weights"], s["eps"])
    ata, atb, err0, n0 = photometric.photometric_jac_error(*base)

    eps_d = 1e-3
    delta = np.zeros(13 + 4)
    delta[:3] = eps_d  # translation of pose0
    from sage_slam_tpu.geometry.se3 import retract

    p0_new = retract(s["p0"], jnp.asarray(delta[:6], jnp.float32))
    err1, _ = photometric.photometric_error(
        p0_new, s["p1"], code, scale0, kf0, fr1, shared, s["pyr"], s["weights"], s["eps"]
    )
    d_num = float(err1) - float(err0)
    d_ana = float(delta @ np.array(ata) @ delta - 2.0 * np.array(atb) @ delta)
    # loose: inlier set may shift slightly under the perturbation
    assert d_num == pytest.approx(d_ana, rel=0.25, abs=1e-5)


def test_zero_inlier_penalty():
    s = make_scene(4)
    s["mask1"] = np.zeros_like(s["mask1"])  # nothing valid in target
    kf0, fr1, shared = to_jax_inputs(s)
    ata, atb, err, n_inl = photometric.photometric_jac_error(
        s["p0"],
        s["p1"],
        jnp.asarray(s["code"]),
        jnp.asarray(s["scale0"]),
        kf0,
        fr1,
        shared,
        s["pyr"],
        s["weights"],
        s["eps"],
    )
    assert float(n_inl) == 0.0
    assert float(err) == pytest.approx(sum(s["weights"]) * 10.0)
    assert np.allclose(np.array(ata), 0) and np.allclose(np.array(atb), 0)
