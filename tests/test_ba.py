"""Window BA integration test — the 'minimum end-to-end slice'
(SURVEY.md §7.2 step 3): multi-keyframe photometric+geometric GN recovers
perturbed poses on a self-consistent synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.config import MapperConfig
from sage_slam_tpu.geometry.camera import CameraPyramid, PinholeCamera
from sage_slam_tpu.geometry.interp import locations_1d_to_homo
from sage_slam_tpu.geometry.se3 import SE3, se3_exp
from sage_slam_tpu.ops.pyramid import gaussian_pyramid_with_grad, mask_pyramid
from sage_slam_tpu.solver import ba
from sage_slam_tpu.solver.graph import Variables
from sage_slam_tpu.solver.psd import nearest_psd


def build_problem(k=3, h=32, w=40, cs=4, fs=4, levels=3, n=256, seed=0):
    rng = np.random.default_rng(seed)
    cam = PinholeCamera(
        fx=w * 1.1, fy=w * 1.1, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    pyr = CameraPyramid.build(cam, levels)

    # one shared smooth feature image => identical keyframes; identity
    # relative poses are then the global optimum
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    feat = np.stack(
        [
            np.sin(0.21 * xx + 0.7 * c) * np.cos(0.17 * yy + 0.3 * c)
            for c in range(fs)
        ]
    ).astype(np.float32)
    mask = np.ones((h, w), np.float32)
    masks = mask_pyramid(jnp.asarray(mask), levels)
    fpyr, gpyr = gaussian_pyramid_with_grad(jnp.asarray(feat), masks, levels)

    bias = np.full(h * w, 1.2, np.float32) + 0.1 * np.sin(
        0.13 * np.arange(h * w)
    ).astype(np.float32)
    jac = (rng.standard_normal((h * w, cs)) * 0.02).astype(np.float32)
    loc1d = rng.choice(h * w, size=n, replace=False).astype(np.int32)
    homo = np.array(locations_1d_to_homo(jnp.asarray(loc1d), cam))

    from sage_slam_tpu.ops.photometric import sample_source_features

    srcf = sample_source_features(fpyr, jnp.asarray(loc1d), pyr)
    window = ba.WindowData(
        loc1d=jnp.tile(jnp.asarray(loc1d)[None], (k, 1)),
        homo=jnp.tile(jnp.asarray(homo, jnp.float32)[None], (k, 1, 1)),
        bias_flat=jnp.tile(jnp.asarray(bias)[None], (k, 1)),
        jac_flat=jnp.tile(jnp.asarray(jac)[None], (k, 1, 1)),
        feat_pyr=jnp.tile(fpyr[:, None], (1, k, 1)),
        grad_pyr=jnp.tile(gpyr[:, :, None], (1, 1, k, 1)),
        src_feats=jnp.tile(srcf[None], (k, 1, 1, 1)),
        avg_sq_bias=jnp.full((k,), float(np.mean(bias**2))),
        mask_flat=jnp.asarray(mask.reshape(-1)),
    )

    # consecutive-pair links in both directions (mapper.cpp:333-374)
    i0, i1 = [], []
    for a in range(k - 1):
        i0 += [a, a + 1]
        i1 += [a + 1, a]
    edges = ba.EdgeTable(
        i0=jnp.asarray(i0, jnp.int32),
        i1=jnp.asarray(i1, jnp.int32),
        valid=jnp.ones(len(i0)),
    )
    pr = ba.PriorTable(
        code_valid=jnp.ones(k),
        scale_valid=jnp.zeros(k).at[0].set(1.0),
        scale_init=jnp.ones(k),
        pose_valid=jnp.zeros(k).at[0].set(1.0),
        pose_target=SE3.identity((k,)),
    )
    problem = ba.BAProblem(window, edges, edges, pr)
    return problem, pyr


def add_reproj_edges(problem, pyr, m=16):
    """Attach a reprojection edge table (both directions per pair) using
    the window's own sampled points as cycle matches — identity relative
    poses remain the optimum since the keyframes are identical."""
    from sage_slam_tpu.geometry.interp import locations_1d_to_2d

    w = problem.window
    k = w.loc1d.shape[0]
    cam = pyr[0]
    i0, i1 = [], []
    for a in range(k - 1):
        i0 += [a, a + 1]
        i1 += [a + 1, a]
    e = len(i0)
    loc = w.loc1d[0, :m]
    homo = w.homo[0, :m]
    x1, y1 = locations_1d_to_2d(loc, cam.width)
    matched = jnp.stack([x1, y1], axis=-1).astype(jnp.float32)
    reproj = ba.ReprojEdgeTable(
        i0=jnp.asarray(i0, jnp.int32),
        i1=jnp.asarray(i1, jnp.int32),
        valid=jnp.ones(e),
        loc1d_0=jnp.tile(loc[None], (e, 1)),
        homo_0=jnp.tile(homo[None], (e, 1, 1)),
        matched_2d_1=jnp.tile(matched[None], (e, 1, 1)),
        match_valid=jnp.ones((e, m)),
        weight=jnp.ones(e),
    )
    return problem._replace(reproj_edges=reproj)


def perturbed_vars(k, cs, seed=1, mag=0.02):
    rng = np.random.default_rng(seed)
    taus = np.zeros((k, 6), np.float32)
    taus[1:] = rng.standard_normal((k - 1, 6)).astype(np.float32) * mag
    pose = se3_exp(jnp.asarray(taus))
    return Variables(pose, jnp.zeros((k, cs)), jnp.ones(k))


def test_nearest_psd():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((5, 7, 7)).astype(np.float32)
    out = np.array(nearest_psd(jnp.asarray(m)))
    for i in range(5):
        np.testing.assert_allclose(out[i], out[i].T, atol=1e-5)
        evals = np.linalg.eigvalsh(out[i].astype(np.float64))
        assert evals.min() > -1e-4
    # PSD input passes through
    spd = m @ np.swapaxes(m, -1, -2)
    out2 = np.array(nearest_psd(jnp.asarray(spd)))
    np.testing.assert_allclose(out2, spd, rtol=1e-3, atol=1e-3)


def test_ba_recovers_perturbed_poses():
    k, cs = 3, 4
    problem, pyr = build_problem(k=k, cs=cs)
    cfg = MapperConfig()
    v0 = perturbed_vars(k, cs)
    update_mask = jnp.ones(k)

    err_init = float(ba.total_error(v0, problem, pyr, cfg))

    run = jax.jit(
        lambda v: ba.run_ba(v, problem, pyr, cfg, update_mask, max_iters=12)
    )
    v_final, err_final, iters, _ = run(v0)
    err_final = float(err_final)

    assert err_final < err_init * 0.05, (err_init, err_final)
    # poses recovered to near identity (translation part)
    t = np.array(v_final.pose.trans)
    assert np.abs(t).max() < 5e-3, t
    # rotation recovered
    for i in range(k):
        np.testing.assert_allclose(
            np.array(v_final.pose.rot[i]), np.eye(3), atol=5e-3
        )


def test_ba_respects_update_mask():
    k, cs = 3, 4
    problem, pyr = build_problem(k=k, cs=cs)
    cfg = MapperConfig()
    v0 = perturbed_vars(k, cs)
    frozen = jnp.asarray([1.0, 0.0, 1.0])  # freeze kf1
    v_final, _, _, _ = ba.run_ba(v0, problem, pyr, cfg, frozen, max_iters=3)
    np.testing.assert_allclose(
        np.array(v_final.pose.trans[1]), np.array(v0.pose.trans[1]), atol=0
    )
    np.testing.assert_allclose(
        np.array(v_final.code[1]), np.array(v0.code[1]), atol=0
    )


def test_schur_solver_matches_dense():
    """solver='schur' (eliminate code+scale per keyframe, with the full
    cross-coupled Acc) must reproduce the dense solve's LM trajectory
    (round-3 verdict #2: allclose <=1e-5 rel on existing problems)."""
    import dataclasses

    k, cs = 4, 4
    problem, pyr = build_problem(k=k, cs=cs)
    v0 = perturbed_vars(k, cs)
    update_mask = jnp.ones(k).at[1].set(0.0)  # one frozen row too
    outs = {}
    for solver in ("dense", "schur"):
        cfg = dataclasses.replace(MapperConfig(), solver=solver)
        v, err, iters, _ = jax.jit(
            lambda v_, cfg=cfg: ba.run_ba(
                v_, problem, pyr, cfg, update_mask, max_iters=6
            )
        )(v0)
        outs[solver] = (v, float(err), int(iters))
    vd, ed, _ = outs["dense"]
    vs, es, _ = outs["schur"]
    np.testing.assert_allclose(ed, es, rtol=1e-5)
    np.testing.assert_allclose(
        np.array(vd.pose.trans), np.array(vs.pose.trans), rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.array(vd.code), np.array(vs.code), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.array(vd.scale), np.array(vs.scale), rtol=1e-4, atol=1e-6
    )


def test_compact_problem_matches_slice():
    """compact_problem_keyframes on an identity id set must reproduce the
    kb-sliced problem's BA result exactly; on a permuted/padded id set
    the solve must match up to factorization-order roundoff."""
    k, cs = 4, 4
    problem, pyr = build_problem(k=k, cs=cs)
    problem = ba.prepare_problem(problem, pyr)
    cfg = MapperConfig()
    v0 = perturbed_vars(k, cs)
    update_mask = jnp.ones(k)

    v_ref, err_ref, _, _ = ba.run_ba(
        v0, problem, pyr, cfg, update_mask, max_iters=4
    )

    # compact with identity ids == the same problem
    ids = jnp.arange(k, dtype=jnp.int32)
    pad_valid = jnp.ones(k)
    compact = ba.compact_problem_keyframes(problem, ids, pad_valid, pyr)
    v_c, err_c, _, _ = ba.run_ba(
        v0, compact, pyr, cfg, update_mask, max_iters=4
    )
    np.testing.assert_allclose(float(err_ref), float(err_c), rtol=1e-6)
    np.testing.assert_allclose(
        np.array(v_ref.pose.trans), np.array(v_c.pose.trans), atol=1e-7
    )
