"""Vocabulary transform/scoring and pose-scale graph optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage_slam_tpu.config import LoopConfig
from sage_slam_tpu.geometry import se3 as se3m
from sage_slam_tpu.geometry.se3 import SE3, se3_exp
from sage_slam_tpu.loop import pose_graph, vocabulary


def test_vocabulary_build_and_transform():
    rng = np.random.default_rng(0)
    # three well-separated clusters of descriptors
    centers = rng.uniform(-1, 1, (6, 8)).astype(np.float32) * 3
    train = np.concatenate(
        [c + rng.normal(0, 0.05, (50, 8)).astype(np.float32) for c in centers]
    )
    voc = vocabulary.build_vocabulary(train, k=3, levels=2, seed=1)
    assert voc.num_words > 0

    f1 = jnp.asarray(centers[:3] + 0.01)
    f2 = jnp.asarray(centers[:3] + 0.012)  # nearly identical
    f3 = jnp.asarray(centers[3:] + 0.01)  # different clusters
    b1 = vocabulary.transform(voc, f1)
    b2 = vocabulary.transform(voc, f2)
    b3 = vocabulary.transform(voc, f3)
    assert abs(float(jnp.sum(jnp.abs(b1))) - 1.0) < 1e-5  # L1 normalized
    s_same = float(vocabulary.score_l1(b1, b2))
    s_diff = float(vocabulary.score_l1(b1, b3))
    assert s_same > 0.99
    assert s_diff < 0.5
    assert s_same > s_diff


def test_bow_database_query():
    rng = np.random.default_rng(1)
    train = rng.uniform(-1, 1, (300, 8)).astype(np.float32)
    voc = vocabulary.build_vocabulary(train, k=4, levels=2, seed=0)
    db = vocabulary.BowDatabase(voc, capacity=10)
    sets = [
        rng.uniform(-1, 1, (40, 8)).astype(np.float32) for _ in range(4)
    ]
    for s in sets:
        db.add(jnp.asarray(s))
    # query with a copy of set 2 => top hit is entry 2 with score ~1
    q = vocabulary.transform(voc, jnp.asarray(sets[2]))
    scores, ids, ref_max = db.query(q, 3, conn_ids=[1])
    assert ids[0] == 2
    assert scores[0] > 0.999
    # the batched temporal-neighbor baseline equals the direct score
    direct = float(vocabulary.score_l1(q, db.vectors[1]))
    assert abs(ref_max - max(direct, 0.0)) < 1e-6
    # ids beyond count score the -1e30 sentinel and sort last
    scores6, ids6, _ = db.query(q, 6)
    assert (scores6[4:] < -1e29).all()


def _chain_poses(k, step_tau):
    poses = [SE3.identity()]
    for _ in range(k - 1):
        poses.append(se3m.compose(poses[-1], se3_exp(jnp.asarray(step_tau))))
    rot = jnp.stack([p.rot for p in poses])
    trans = jnp.stack([p.trans for p in poses])
    return SE3(rot, trans)


def test_pose_scale_graph_corrects_drift():
    """Chain 0-1-2-3-4 with drifted poses; a loop edge 4->0 with the true
    relative pose pulls the chain back; scale drift likewise."""
    k = 5
    cfg = LoopConfig()
    true_step = [0.1, 0.0, 0.05, 0.0, 0.0, 0.02]
    true_poses = _chain_poses(k, true_step)

    # drifted: each step slightly wrong -> accumulating error
    drift_step = [0.12, 0.01, 0.05, 0.0, 0.005, 0.02]
    drift_poses = _chain_poses(k, drift_step)
    drift_scale = jnp.asarray([1.0, 1.05, 1.1, 1.16, 1.21])

    variables = pose_graph.make_pose_scale_variables(
        drift_poses, drift_scale
    )

    # edges: consecutive links target the DRIFTED relpose (odometry), the
    # loop edge 4->0 targets the TRUE relpose with true scales
    i0, i1, trot, ttr, ts0, ts1, w = [], [], [], [], [], [], []

    def rel(pA, iA, iB):
        a = SE3(pA.rot[iA], pA.trans[iA])
        b = SE3(pA.rot[iB], pA.trans[iB])
        return se3m.compose(se3m.inverse(b), a)  # T_b^-1 T_a = rel "10"

    for a in range(k - 1):
        b = a + 1
        r = rel(drift_poses, a, b)
        for (x, y, rr, s0, s1) in [
            (a, b, r, drift_scale[a], drift_scale[b]),
            (b, a, se3m.inverse(r), drift_scale[b], drift_scale[a]),
        ]:
            i0.append(x)
            i1.append(y)
            trot.append(rr.rot)
            ttr.append(rr.trans)
            ts0.append(s0)
            ts1.append(s1)
            w.append(cfg.pose_graph_local_link_weight)

    r_loop = rel(true_poses, 4, 0)
    for (x, y, rr, s0, s1) in [
        (4, 0, r_loop, 1.0, 1.0),
        (0, 4, se3m.inverse(r_loop), 1.0, 1.0),
    ]:
        i0.append(x)
        i1.append(y)
        trot.append(rr.rot)
        ttr.append(rr.trans)
        ts0.append(jnp.asarray(s0))
        ts1.append(jnp.asarray(s1))
        w.append(cfg.pose_graph_global_link_weight)

    edges = pose_graph.PoseScaleEdges(
        i0=jnp.asarray(i0, jnp.int32),
        i1=jnp.asarray(i1, jnp.int32),
        target_rot=jnp.stack(trot),
        target_trans=jnp.stack(ttr),
        target_scale0=jnp.stack([jnp.asarray(x) for x in ts0]),
        target_scale1=jnp.stack([jnp.asarray(x) for x in ts1]),
        weight=jnp.asarray(w),
        valid=jnp.ones(len(i0)),
    )
    priors = pose_graph.PoseScalePriors(
        pose_valid=jnp.zeros(k).at[0].set(1.0),
        pose_target=SE3(drift_poses.rot, drift_poses.trans),
        pose_weight=1.0e8,
        scale_valid=jnp.zeros(k).at[0].set(1.0).at[4].set(1.0),
        scale_target=jnp.ones(k),
        scale_weight=jnp.full(k, cfg.pose_graph_scale_prior_weight).at[0].set(100.0),
    )

    err0 = float(pose_graph.error_only(variables, edges, priors, cfg))
    v_opt, err, it = jax.jit(
        lambda v: pose_graph.optimize(
            v, edges, priors, cfg, jnp.ones(k), max_iters=30
        )
    )(variables)
    assert float(err) < err0 * 0.2

    # the loop constraint must now hold much better than before
    def loop_residual(poses):
        r = se3m.compose(
            se3m.inverse(SE3(poses.rot[0], poses.trans[0])),
            SE3(poses.rot[4], poses.trans[4]),
        )
        true_r = se3m.compose(
            se3m.inverse(SE3(true_poses.rot[0], true_poses.trans[0])),
            SE3(true_poses.rot[4], true_poses.trans[4]),
        )
        return float(
            jnp.linalg.norm(r.trans - true_r.trans)
        )

    assert loop_residual(v_opt.pose) < loop_residual(drift_poses) * 0.3
    # scale drift pulled back toward 1
    assert abs(float(v_opt.scale[4]) - 1.0) < abs(float(drift_scale[4]) - 1.0) * 0.5


def test_propagate_newer_keyframes():
    k = 4
    poses = _chain_poses(k, [0.1, 0, 0, 0, 0, 0])
    scales = jnp.ones(k)
    new_poses = SE3(poses.rot, poses.trans.at[1].add(jnp.asarray([0.5, 0, 0.0])))
    new_scales = scales.at[1].set(2.0)
    out = pose_graph.propagate_newer_keyframes(
        poses, scales, new_poses, new_scales, last_in_graph=1, newer_ids=[2, 3]
    )
    # keyframe 2: rel to old kf1 = +0.1x; scaled by 2 => +0.2 from new kf1
    p2, s2 = out[2]
    np.testing.assert_allclose(float(s2), 2.0, rtol=1e-6)
    expected = np.array(new_poses.trans[1]) + np.array([0.2, 0, 0])
    np.testing.assert_allclose(np.array(p2.trans), expected, atol=1e-6)
