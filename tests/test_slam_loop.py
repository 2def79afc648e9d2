"""Loop-closure integration: a deterministic revisit sequence MUST fire
detection, the pose-scale solve must write back, and the reconciliation
protocol must hold (hard asserts — round-2 verdict #4)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.io.dataset import SyntheticInterface
from tests.test_slam_e2e import tiny_system


class OutAndBack(SyntheticInterface):
    """Moves right then returns to the start view — the final frame sees
    EXACTLY the first frame's view, so a revisit is guaranteed."""

    def frames(self):
        from sage_slam_tpu.io.dataset import FrameRecord

        n_half = self.n // 2
        for i in range(self.n):
            j = i if i < n_half else (self.n - 1 - i)
            ox = int(j * self.motion * self.w)
            oy = int(j * self.motion * self.h * 0.5)
            img = self.texture[:, oy : oy + self.h, ox : ox + self.w]
            yield FrameRecord(float(i), img.copy())


def build_vocab_for(system, data):
    """Train a tiny vocabulary from the first frame's descriptors."""
    from sage_slam_tpu.loop import vocabulary

    rec = next(iter(data.frames()))
    fr = system.mapper.build_frame(rec.timestamp, jnp.asarray(rec.image))
    desc = np.array(fr.feat_desc_flat)
    voc = vocabulary.build_vocabulary(desc[::3], k=4, levels=2, seed=0)
    return voc


def _relaxed_loop_cfg(cfg, **overrides):
    base = dict(
        global_active_window=3,
        min_desc_inlier_ratio=0.0,
        min_area_ratio=0.0,
        min_inlier_ratio=0.0,
        global_sim_ratio=0.0,
    )
    base.update(overrides)
    return dc.replace(cfg, loop=dc.replace(cfg.loop, **base))


def _run_out_and_back(system, data):
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    return system


def test_loop_detection_and_closure():
    system, _ = tiny_system(num_frames=12, max_keyframes=16)
    data = OutAndBack(
        num_frames=12, height=32, width=40, seed=0, motion_scale=0.03
    )
    from sage_slam_tpu.loop import vocabulary

    voc = build_vocab_for(system, data)
    system.voc = voc
    system.bow_db = vocabulary.BowDatabase(voc, system.cfg.max_keyframes)
    _run_out_and_back(system, data)

    k = system.store.num_active
    assert k >= 6

    # BoW similarity: last keyframe (same view as first) vs first
    from sage_slam_tpu.loop.vocabulary import score_l1

    s_first_last = float(
        score_l1(system.bow_db.vectors[k - 1], system.bow_db.vectors[0])
    )
    mid = k // 2
    s_first_mid = float(
        score_l1(system.bow_db.vectors[mid], system.bow_db.vectors[0])
    )
    assert s_first_last > s_first_mid  # revisited view scores higher

    system.cfg = _relaxed_loop_cfg(system.cfg)
    loops = system.detect_global_loop(k - 1)
    # HARD assert: the relaxed gates + guaranteed revisit must detect
    assert loops, "global loop detection failed on a guaranteed revisit"

    pre_links = {tuple(sorted((a, b))) for a in system.store.links
                 for b in system.store.links[a]}
    system.close_global_loops(k - 1, loops)
    # write-back happened: reinitialize counts bumped for in-graph KFs
    assert system.store.reinitialize_count.sum() > 0
    assert system.store.reinitialize_count[k - 1] > 0
    # the loop link was recorded as a global loop link
    assert system.store.global_loop_links
    post_links = {tuple(sorted((a, b))) for a in system.store.links
                  for b in system.store.links[a]}
    assert post_links > pre_links
    for i in range(k):
        assert np.all(
            np.isfinite(np.array(system.store.variables.pose.trans[i]))
        )
        assert float(system.store.variables.scale[i]) > 0

    # reconciliation: the reinitialized keyframes must be FROZEN for the
    # next mapping step (df_work.cpp:62-69 / mapper.cpp:1164 analog) ...
    frozen = np.flatnonzero(system.store.reinitialize_count > 0)
    poses_before = np.array(system.store.variables.pose.trans)
    err = system.mapper.mapping_step()
    assert np.isfinite(err)
    poses_after = np.array(system.store.variables.pose.trans)
    np.testing.assert_allclose(
        poses_after[frozen], poses_before[frozen], atol=1e-6
    )
    # ... and released afterwards
    assert system.store.reinitialize_count.sum() == 0
    err2 = system.mapper.mapping_step()
    assert np.isfinite(err2)


def _set_out_and_back_gt_poses(system, data, scale=0.1):
    """Overwrite keyframe poses with the sequence's ground-truth-shaped
    trajectory (the weak synthetic texture tracks to near-identity poses,
    which would zero the temporal-distance baseline by accident — the
    POSE GATES under test need real distances; matching/tracking below
    still runs on the actual images)."""
    from sage_slam_tpu.geometry.se3 import SE3
    from sage_slam_tpu.mapping.keyframe_store import set_row
    from sage_slam_tpu.solver.graph import Variables

    k = system.store.num_active
    n_half = data.n // 2
    v = system.store.variables
    rot, trans = v.pose.rot, v.pose.trans
    for i in range(k):
        j = i if i < n_half else (data.n - 1 - i)
        t = jnp.asarray(
            [j * data.motion * data.w * scale,
             j * data.motion * data.h * 0.5 * scale, 0.0],
            jnp.float32,
        )
        trans = set_row(trans, i, t)
    system.store.variables = Variables(
        pose=SE3(rot, trans), code=v.code, scale=v.scale
    )


def test_local_loop_detection_fires_on_revisit():
    """The tracking-verified local loop (loop_detector.cpp:268-330) must
    fire on an exact revisit: the candidate (first keyframe) sees the
    same view as the query, so every metric beats the temporal baseline
    scaled by local_metric_ratio."""
    system, _ = tiny_system(num_frames=10, max_keyframes=16)
    data = OutAndBack(
        num_frames=10, height=32, width=40, seed=1, motion_scale=0.03
    )
    _run_out_and_back(system, data)
    k = system.store.num_active
    assert k >= 6
    _set_out_and_back_gt_poses(system, data)
    system.cfg = _relaxed_loop_cfg(
        system.cfg,
        local_metric_ratio=0.3,
        local_dist_ratio=100.0,
        local_active_window=32,
    )
    info = system.detect_local_loop(k - 1)
    assert info.detected, "local loop must fire on an exact revisit"
    # the accepted candidate is temporally far (a real loop, not a
    # neighbor; the temporal gate excludes back connections)
    assert abs(info.id_ref - (k - 1)) > (
        system.cfg.keyframe.temporal_max_back_connections
    )


def test_loop_tick_scheduling_searches_all_keyframes():
    """local/global_loop_tick must walk the searched flags newest-first
    until every keyframe has been searched (deepfactors.cpp:1112-1196)."""
    system, _ = tiny_system(num_frames=8, max_keyframes=16)
    data = OutAndBack(
        num_frames=8, height=32, width=40, seed=2, motion_scale=0.03
    )
    from sage_slam_tpu.loop import vocabulary

    voc = build_vocab_for(system, data)
    system.voc = voc
    system.bow_db = vocabulary.BowDatabase(voc, system.cfg.max_keyframes)
    _run_out_and_back(system, data)
    system.cfg = _relaxed_loop_cfg(
        system.cfg, local_metric_ratio=0.3, local_dist_ratio=100.0,
        local_active_window=32,
    )
    k = system.store.num_active
    order = []
    for _ in range(k + 2):
        before = system.store.local_loop_searched.copy()
        system.local_loop_tick()
        newly = np.flatnonzero(system.store.local_loop_searched & ~before)
        if len(newly):
            order.append(int(newly[0]))
    # every keyframe searched exactly once, newest first
    assert sorted(order) == list(range(k))
    assert order == sorted(order, reverse=True)
    assert system.local_loop_tick() is None  # nothing left to search

    for _ in range(k + 2):
        system.global_loop_tick()
    assert system.store.global_loop_searched[:k].all()
