"""Real thread overlap between frontend and backends (round-2 verdict #2).

The reference runs mapping + loop detection concurrently with tracking
(deepfactors.cpp:1495-1505) guarded by per-keyframe shared_mutexes
(frame.h:98) and the reinitialize protocol (mapper.cpp:1164). The TPU
design replaces those with snapshot-solve-merge: backends snapshot the
store under a short lock, solve with the lock released, and merge with
per-row version checks. These tests hold a solve mid-flight (via the
solve hooks) and drive the frontend through it.
"""

import threading
import time

import jax.numpy as jnp
import numpy as np

from tests.test_slam_e2e import tiny_system
from tests.test_slam_loop import (
    OutAndBack,
    _relaxed_loop_cfg,
    _run_out_and_back,
    build_vocab_for,
)


def _grown_system(n_frames=6, max_keyframes=16):
    system, data = tiny_system(num_frames=n_frames + 2,
                               max_keyframes=max_keyframes)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:n_frames]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    return system, frames


def test_mapping_solve_overlaps_frontend():
    """While mapping_step is mid-solve (store lock RELEASED), the
    frontend must complete a full process_frame INCLUDING keyframe
    creation — and the merge must not clobber the keyframe that arrived
    during the solve (no lost update)."""
    system, frames = _grown_system(n_frames=5)
    # warm every jit at the current shape bucket so the overlapped
    # frame is pure execution, not compilation
    system.mapper.mapping_step()

    in_solve = threading.Event()
    release = threading.Event()

    def hook():
        in_solve.set()
        assert release.wait(timeout=60), "test deadlock"

    system.mapper.solve_hook = hook
    t = threading.Thread(target=system.mapper.mapping_step)
    t.start()
    try:
        assert in_solve.wait(timeout=60)
        # mapping is mid-solve NOW; the frontend must not block on it
        t0 = time.time()
        system.force_keyframe = True
        res = system.process_frame(
            frames[5].timestamp, jnp.asarray(frames[5].image)
        )
        dt_frontend = time.time() - t0
        assert res.new_keyframe, "frontend stalled by the mapping solve"
        new_id = res.keyframe_id
        trans_mid = np.array(system.store.pose(new_id).trans)
        scale_mid = float(system.store.variables.scale[new_id])
    finally:
        release.set()
        t.join(timeout=120)
    assert not t.is_alive()

    # no lost update: the mid-solve keyframe keeps its enqueue values
    # bit-identically (merge_variables keeps rows >= snapshot n)
    np.testing.assert_array_equal(
        np.array(system.store.pose(new_id).trans), trans_mid
    )
    assert float(system.store.variables.scale[new_id]) == scale_mid
    # and the frontend latency was real work, not lock-wait: the solve
    # was held indefinitely, yet the frame completed
    assert dt_frontend < 60.0


def test_merge_keeps_rows_rewritten_during_solve():
    """A row rewritten while the mapping solve is in flight (the loop
    closure write-back path bumps store.version) must survive the merge
    — the mapper.cpp:1164 'loop closure wins' rule."""
    system, _ = _grown_system(n_frames=5)
    system.mapper.mapping_step()  # warm-up

    sentinel = np.array([7.0, -3.0, 2.0], np.float32)

    def hook():
        # emulate a concurrent loop-closure write-back on row 0
        from sage_slam_tpu.geometry.se3 import SE3
        from sage_slam_tpu.mapping.keyframe_store import set_row
        from sage_slam_tpu.solver.graph import Variables

        with system.store.lock:
            v = system.store.variables
            system.store.variables = Variables(
                pose=SE3(
                    v.pose.rot,
                    set_row(v.pose.trans, 0, jnp.asarray(sentinel)),
                ),
                code=v.code,
                scale=v.scale,
            )
            system.store.version[0] += 1

    system.mapper.solve_hook = hook
    err = system.mapper.mapping_step(full=True)  # row 0 free in the solve
    assert np.isfinite(err)
    np.testing.assert_array_equal(
        np.array(system.store.pose(0).trans), sentinel
    )


def test_propagate_newer_keyframe_during_pose_graph_solve():
    """A keyframe ARRIVING during the pose-scale graph solve must be
    rigidly propagated with scaled translation at write-back
    (deepfactors.cpp:336-385) and reinitialized for the mapper."""
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
    system.cfg = _relaxed_loop_cfg(system.cfg)
    loops = system.detect_global_loop(k - 1)
    assert loops, "guaranteed revisit must detect"

    extra = list(data.frames())[1]
    captured = {}

    def hook():
        # the frontend lands a keyframe while the solve is in flight
        system.force_keyframe = True
        res = system.process_frame(
            extra.timestamp + 100.0, jnp.asarray(extra.image)
        )
        assert res.new_keyframe
        nid = res.keyframe_id
        captured["id"] = nid
        captured["pose_rot"] = np.array(system.store.pose(nid).rot)
        captured["pose_trans"] = np.array(system.store.pose(nid).trans)
        captured["scale"] = float(system.store.variables.scale[nid])
        # pre-update pose of the would-be last in-graph keyframe
        captured["last_rot"] = np.array(system.store.pose(k - 1).rot)
        captured["last_trans"] = np.array(system.store.pose(k - 1).trans)
        captured["last_scale"] = float(
            system.store.variables.scale[k - 1]
        )

    system._loop_solve_hook = hook
    system.close_global_loops(k - 1, loops)
    assert "id" in captured
    nid = captured["id"]
    assert nid == k  # created during the solve

    # the newer keyframe was touched by the write-back
    assert system.store.reinitialize_count[nid] > 0

    # rigid+scaled propagation identity: the relative pose to the last
    # in-graph keyframe is preserved with translation scaled by the
    # last keyframe's scale ratio (deepfactors.cpp:336-385)
    def rel(r_a, t_a, r_b, t_b):
        # b expressed in a: a^-1 b
        r = r_a.T @ r_b
        t = r_a.T @ (t_b - t_a)
        return r, t

    last_rot_new = np.array(system.store.pose(k - 1).rot)
    last_trans_new = np.array(system.store.pose(k - 1).trans)
    last_scale_new = float(system.store.variables.scale[k - 1])
    nid_rot_new = np.array(system.store.pose(nid).rot)
    nid_trans_new = np.array(system.store.pose(nid).trans)
    ratio = last_scale_new / captured["last_scale"]

    r_before, t_before = rel(
        captured["last_rot"], captured["last_trans"],
        captured["pose_rot"], captured["pose_trans"],
    )
    r_after, t_after = rel(
        last_rot_new, last_trans_new, nid_rot_new, nid_trans_new
    )
    np.testing.assert_allclose(r_after, r_before, atol=1e-5)
    np.testing.assert_allclose(t_after, t_before * ratio, atol=1e-5)
    # scale propagated by the same ratio
    np.testing.assert_allclose(
        float(system.store.variables.scale[nid]),
        captured["scale"] * ratio,
        rtol=1e-5,
    )


def test_threaded_driver_runs_without_global_lock():
    """End-to-end smoke: the native-threaded driver (mapping + loop
    workers live) must complete a sequence with finite state — the
    backends now overlap the frontend with snapshot merges."""
    from sage_slam_tpu.frontend.driver import SlamDriver

    system, _ = tiny_system(num_frames=10, max_keyframes=16)
    data = OutAndBack(
        num_frames=10, height=32, width=40, seed=3, motion_scale=0.03
    )
    driver = SlamDriver(system, use_native_threads=True)
    try:
        driver.run(data)
    except Exception:
        driver.stop()
        raise
    assert len(system.trajectory) == 10
    for _, pose in system.trajectory:
        assert np.all(np.isfinite(np.array(pose.trans)))
    assert system.store.num_active >= 2


def test_driver_drains_loop_search_before_refine():
    """Keyframes created on the last frames must still be loop-searched:
    the driver drains both loop backends after stopping the workers and
    before the final refinement (the reference joins its loop threads
    only after RefineMapping, live_demo.cpp:252-257). Regression for the
    end-of-run race that silently disabled final-revisit closures."""
    from sage_slam_tpu.frontend.driver import SlamDriver
    from sage_slam_tpu.loop import vocabulary

    system, _ = tiny_system(num_frames=10, max_keyframes=16)
    data = OutAndBack(
        num_frames=10, height=32, width=40, seed=5, motion_scale=0.03
    )
    voc = build_vocab_for(system, data)
    system.voc = voc
    system.bow_db = vocabulary.BowDatabase(voc, system.cfg.max_keyframes)
    # workers disabled entirely: without the drain, NOTHING would search
    driver = SlamDriver(system, use_native_threads=False)
    driver.run(data)
    n = system.store.num_active
    assert n >= 2
    assert system.store.local_loop_searched[:n].all()
    assert system.store.global_loop_searched[:n].all()
