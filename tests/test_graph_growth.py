"""Bounded mapping-step cost as the factor graph grows (round-2 verdict #3)
and work-item iteration budgets / factor retirement (df_work.cpp:120-136).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.solver import ba

from tests.test_slam_e2e import tiny_system


def _grow(system, data, n_frames):
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:n_frames]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    return system


def test_windowed_problem_is_bounded():
    """build_problem(window_lo) must select only edges incident to the
    window, so the linearized edge count is independent of total graph
    size."""
    system, data = tiny_system(num_frames=8, max_keyframes=8)
    _grow(system, data, 8)
    mp = system.mapper
    n = system.store.num_active
    assert n >= 6
    total = len(mp.photo_edges)
    lo = n - 2
    ph_sel, ge_sel, rp_sel = mp._active_edge_selection(lo)
    assert 0 < len(ph_sel) < total
    for i in ph_sel:
        a, b = mp.photo_edges[i]
        assert a >= lo or b >= lo
    # edges NOT selected are frozen-frozen
    dropped = set(range(total)) - set(ph_sel)
    for i in dropped:
        a, b = mp.photo_edges[i]
        assert a < lo and b < lo


def test_windowed_step_matches_full_edges_step():
    """Dropping frozen-frozen edges must not change the solution: they
    only touch masked-out rows/cols of the damped system and add a
    constant to both sides of the LM accept test."""
    system, data = tiny_system(num_frames=8, max_keyframes=8)
    _grow(system, data, 8)
    mp = system.mapper
    n = system.store.num_active
    w = mp.cfg.mapper.window_size  # 4 in the tiny config
    lo = max(0, n - w)
    umask = jnp.zeros(system.store.capacity).at[lo:n].set(1.0)

    full_problem = mp.build_problem(window_lo=0)
    win_problem = mp.build_problem(window_lo=lo)
    assert (
        win_problem.photo_edges.i0.shape[0]
        <= full_problem.photo_edges.i0.shape[0]
    )

    v_full, err_full, _, _ = ba.run_ba(
        system.store.variables, full_problem, mp.cam_pyr, mp.cfg.mapper,
        umask, max_iters=3,
    )
    v_win, err_win, _, _ = ba.run_ba(
        system.store.variables, win_problem, mp.cam_pyr, mp.cfg.mapper,
        umask, max_iters=3,
    )
    np.testing.assert_allclose(
        np.array(v_full.pose.trans), np.array(v_win.pose.trans), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(v_full.code), np.array(v_win.code), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(v_full.scale), np.array(v_win.scale), atol=1e-5
    )


def test_factor_retirement():
    """Edges whose iteration budget is exhausted are removed from the
    graph (OptimizeWork countdown, df_work.cpp:120-136)."""
    system, data = tiny_system(num_frames=6, max_keyframes=8)
    # shrink the budget so retirement fires within one mapping step
    system.cfg = dataclasses.replace(
        system.cfg,
        mapper=dataclasses.replace(system.cfg.mapper, factor_iters=2),
    )
    system.mapper.cfg = system.cfg
    _grow(system, data, 4)
    mp = system.mapper
    assert len(mp.photo_edges) > 0
    n_before = len(mp.photo_edges)
    mp.mapping_step(max_iters=3)  # spends >= budget on every live edge
    assert len(mp.photo_edges) < n_before
    assert len(mp.photo_edge_iters) == len(mp.photo_edges)
    assert len(mp.geo_edge_iters) == len(mp.geo_edges)
    # a later step with no live edges must not crash
    mp.mapping_step(max_iters=1)


def test_full_step_frees_all_keyframes():
    """refine_mapping's full mode must optimize every active keyframe."""
    system, data = tiny_system(num_frames=6, max_keyframes=8)
    _grow(system, data, 6)
    err = system.refine_mapping(1)
    assert np.isfinite(err)


def test_aux_frame_pose_only():
    """A non-keyframe refinement frame enters the window as a pose-only
    variable (AuxPoseKey, gtsam_utils.h:10, df_work.cpp:41): BA moves its
    pose but leaves its code and scale frozen, while regular keyframes
    keep optimizing all blocks."""
    import jax

    from sage_slam_tpu.geometry import se3 as se3m

    system, data = tiny_system(num_frames=6, max_keyframes=8)
    _grow(system, data, 4)
    mp = system.mapper
    store = system.store
    ref_id = store.num_active - 1

    # a frame near the last keyframe with a perturbed initial pose
    rec = list(data.frames())[4]
    guess = se3m.retract(
        store.pose(ref_id), jnp.asarray([0.01, -0.005, 0.0, 0.0, 0.0, 0.01])
    )
    fr = mp.build_frame(rec.timestamp, jnp.asarray(rec.image), pose=guess)
    fid = mp.enqueue_frame(fr, ref_id)
    assert store.aux[fid]
    assert (ref_id, fid) in mp.photo_edges
    # one-way only: the frame is never a photometric source
    assert (fid, ref_id) not in mp.photo_edges

    code0 = np.array(store.variables.code[fid])
    scale0 = float(store.variables.scale[fid])
    trans0 = np.array(store.variables.pose.trans[fid])
    kf_code0 = np.array(store.variables.code[ref_id])

    err = mp.mapping_step(max_iters=3)
    assert np.isfinite(err)

    # frozen blocks of the aux frame did not move
    np.testing.assert_array_equal(np.array(store.variables.code[fid]), code0)
    assert float(store.variables.scale[fid]) == scale0
    # its pose DID move (the photometric factor pulls it)
    assert np.abs(np.array(store.variables.pose.trans[fid]) - trans0).max() > 0
    # a regular keyframe still optimizes its code
    assert np.abs(np.array(store.variables.code[ref_id]) - kf_code0).max() > 0


def test_refine_mapping_converges_early():
    """RefineMapping must stop once the full-graph LM's relinearization
    thresholds fire on an already-converged map (round-2 verdict #6;
    live_demo.cpp:252-257 iterates only while something relinearizes)."""
    system, data = tiny_system(num_frames=6, max_keyframes=8)
    _grow(system, data, 6)
    # converge the map first with a generous budget
    system.refine_mapping(6)
    # a second refine on the converged map must exit early: with loose
    # thresholds the very first accepted step's delta is sub-threshold
    budget = system.cfg.mapper.max_gn_iters  # per-step LM budget
    # frozen dataclass: rebuild the config with loose thresholds
    system.mapper.cfg = dataclasses.replace(
        system.cfg,
        mapper=dataclasses.replace(
            system.cfg.mapper,
            relin_param_inc_thresh=1.0,
            relin_grad_thresh=1e-12,
        ),
    )
    system.cfg = system.mapper.cfg
    system.mapper._ba_cache.clear()  # thresholds are baked into the jit
    system.refine_mapping(4)
    assert system.mapper.last_step_converged
    # the convergence check fired before exhausting the LM budget of the
    # final step, and refine stopped after that one converged step
    assert system.refine_iterations < 4 * budget
