"""Multi-device edge-partitioned BA on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage_slam_tpu.config import MapperConfig
from sage_slam_tpu.parallel import sharded_ba
from sage_slam_tpu.solver import ba
from tests.test_ba import add_reproj_edges, build_problem, perturbed_vars


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    sharded_ba.dryrun(8)


def test_sharded_matches_single_device_with_reproj():
    """The sharded step must optimize the SAME cost as the single-device
    step on a looped map — i.e. including reprojection edges (round-1
    verdict #2: shard_problem used to silently drop them)."""
    from jax.sharding import Mesh

    k, cs = 3, 4
    problem, pyr = build_problem(k=k, cs=cs)
    problem = add_reproj_edges(problem, pyr)
    cfg = MapperConfig()
    v0 = perturbed_vars(k, cs)
    mask = jnp.ones(k)

    v_single, err_single, _, _ = ba.run_ba(
        v0, problem, pyr, cfg, mask, max_iters=4
    )

    mesh = Mesh(np.array(jax.devices()[:4]), (sharded_ba.AXIS,))
    problem_sharded = sharded_ba.shard_problem(problem, mesh)
    v_multi, err_multi, _, _ = sharded_ba.sharded_run_ba(
        v0, problem_sharded, pyr, cfg, mask, mesh, max_iters=4
    )

    np.testing.assert_allclose(
        float(err_single), float(err_multi), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.array(v_single.pose.trans),
        np.array(v_multi.pose.trans),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(v_single.code), np.array(v_multi.code), atol=1e-5
    )
    # the reproj term must actually be in the cost: dropping it changes
    # the sharded result
    problem_noreproj = sharded_ba.shard_problem(
        problem._replace(reproj_edges=None), mesh
    )
    _, err_drop, _, _ = sharded_ba.sharded_run_ba(
        v0, problem_noreproj, pyr, cfg, mask, mesh, max_iters=4
    )
    assert abs(float(err_drop) - float(err_multi)) > 1e-8


def test_sharded_matches_single_device():
    """Edge-sharded LM must produce the same result as single-device LM."""
    from jax.sharding import Mesh

    k, cs = 3, 4
    problem, pyr = build_problem(k=k, cs=cs)
    cfg = MapperConfig()
    v0 = perturbed_vars(k, cs)
    mask = jnp.ones(k)

    v_single, err_single, _, _ = ba.run_ba(
        v0, problem, pyr, cfg, mask, max_iters=4
    )

    mesh = Mesh(np.array(jax.devices()[:4]), (sharded_ba.AXIS,))
    problem_sharded = sharded_ba.shard_problem(problem, mesh)
    v_multi, err_multi, _, _ = sharded_ba.sharded_run_ba(
        v0, problem_sharded, pyr, cfg, mask, mesh, max_iters=4
    )

    # atol: both errors converge to ~0; below f32 noise of the O(1)
    # initial cost they are indistinguishable (reduction order differs
    # between the single-device and psum paths)
    np.testing.assert_allclose(
        float(err_single), float(err_multi), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.array(v_single.pose.trans),
        np.array(v_multi.pose.trans),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(v_single.code), np.array(v_multi.code), atol=1e-5
    )


def test_pad_edges():
    e = ba.EdgeTable(
        jnp.asarray([0, 1, 2], jnp.int32),
        jnp.asarray([1, 2, 0], jnp.int32),
        jnp.ones(3),
    )
    p = sharded_ba.pad_edges(e, 4)
    assert p.i0.shape[0] == 4
    assert float(p.valid[3]) == 0.0


def test_mapper_sharded_mapping_step():
    """mapping_step_sharded produces a finite error on a device mesh."""
    from jax.sharding import Mesh

    from tests.test_slam_e2e import tiny_system

    system, data = tiny_system(num_frames=5)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:4]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    mesh = Mesh(np.array(jax.devices()[:4]), (sharded_ba.AXIS,))
    err = system.mapper.mapping_step_sharded(mesh, max_iters=2)
    assert np.isfinite(err)
    # matches the single-device step starting from the same state


def test_mapping_step_sharded_matches_single_on_looped_map():
    """SlamSystem-level parity (round-2 verdict #5): one code path, two
    execution targets — the sharded mapping step must share the
    window-incident edge selection + retirement with the single-device
    step and produce the same variables on a LOOPED map (with
    reprojection edges from a loop link)."""
    from jax.sharding import Mesh

    from tests.test_slam_e2e import tiny_system

    system, data = tiny_system(num_frames=8, max_keyframes=16)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:7]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    mp = system.mapper
    n = system.store.num_active
    assert n >= 5
    # a loop link with reprojection (match_geom) edges
    mp.enqueue_link(0, n - 1, True, True, True, True)
    assert mp.reproj_edges, "loop link must add reprojection edges"

    # snapshot mutable state so both targets start identically
    v0 = system.store.variables
    version0 = system.store.version.copy()
    reinit0 = system.store.reinitialize_count.copy()
    ph_iters0 = list(mp.photo_edge_iters)
    ge_iters0 = list(mp.geo_edge_iters)
    rp0 = [dict(ed) for ed in mp.reproj_edges]

    err_single = mp.mapping_step(max_iters=3)
    v_single = system.store.variables
    # windowed selection actually dropped frozen-frozen edges
    ph_sel, _, _ = mp._last_selection
    assert len(ph_sel) <= len(mp.photo_edges)

    # restore
    system.store.variables = v0
    system.store.version = version0.copy()
    system.store.reinitialize_count = reinit0.copy()
    mp.photo_edge_iters = list(ph_iters0)
    mp.geo_edge_iters = list(ge_iters0)
    mp.reproj_edges = rp0

    mesh = Mesh(np.array(jax.devices()[:4]), ("e",))
    err_sharded = mp.mapping_step_sharded(mesh, max_iters=3)

    np.testing.assert_allclose(err_sharded, err_single, rtol=1e-4)
    v_sharded = system.store.variables
    np.testing.assert_allclose(
        np.array(v_sharded.pose.trans), np.array(v_single.pose.trans),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(v_sharded.pose.rot), np.array(v_single.pose.rot),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(v_sharded.code), np.array(v_single.code), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(v_sharded.scale), np.array(v_single.scale), atol=1e-5
    )
    # the sharded path ran the same retirement bookkeeping
    assert mp.photo_edge_iters != ph_iters0
