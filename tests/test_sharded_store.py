"""Keyframe-sharded mapping step (round-3 verdict #5): per-device HBM
scales down with the mesh, and the boundary-exchange compact step
matches the single-device compact solve."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sage_slam_tpu.config import MapperConfig
from sage_slam_tpu.parallel import sharded_store
from sage_slam_tpu.solver import ba
from tests.test_ba import build_problem, perturbed_vars


def _compact_inputs(problem, pyr, k, kc_ids):
    ids = jnp.asarray(kc_ids, jnp.int32)
    pad_valid = jnp.ones(len(kc_ids))
    return ids, pad_valid


def test_sharded_window_step_matches_single_device():
    k, cs = 6, 4
    problem, pyr = build_problem(k=k, cs=cs)
    problem = ba.prepare_problem(problem, pyr)
    cfg = MapperConfig()
    v0 = perturbed_vars(k, cs)

    # compact set = keyframes 1..4 (a window strictly inside the map)
    ids_list = [1, 2, 3, 4]
    ids, pad_valid = _compact_inputs(problem, pyr, k, ids_list)
    id_map = {kf: c for c, kf in enumerate(ids_list)}
    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    edges = ba.EdgeTable(
        i0=jnp.asarray([id_map[a] for a, _ in pairs], jnp.int32),
        i1=jnp.asarray([id_map[b] for _, b in pairs], jnp.int32),
        valid=jnp.ones(len(pairs)),
    )
    pr = problem.priors
    priors_c = ba.PriorTable(
        code_valid=pr.code_valid[jnp.asarray(ids_list)],
        scale_valid=pr.scale_valid[jnp.asarray(ids_list)],
        scale_init=pr.scale_init[jnp.asarray(ids_list)],
        pose_valid=pr.pose_valid[jnp.asarray(ids_list)],
        pose_target=jax.tree.map(
            lambda x: x[jnp.asarray(ids_list)], pr.pose_target
        ),
    )
    umask = jnp.ones(len(ids_list)).at[0].set(0.0)  # one frozen row

    # single-device reference: the compact problem solved directly
    compact = ba.compact_problem_keyframes(problem, ids, pad_valid, pyr)
    v_c = jax.tree.map(lambda x: x[ids], v0)
    v_ref, err_ref, it_ref, _ = ba.run_ba(
        v_c, compact._replace(photo_edges=edges, geo_edges=edges,
                              priors=priors_c),
        pyr, cfg, umask, max_iters=3,
    )

    for n_dev in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:n_dev]), (sharded_store.AXIS,))
        win_sh = sharded_store.shard_window(problem.window, mesh)
        v_out, err, iters, _ = sharded_store.sharded_window_run_ba(
            v0, win_sh, edges, edges, None, priors_c, ids, pad_valid,
            umask, pyr, cfg, mesh, max_iters=3,
        )
        np.testing.assert_allclose(
            float(err), float(err_ref), rtol=5e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.array(v_out.pose.trans[jnp.asarray(ids_list)]),
            np.array(v_ref.pose.trans),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.array(v_out.scale[jnp.asarray(ids_list)]),
            np.array(v_ref.scale), rtol=1e-4, atol=1e-6,
        )
        # rows outside the compact set keep their input values
        np.testing.assert_allclose(
            np.array(v_out.pose.trans[0]), np.array(v0.pose.trans[0]),
            atol=0,
        )


def test_sharded_window_memory_scales_down():
    """The store tables' per-device bytes shrink ~1/n on the mesh (the
    point of sharding the keyframe axis; BASELINE north star)."""
    k, cs = 8, 4
    problem, pyr = build_problem(k=k, cs=cs)
    problem = ba.prepare_problem(problem, pyr)
    acct = sharded_store.store_bytes_per_device(problem.window, 8)
    assert acct["sharded_bytes_per_device"] <= acct["replicated_bytes"] // 7

    mesh = Mesh(np.array(jax.devices()[:8]), (sharded_store.AXIS,))
    win_sh = sharded_store.shard_window(problem.window, mesh)
    # actual addressable shard of the biggest table is 1/8 of the global
    for name in ("feat_pyr", "grad_pyr", "packed_fg", "bias_flat"):
        arr = getattr(win_sh, name)
        shard = arr.addressable_shards[0].data
        assert shard.size * 8 == arr.size, name
