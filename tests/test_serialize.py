"""SLAM checkpoint/resume roundtrip."""

import os

import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.io.dataset import SyntheticInterface
from sage_slam_tpu.mapping import serialize
from tests.test_slam_e2e import tiny_system


def test_checkpoint_resume(tmp_path):
    system, data = tiny_system(num_frames=6)
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:4]:
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))

    path = os.path.join(tmp_path, "state.npz")
    serialize.save_state(path, system)

    # fresh system with same config/nets
    system2, _ = tiny_system(num_frames=6)
    serialize.load_state(path, system2)

    assert system2.store.num_active == system.store.num_active
    assert system2.curr_kf == system.curr_kf
    np.testing.assert_allclose(
        np.array(system2.store.variables.pose.trans),
        np.array(system.store.variables.pose.trans),
    )
    assert len(system2.trajectory) == len(system.trajectory)
    assert system2.mapper.photo_edges == system.mapper.photo_edges

    # the resumed system keeps processing frames identically-shaped
    for rec in frames[4:]:
        res = system2.process_frame(rec.timestamp, jnp.asarray(rec.image))
        assert np.all(np.isfinite(np.array(res.pose.trans)))
    # and mapping still runs
    err = system2.mapper.mapping_step()
    assert np.isfinite(err)
