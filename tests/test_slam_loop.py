"""Loop-closure integration: a sequence that returns to its start must
produce a high-similarity BoW candidate and a runnable pose-scale solve."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.io.dataset import SyntheticInterface
from tests.test_slam_e2e import tiny_system


class OutAndBack(SyntheticInterface):
    """Moves right then returns to the start view."""

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


def test_loop_detection_and_closure():
    system, _ = tiny_system(num_frames=12, max_keyframes=16)
    data = OutAndBack(
        num_frames=12, height=32, width=40, seed=0, motion_scale=0.03
    )
    from sage_slam_tpu.loop import vocabulary

    voc = build_vocab_for(system, data)
    system.voc = voc
    system.bow_db = vocabulary.BowDatabase(voc, system.cfg.max_keyframes)
    # force a keyframe every frame so the active-window gate can pass
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))

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

    # run global loop detection with a small active window so candidates
    # are allowed
    object.__setattr__  # noqa - config is frozen; build a relaxed one
    import dataclasses as dc

    system.cfg = dc.replace(
        system.cfg,
        loop=dc.replace(
            system.cfg.loop,
            global_active_window=3,
            min_desc_inlier_ratio=0.0,
            min_area_ratio=0.0,
            min_inlier_ratio=0.0,
            global_sim_ratio=0.0,
        ),
    )
    loops = system.detect_global_loop(k - 1)
    # mechanics must run; on this self-similar texture a loop should be found
    if loops:
        system.close_global_loops(k - 1, loops)
        # write-back happened: reinitialize counts bumped
        assert system.store.reinitialize_count.sum() > 0
        for i in range(k):
            assert np.all(
                np.isfinite(np.array(system.store.variables.pose.trans[i]))
            )
        # mapping step still runs after the loop write-back
        err = system.mapper.mapping_step()
        assert np.isfinite(err)


def test_local_loop_detection_runs():
    system, _ = tiny_system(num_frames=10, max_keyframes=16)
    data = OutAndBack(
        num_frames=10, height=32, width=40, seed=1, motion_scale=0.03
    )
    frames = list(data.frames())
    system.bootstrap(frames[0].timestamp, jnp.asarray(frames[0].image))
    for rec in frames[1:]:
        system.force_keyframe = True
        system.process_frame(rec.timestamp, jnp.asarray(rec.image))
    info = system.detect_local_loop(system.store.num_active - 1)
    # mechanics run without error; detection is scene-dependent
    assert isinstance(info.detected, bool)
