"""Threaded SLAM driver — the LiveDemo + thread-backend equivalent.

Wires the SlamSystem onto the native C++ runtime the way the reference
wires DeepFactors onto pthreads (live_demo.cpp:52-258,
deepfactors.cpp:1495-1505):

* main thread: frame loop (ProcessFrame),
* mapping worker @ mapping_update_frequency Hz: drains the keyframe
  queue, runs Mapper.mapping_step,
* loop worker @ loop_detection_frequency Hz: local + global loop
  detection on the newest unsearched keyframe, pose-scale graph on
  accepted global loops.

JAX dispatch is thread-safe; device programs serialize on the chip but
host-side orchestration overlaps, matching the reference's design where
one GPU serializes the actual kernels anyway (SURVEY.md §2.4).

Concurrency model (round-3): there is NO driver-level lock. The
backends snapshot the keyframe store under its short internal lock,
solve with the lock released, and merge with per-row version checks
(keyframe_store.py) — so a ~300 ms mapping solve no longer stalls the
frontend, exactly like the reference's mapping pthread running beside
ProcessFrame (deepfactors.cpp:1495-1505, per-KF shared_mutex
frame.h:98).
"""

from __future__ import annotations

from typing import Optional

from .. import native
from ..utils import timing
from .slam import SlamSystem


class SlamDriver:
    def __init__(self, system: SlamSystem, use_native_threads: bool = True):
        self.system = system
        self.use_native = use_native_threads
        self.runtime: Optional[native.Runtime] = None
        self.kf_queue: Optional[native.TaskQueue] = None
        self._running = False

    # ------------------------------------------------------------------

    def start(self):
        """Spawn mapping + loop backends (deepfactors.cpp:1495-1505)."""
        if not self.use_native:
            return
        self.runtime = native.Runtime()
        self.kf_queue = native.TaskQueue()
        m_hz = self.system.cfg.mapper.update_frequency
        l_hz = self.system.cfg.loop.detection_frequency
        self.runtime.spawn("mapping", self._mapping_tick, m_hz)
        self.runtime.spawn("loop", self._loop_tick, l_hz)
        self._running = True

    def stop(self):
        if self.runtime is not None:
            self.kf_queue.close()
            self.runtime.stop_all()
            self.runtime.join_all()
            self.runtime.close()
            self.runtime = None
        self._running = False

    # ------------------------------------------------------------------

    def _mapping_tick(self):
        timing.tic("mapping_tick")
        try:
            if self.system.store.num_active >= 2:
                # snapshot->solve->merge internally; overlaps the frontend
                self.system.mapper.mapping_step()
        finally:
            timing.toc("mapping_tick")

    def _loop_tick(self):
        # drain the wake signal; scheduling itself is flag-driven — each
        # tick searches the NEWEST keyframe not yet searched by that
        # backend (deepfactors.cpp:1112-1196), so keyframes created
        # faster than the loop rate are still searched eventually
        if self.kf_queue is not None:
            self.kf_queue.pop(timeout_ms=50)
        self.system.local_loop_tick()
        self.system.global_loop_tick()

    # ------------------------------------------------------------------

    def run(self, camera_interface, max_frames: Optional[int] = None):
        """The ProcessingLoop (live_demo.cpp:145-258): bootstrap on the
        first frame, process the rest, final RefineMapping."""
        self.start()
        results = []
        try:
            for i, rec in enumerate(camera_interface.frames()):
                if max_frames is not None and i >= max_frames:
                    break
                import jax.numpy as jnp

                img = jnp.asarray(rec.image)
                if self.system.store.num_active == 0:
                    self.system.bootstrap(rec.timestamp, img)
                    continue
                timing.tic("process_frame")
                res = self.system.process_frame(rec.timestamp, img)
                timing.toc("process_frame")
                results.append(res)
                if res.new_keyframe:
                    if self.kf_queue is not None:
                        self.kf_queue.push(res.keyframe_id)
                    if not self.use_native:
                        self.system.mapper.mapping_step()
        finally:
            self.stop()
        # drain the loop backends: the reference joins its loop threads
        # only AFTER the final RefineMapping (live_demo.cpp:252-257), so
        # keyframes created near the end still get searched; with the
        # workers stopped we drain deterministically on this thread —
        # every keyframe is searched exactly once before refinement
        for _ in range(self.system.store.num_active):
            un_l = self.system._newest_unsearched(
                self.system.store.local_loop_searched
            )
            un_g = self.system._newest_unsearched(
                self.system.store.global_loop_searched
            )
            if un_l is None and un_g is None:
                break
            self.system.local_loop_tick()
            self.system.global_loop_tick()
        # final refinement (live_demo.cpp:252-257)
        self.system.refine_mapping()
        return results
