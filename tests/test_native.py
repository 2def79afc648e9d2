"""Native C++ runtime: build, threads, queue, profiler, geometry."""

import time

import numpy as np
import pytest

from sage_slam_tpu import native


def test_build_and_load():
    lib = native.load()
    assert lib is not None


def test_convex_hull_area_matches_python():
    from sage_slam_tpu.tracker.tracker import convex_hull_area as py_hull

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 5, (200, 2)).astype(np.float32)
    a_native = native.convex_hull_area(pts)
    a_py = py_hull(pts)
    assert abs(a_native - a_py) / a_py < 1e-6


def test_median():
    rng = np.random.default_rng(1)
    v = rng.standard_normal(1001).astype(np.float32)
    assert abs(native.median(v) - float(np.median(v))) < 1e-6


def test_task_queue():
    q = native.TaskQueue()
    q.push(42)
    q.push(7)
    assert len(q) == 2
    assert q.pop() == 42
    assert q.pop() == 7
    assert q.pop(timeout_ms=10) == -1  # empty -> timeout


def test_worker_rate_control():
    rt = native.Runtime()
    count = {"n": 0}

    def task():
        count["n"] += 1

    rt.spawn("test", task, frequency_hz=50.0)
    time.sleep(0.35)
    rt.stop_all()
    rt.join_all()
    rt.close()
    # ~17 expected at 50 Hz for 0.35 s; allow wide margin
    assert 5 <= count["n"] <= 40


def test_profiler():
    native.prof_enable(True)
    native.tic("unit")
    time.sleep(0.01)
    native.toc("unit")
    rep = native.prof_report()
    assert "unit" in rep
    native.prof_enable(False)


def test_pipeline_threads_drive_mapping():
    """Reference-shaped wiring: a frontend pushes keyframe ids into the
    native queue; a mapping worker at a fixed rate drains it."""
    rt = native.Runtime()
    q = native.TaskQueue()
    processed = []

    def mapping_backend():
        item = q.pop(timeout_ms=20)
        if item >= 0:
            processed.append(item)

    rt.spawn("mapping", mapping_backend, frequency_hz=100.0)
    for i in range(5):
        q.push(i)
        time.sleep(0.02)
    time.sleep(0.3)
    rt.stop_all()
    rt.join_all()
    rt.close()
    assert processed == [0, 1, 2, 3, 4]
