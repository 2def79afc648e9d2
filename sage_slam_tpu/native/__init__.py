"""Native C++ runtime bindings (ctypes).

Compiles pipeline.cpp to a shared library on first use (cached next to
the source) and exposes:

* Runtime / Worker — rate-controlled OS threads for the mapping / loop
  backends (the reference's pthread architecture,
  deepfactors.cpp:1495-1505),
* TaskQueue — blocking work queue,
* native tic/toc profiler,
* convex_hull_area / median — hot host-side math.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pipeline.cpp")
_SO = os.path.join(_HERE, "libslamrt.so")

_lib = None
_lib_lock = threading.Lock()

_TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


def _build():
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.rt_create.restype = ctypes.c_void_p
        lib.rt_destroy.argtypes = [ctypes.c_void_p]
        lib.rt_spawn_worker.restype = ctypes.c_void_p
        lib.rt_spawn_worker.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, _TASK_FN, ctypes.c_void_p,
            ctypes.c_double,
        ]
        lib.rt_stop_worker.argtypes = [ctypes.c_void_p]
        lib.rt_stop_all.argtypes = [ctypes.c_void_p]
        lib.rt_join_all.argtypes = [ctypes.c_void_p]
        lib.rt_queue_create.restype = ctypes.c_void_p
        lib.rt_queue_destroy.argtypes = [ctypes.c_void_p]
        lib.rt_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rt_queue_pop.restype = ctypes.c_int64
        lib.rt_queue_pop.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rt_queue_size.restype = ctypes.c_int64
        lib.rt_queue_size.argtypes = [ctypes.c_void_p]
        lib.rt_queue_close.argtypes = [ctypes.c_void_p]
        lib.rt_prof_enable.argtypes = [ctypes.c_int]
        lib.rt_tic.argtypes = [ctypes.c_char_p]
        lib.rt_toc.argtypes = [ctypes.c_char_p]
        lib.rt_prof_report.restype = ctypes.c_int64
        lib.rt_prof_report.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.rt_convex_hull_area.restype = ctypes.c_double
        lib.rt_convex_hull_area.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.rt_median.restype = ctypes.c_float
        lib.rt_median.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _lib = lib
        return lib


class Runtime:
    """Owns native worker threads. Callbacks are Python callables invoked
    from C++ threads (ctypes handles GIL acquisition)."""

    def __init__(self):
        self._lib = load()
        self._h = self._lib.rt_create()
        self._keepalive = []  # prevent GC of CFUNCTYPE wrappers

    def spawn(self, name: str, fn, frequency_hz: float = 0.0):
        cb = _TASK_FN(lambda ctx: fn())
        self._keepalive.append(cb)
        return self._lib.rt_spawn_worker(
            self._h, name.encode(), cb, None, frequency_hz
        )

    def stop_worker(self, handle):
        self._lib.rt_stop_worker(handle)

    def stop_all(self):
        self._lib.rt_stop_all(self._h)

    def join_all(self):
        self._lib.rt_join_all(self._h)

    def close(self):
        if self._h:
            self._lib.rt_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class TaskQueue:
    def __init__(self):
        self._lib = load()
        self._h = self._lib.rt_queue_create()

    def push(self, item: int):
        self._lib.rt_queue_push(self._h, item)

    def pop(self, timeout_ms: int = 100) -> int:
        return self._lib.rt_queue_pop(self._h, timeout_ms)

    def __len__(self):
        return self._lib.rt_queue_size(self._h)

    def close(self):
        self._lib.rt_queue_close(self._h)


def prof_enable(on: bool = True):
    load().rt_prof_enable(1 if on else 0)


def tic(name: str):
    load().rt_tic(name.encode())


def toc(name: str):
    load().rt_toc(name.encode())


def prof_report() -> str:
    buf = ctypes.create_string_buffer(65536)
    n = load().rt_prof_report(buf, len(buf))
    return buf.value.decode()


def convex_hull_area(points: np.ndarray) -> float:
    pts = np.ascontiguousarray(points, np.float32)
    return load().rt_convex_hull_area(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts)
    )


def median(values: np.ndarray) -> float:
    v = np.ascontiguousarray(values, np.float32)
    return load().rt_median(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v)
    )
