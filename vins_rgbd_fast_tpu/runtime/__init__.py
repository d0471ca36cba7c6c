"""Native (C++) host runtime: build-on-demand ctypes bindings.

The compute path is JAX/XLA; the host dataflow around it (message ring
buffers, stamp pairing, rate gates, IMU interval assembly, rosbag decoding)
is implemented natively in ``csrc/`` — the same division of labor as the
reference, whose runtime is the C++ nodelet layer.  Python fallbacks in
``io/stream.py`` keep the framework importable before the first build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_DIR, "csrc")
_BUILD = os.path.join(_DIR, "build")


def _build(name: str, src: str) -> Optional[str]:
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, name)
    src_path = os.path.join(_CSRC, src)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src_path):
        return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src_path, "-o", out],
            check=True, capture_output=True, timeout=240,
        )
        return out
    except Exception:
        return None


_stream_lib = None
_bag_lib = None


def stream_lib() -> Optional[ctypes.CDLL]:
    global _stream_lib
    if _stream_lib is None:
        path = _build("libvins_runtime.so", "stream_runtime.cpp")
        if path:
            lib = ctypes.CDLL(path)
            lib.vins_stream_create.restype = ctypes.c_void_p
            lib.vins_stream_create.argtypes = [ctypes.c_double] * 4
            lib.vins_stream_destroy.argtypes = [ctypes.c_void_p]
            lib.vins_stream_push_image.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_int64]
            lib.vins_stream_push_depth.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_int64]
            lib.vins_stream_push_imu.restype = ctypes.c_int
            lib.vins_stream_push_imu.argtypes = [
                ctypes.c_void_p, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ]
            lib.vins_stream_imu_available.restype = ctypes.c_int
            lib.vins_stream_imu_available.argtypes = [ctypes.c_void_p, ctypes.c_double]
            lib.vins_stream_next_frame.restype = ctypes.c_int
            lib.vins_stream_next_frame.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.vins_stream_collect_interval.restype = ctypes.c_int
            lib.vins_stream_collect_interval.argtypes = [
                ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            _stream_lib = lib
        else:
            _stream_lib = False
    return _stream_lib or None


def bag_lib() -> Optional[ctypes.CDLL]:
    global _bag_lib
    if _bag_lib is None:
        path = _build("libvins_bag.so", "bag_reader.cpp")
        if path:
            lib = ctypes.CDLL(path)
            lib.vins_bag_open.restype = ctypes.c_void_p
            lib.vins_bag_open.argtypes = [ctypes.c_char_p]
            lib.vins_bag_error.restype = ctypes.c_char_p
            lib.vins_bag_error.argtypes = [ctypes.c_void_p]
            lib.vins_bag_num_messages.restype = ctypes.c_int
            lib.vins_bag_num_messages.argtypes = [ctypes.c_void_p]
            lib.vins_bag_num_connections.restype = ctypes.c_int
            lib.vins_bag_num_connections.argtypes = [ctypes.c_void_p]
            lib.vins_bag_connection.restype = ctypes.c_int
            lib.vins_bag_connection.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.vins_bag_message_info.restype = ctypes.c_int
            lib.vins_bag_message_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ]
            lib.vins_bag_message_data.restype = ctypes.c_int
            lib.vins_bag_message_data.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            lib.vins_bag_close.argtypes = [ctypes.c_void_p]
            _bag_lib = lib
        else:
            _bag_lib = False
    return _bag_lib or None


class NativeStreamRuntime:
    """ctypes front for the C++ stream runtime (drop-in for StreamPairer +
    the estimator's IMU interval assembly)."""

    def __init__(self, frontend_freq=20.0, publish_freq=10.0,
                 pair_tol=0.003, gap_reset=1.0):
        lib = stream_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable (g++ build failed)")
        self._lib = lib
        self._ctx = lib.vins_stream_create(frontend_freq, publish_freq,
                                           pair_tol, gap_reset)
        self._payloads: dict = {}
        self._next_id = 0

    def __del__(self):
        try:
            self._lib.vins_stream_destroy(self._ctx)
        except Exception:
            pass

    def _store(self, arr) -> int:
        pid = self._next_id
        self._next_id += 1
        self._payloads[pid] = arr
        return pid

    def push_image(self, t: float, image):
        self._lib.vins_stream_push_image(self._ctx, t, self._store(image))

    def push_depth(self, t: float, depth):
        self._lib.vins_stream_push_depth(self._ctx, t, self._store(depth))

    def push_imu(self, t: float, acc, gyr) -> bool:
        a = np.ascontiguousarray(acc, np.float64)
        g = np.ascontiguousarray(gyr, np.float64)
        return bool(self._lib.vins_stream_push_imu(
            self._ctx, t,
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ))

    def imu_available(self, t: float) -> bool:
        return bool(self._lib.vins_stream_imu_available(self._ctx, t))

    def next_frame(self):
        t = ctypes.c_double()
        ip = ctypes.c_int64()
        dp = ctypes.c_int64()
        pub = ctypes.c_int()
        rst = ctypes.c_int()
        ok = self._lib.vins_stream_next_frame(
            self._ctx, ctypes.byref(t), ctypes.byref(ip), ctypes.byref(dp),
            ctypes.byref(pub), ctypes.byref(rst),
        )
        if not ok:
            return None
        img = self._payloads.pop(ip.value)
        dep = self._payloads.pop(dp.value)
        return dict(t=t.value, image=img, depth=dep,
                    publish=bool(pub.value), reset=bool(rst.value))

    def collect_interval(self, t0: float, t1: float, maxi: int):
        dts = np.zeros(maxi, np.float64)
        acc = np.zeros((maxi + 1, 3), np.float64)
        gyr = np.zeros((maxi + 1, 3), np.float64)
        self._lib.vins_stream_collect_interval(
            self._ctx, t0, t1, maxi,
            dts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            acc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            gyr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return dts, acc, gyr
