"""ctypes binding to the C++ event engine (csrc/events.cpp).

Auto-builds once via `make -C csrc` when the toolchain is present; every
entry point has a numpy fallback so the framework works without a compiler.
(pybind11 is unavailable in this image; ctypes keeps the binding zero-dep.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "csrc", "build", "libbenerf_events.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO, "csrc")],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        lib.accumulate_events.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(i32),
            ctypes.POINTER(i32), ctypes.POINTER(ctypes.c_float), i64, i32,
        ]
        lib.time_window.argtypes = [
            ctypes.POINTER(ctypes.c_float), i64, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(i64), ctypes.POINTER(i64),
        ]
        lib.prepare_events.restype = i64
        lib.prepare_events.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            i64, i32, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(i32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def accumulate_events(x, y, pol, height: int, width: int) -> np.ndarray:
    """Deterministic polarity scatter-add -> (H, W) float64."""
    lib = _load()
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    pol = np.ascontiguousarray(pol, np.float32)
    if lib is None:
        out = np.zeros((height, width), np.float64)
        np.add.at(out, (y.astype(np.int64), x.astype(np.int64)), pol)
        return out
    out = np.zeros((height, width), np.float64)
    lib.accumulate_events(
        _ptr(out, ctypes.c_double), _ptr(x, ctypes.c_int32),
        _ptr(y, ctypes.c_int32), _ptr(pol, ctypes.c_float),
        np.int64(len(x)), np.int32(width),
    )
    return out


def time_window(ts: np.ndarray, t0: float, t1: float):
    """(lo, hi) index range with t0 <= ts <= t1 over a sorted array."""
    lib = _load()
    ts = np.ascontiguousarray(ts, np.float32)
    if lib is None:
        return (
            int(np.searchsorted(ts, t0, "left")),
            int(np.searchsorted(ts, t1, "right")),
        )
    lo = ctypes.c_int64()
    hi = ctypes.c_int64()
    lib.time_window(
        _ptr(ts, ctypes.c_float), np.int64(len(ts)),
        ctypes.c_float(t0), ctypes.c_float(t1),
        ctypes.byref(lo), ctypes.byref(hi),
    )
    return int(lo.value), int(hi.value)


def prepare_events(x, y, t, p, width: int, t_lo: float, t_hi: float):
    """Filter to [t_lo, t_hi], normalize ts, flatten pixels, sort by time.

    Returns (pix_idx int32, ts float32 in [0,1], pol float32).
    """
    lib = _load()
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    t = np.ascontiguousarray(t, np.float64)
    p = np.ascontiguousarray(p, np.float64)
    if lib is None:
        keep = (t >= t_lo) & (t <= t_hi)
        xs, ys, tt, pp = x[keep], y[keep], t[keep], p[keep]
        order = np.argsort(tt, kind="stable")
        span = (t_hi - t_lo) or 1.0
        pix = (ys[order].astype(np.int64) * width + xs[order]).astype(np.int32)
        return pix, ((tt[order] - t_lo) / span).astype(np.float32), pp[
            order
        ].astype(np.float32)
    n = np.int64(len(t))
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    null_f32 = ctypes.POINTER(ctypes.c_float)()
    kept = lib.prepare_events(
        _ptr(x, ctypes.c_double), _ptr(y, ctypes.c_double),
        _ptr(t, ctypes.c_double), _ptr(p, ctypes.c_double), n,
        np.int32(width), ctypes.c_double(t_lo), ctypes.c_double(t_hi),
        null_i32, null_f32, null_f32,
    )
    pix = np.empty(kept, np.int32)
    ts_out = np.empty(kept, np.float32)
    pol = np.empty(kept, np.float32)
    lib.prepare_events(
        _ptr(x, ctypes.c_double), _ptr(y, ctypes.c_double),
        _ptr(t, ctypes.c_double), _ptr(p, ctypes.c_double), n,
        np.int32(width), ctypes.c_double(t_lo), ctypes.c_double(t_hi),
        _ptr(pix, ctypes.c_int32), _ptr(ts_out, ctypes.c_float),
        _ptr(pol, ctypes.c_float),
    )
    return pix, ts_out, pol
