"""ctypes bindings for the native event-tensor builders (csrc/event_ops.cpp).

Compiled lazily with g++ on first use and cached next to the source; every
entry point falls back to the numpy implementation when the toolchain is
unavailable. This is the framework's native host data path (the reference's
native code is CUDA compute; its host loader is pure Python — ours moves the
per-chunk accumulation loops to C++)."""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = osp.join(osp.dirname(__file__), "csrc", "event_ops.cpp")
    so = osp.join(osp.dirname(__file__), "csrc", "_event_ops.so")
    try:
        if not osp.exists(so) or osp.getmtime(so) < osp.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        i64 = ctypes.c_int64
        lib.event_stack.argtypes = [i8p, u16p, u16p, i8p, i64, i64, i64, i64]
        lib.voxel_grid.argtypes = [f32p, u16p, u16p, i64p, i8p, i64, i64,
                                   i64, i64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def event_stack(events, num_bins: int):
    """Native count-binned stack; None if unavailable. -> [bins, H, W] int8."""
    lib = _build_and_load()
    if lib is None or len(events) < 2:
        return None
    out = np.empty((num_bins, events.height, events.width), np.int8)
    lib.event_stack(out, events.x, events.y, events.p, len(events),
                    num_bins, events.height, events.width)
    return out


def voxel_grid(events, num_bins: int):
    """Native bilinear voxel grid (unnormalized); None if unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    out = np.empty((num_bins, events.height, events.width), np.float32)
    lib.voxel_grid(out, events.x, events.y, events.t, events.p, len(events),
                   num_bins, events.height, events.width)
    return out
