"""Native runtime loader: builds csrc/glic_runtime.cpp on demand and exposes it
through ctypes. The reference keeps these host paths in C++ (stream aligner,
mapping.cpp:31-122; PLY export via tinyply, gaussian.cpp:306-397); this is their
standalone native equivalent. Python fallbacks exist everywhere (engine.stream,
io.ply), so environments without a toolchain still work — `available()` reports
which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(os.path.dirname(_PKG_DIR))
_SRC = os.path.join(_REPO_ROOT, "csrc", "glic_runtime.cpp")
_SO = os.path.join(_PKG_DIR, "_glic_runtime.so")


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # Build to a process-unique temp path and atomically rename: concurrent
    # processes (e.g. parallel test runs) building on demand must never see a
    # half-written .so (dlopen of a truncated file fails or crashes).
    tmp = f"{_SO}.build.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", tmp, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)  # atomic on POSIX
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return _SO


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    u64p = c.POINTER(c.c_uint64)
    f32p = c.POINTER(c.c_float)
    lib.glic_aligner_new.restype = c.c_void_p
    lib.glic_aligner_new.argtypes = [c.c_double]
    lib.glic_aligner_free.argtypes = [c.c_void_p]
    lib.glic_aligner_push_points.argtypes = [c.c_void_p, c.c_double, c.c_uint64, c.c_double]
    lib.glic_aligner_push_pose.argtypes = [c.c_void_p, c.c_double, c.c_uint64]
    lib.glic_aligner_push_image.argtypes = [c.c_void_p, c.c_double, c.c_uint64]
    lib.glic_aligner_last_point_walltime.restype = c.c_double
    lib.glic_aligner_last_point_walltime.argtypes = [c.c_void_p]
    lib.glic_aligner_dropped.restype = c.c_uint64
    lib.glic_aligner_dropped.argtypes = [c.c_void_p]
    lib.glic_aligner_pop.restype = c.c_int
    lib.glic_aligner_pop.argtypes = [
        c.c_void_p, c.POINTER(c.c_double), u64p, u64p, u64p, u64p,
        c.POINTER(c.c_int),
    ]
    lib.glic_ply_write.restype = c.c_int
    lib.glic_ply_write.argtypes = [
        c.c_char_p, c.c_int64, c.c_int, f32p, f32p, f32p, f32p, f32p, f32p,
    ]
    lib.glic_ply_read_header.restype = c.c_int
    lib.glic_ply_read_header.argtypes = [
        c.c_char_p, c.POINTER(c.c_int64), c.POINTER(c.c_int),
        c.POINTER(c.c_int64),
    ]
    lib.glic_ply_read.restype = c.c_int
    lib.glic_ply_read.argtypes = [
        c.c_char_p, c.c_int64, c.c_int, c.c_int64,
        f32p, f32p, f32p, f32p, f32p, f32p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native runtime library, building it on first use. None if unavailable
    (no g++ / no source) — callers fall back to pure Python."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GLIC_DISABLE_NATIVE") == "1":
            return None
        so = _build()
        if so is None:
            return None
        try:
            _lib = _bind(ctypes.CDLL(so))
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None
