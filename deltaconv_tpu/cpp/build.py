"""Lazy g++ build + ctypes loader for the native ops."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(__file__), "geodesic_fps.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libdeltaconv_fps.so")


def _compile() -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # Retry without OpenMP (toolchains without libgomp).
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_library() -> Optional[ctypes.CDLL]:
    """Returns the loaded CDLL, building it on first use.

    Returns None when no working C++ toolchain exists — callers fall
    back to the pure-Python implementation.
    """
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            try:
                _compile()
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        lib.geodesic_fps.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.geodesic_fps.restype = ctypes.c_int
        lib.knn_graph_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.knn_graph_cpu.restype = ctypes.c_int
        _LIB = lib
        return _LIB
