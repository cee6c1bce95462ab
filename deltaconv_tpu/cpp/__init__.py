"""Native (C++) preprocessing ops: geodesic FPS + CPU kNN.

The shared library is built lazily with g++ on first use and cached
next to the source (see :func:`load_library`). ctypes keeps the
Python<->C++ boundary dependency-free (no pybind11 in this image).
"""

from .build import load_library

__all__ = ["load_library"]
