"""Farthest-point sampling: geodesic (native CPU) and Euclidean (on-device).

The geodesic variant matches the reference's native preprocessing op
(deltaconv/cpp/sampling.cpp:21-80 via geometry/fps.py:5-18): kNN graph
(k=10, self prepended), Dijkstra from each selected sample into a
shared min-distance field, argmax selection; the first sample is
random. Two upgrades: the RNG is seedable (the reference uses an
unseeded std::random_device) and a pure-Python fallback exists when no
C++ toolchain is available.

``euclidean_fps`` is the on-device JAX variant (lax.fori_loop) for
pipelines that want sampling inside jit.
"""

from __future__ import annotations

import ctypes
import heapq
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cpp import load_library

__all__ = ["geodesic_fps", "euclidean_fps"]


def _validate(points) -> np.ndarray:
    pts = np.asarray(points)
    if pts.ndim != 2 or pts.shape[1] != 3:
        raise ValueError(f"points must be [N, 3], got {pts.shape}")
    if pts.shape[0] == 0:
        raise ValueError("points must be non-empty")
    return np.ascontiguousarray(pts, dtype=np.float64)


def _knn_numpy(pts: np.ndarray, k: int) -> np.ndarray:
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, -1.0)
    return np.argsort(d2, axis=1, kind="stable")[:, : k + 1]


def _geodesic_fps_python(pts: np.ndarray, n_samples: int, knn_k: int,
                         seed: Optional[int]) -> np.ndarray:
    """Pure-Python fallback (heapq Dijkstra over the kNN graph)."""
    n = pts.shape[0]
    adj = _knn_numpy(pts, min(knn_k, n - 1))
    rng = np.random.default_rng(seed)
    out = np.empty(n_samples, np.int32)
    out[0] = rng.integers(0, n)
    dist = np.full(n, np.inf)

    for s in range(1, n_samples):
        src = int(out[s - 1])
        dist[src] = 0.0
        pq = [(0.0, src)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[u]:
                continue
            for v in adj[u]:
                v = int(v)
                if v == u:
                    continue
                nd = d + float(np.linalg.norm(pts[v] - pts[u]))
                if nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        out[s] = int(np.argmax(dist))
    return out


def geodesic_fps(points, n_samples: int, knn_k: int = 10,
                 seed: Optional[int] = None) -> np.ndarray:
    """Geodesic farthest-point sampling.

    Args:
      points: ``[N, 3]`` array-like.
      n_samples: number of samples (<= N).
      knn_k: neighbors of the distance graph (reference uses 10,
        sampling.cpp:23).
      seed: RNG seed for the initial sample; None = non-deterministic
        (reference behavior).

    Returns:
      ``[n_samples]`` int32 indices.
    """
    pts = _validate(points)
    n = pts.shape[0]
    if n_samples > n:
        raise ValueError(f"n_samples ({n_samples}) > num points ({n})")

    lib = load_library()
    if lib is None:
        return _geodesic_fps_python(pts, n_samples, knn_k, seed)

    out = np.empty(n_samples, np.int32)
    rc = lib.geodesic_fps(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        ctypes.c_int64(n_samples),
        ctypes.c_int64(min(knn_k, n - 1)),
        ctypes.c_int64(-1 if seed is None else int(seed)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"geodesic_fps failed with code {rc}")
    return out


def euclidean_fps(pos, n_samples: int, start: int = 0):
    """On-device Euclidean farthest-point sampling under jit.

    Args:
      pos: ``[N, 3]`` jax array.
      n_samples: static sample count.
      start: index of the first sample (static or traced scalar).

    Returns:
      ``[n_samples]`` int32 indices.
    """
    n = pos.shape[0]

    def body(i, state):
        idx, dist = state
        last = pos[idx[i - 1]]
        d = jnp.linalg.norm(pos - last, axis=-1)
        dist = jnp.minimum(dist, d)
        idx = idx.at[i].set(jnp.argmax(dist).astype(jnp.int32))
        return idx, dist

    idx0 = jnp.zeros(n_samples, jnp.int32).at[0].set(start)
    dist0 = jnp.full((n,), jnp.inf, pos.dtype)
    idx, _ = jax.lax.fori_loop(1, n_samples, body, (idx0, dist0))
    return idx
