"""Geometry layer: tangent frames, kNN, MLS grad/div operators.

Mirrors the reference's ``deltaconv/geometry`` public surface
(/root/reference/deltaconv/geometry/__init__.py:1-5), re-designed for
static-shape TPU execution (dense ``[N, K]`` neighbor lists, per-edge
coefficient operators instead of sparse matrices).
"""

from .connection import angle_in_plane, build_transport, rotate_around
from .fps import euclidean_fps, geodesic_fps
from .frames import build_tangent_basis, estimate_basis
from .grad_div import (
    GradDiv,
    build_grad_div,
    coords_projected,
    fit_vector_mapping,
    gaussian_weights,
    weighted_least_squares,
)
from .knn import knn, knn_tiled
from .linalg import chol_solve, eigh3x3
from .operators import I_J, J, curl, hodge_laplacian, laplacian, norm
from .utils import batch_dot, normalize

__all__ = [
    "GradDiv",
    "I_J",
    "J",
    "angle_in_plane",
    "batch_dot",
    "build_grad_div",
    "build_tangent_basis",
    "build_transport",
    "chol_solve",
    "coords_projected",
    "curl",
    "eigh3x3",
    "estimate_basis",
    "euclidean_fps",
    "geodesic_fps",
    "fit_vector_mapping",
    "gaussian_weights",
    "hodge_laplacian",
    "knn",
    "knn_tiled",
    "laplacian",
    "norm",
    "normalize",
    "rotate_around",
    "weighted_least_squares",
]
