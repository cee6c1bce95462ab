"""NN primitives: DeltaConv, scalar/vector MLPs, norm-nonlinearities.

Mirrors the reference's ``deltaconv/nn`` exports
(/root/reference/deltaconv/nn/__init__.py:1-3).
"""

from .deltaconv import DeltaConv, gather_neighbors
from .mlp import MLP, ScalarVectorIdentity, ScalarVectorMLP, VectorMLP
from .nonlin import BatchNorm, VectorNonLin, leaky_relu02

__all__ = [
    "BatchNorm",
    "DeltaConv",
    "MLP",
    "ScalarVectorIdentity",
    "ScalarVectorMLP",
    "VectorMLP",
    "VectorNonLin",
    "gather_neighbors",
    "leaky_relu02",
]
