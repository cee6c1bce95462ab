"""Model zoo: DeltaNet backbone + classification/segmentation heads.

Mirrors the reference's ``deltaconv/models`` exports
(/root/reference/deltaconv/models/__init__.py:1-3).
"""

from .deltanet_base import DeltaNetBase, build_operators
from .deltanet_classification import DeltaNetClassification
from .deltanet_segmentation import DeltaNetSegmentation
from .pool import global_max_pool, global_mean_pool

__all__ = [
    "DeltaNetBase",
    "DeltaNetClassification",
    "DeltaNetSegmentation",
    "build_operators",
    "global_max_pool",
    "global_mean_pool",
]
