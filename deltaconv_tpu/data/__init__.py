"""Datasets and input pipeline.

Mirrors the reference's dataset package
(/root/reference/experiments/datasets/__init__.py) plus the framework's
Cloud container, fixed-shape batch loader and synthetic generators.
"""

from .cloud import Cloud
from .dataset import BatchLoader, CloudDataset
from .modelnet import ModelNet
from .scanobjectnn import ScanObjectNN
from .shapenet import ShapeNet
from .shapeseg import ShapeSeg
from .shrec import SHREC
from .synthetic import (
    synthetic_classification_batch,
    synthetic_seg_shapes,
    synthetic_segmentation_batch,
    synthetic_shapes,
)

__all__ = [
    "BatchLoader",
    "Cloud",
    "CloudDataset",
    "ModelNet",
    "SHREC",
    "ScanObjectNN",
    "ShapeNet",
    "ShapeSeg",
    "synthetic_classification_batch",
    "synthetic_seg_shapes",
    "synthetic_segmentation_batch",
    "synthetic_shapes",
]
