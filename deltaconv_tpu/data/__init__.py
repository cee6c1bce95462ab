"""Datasets and input pipeline."""

from .synthetic import synthetic_classification_batch, synthetic_shapes

__all__ = ["synthetic_classification_batch", "synthetic_shapes"]
