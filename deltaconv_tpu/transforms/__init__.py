"""Data transforms: host-side Cloud transforms + on-device augmentations.

Mirrors the reference's nine exported transforms
(/root/reference/deltaconv/transforms/__init__.py:1-9) and adds the
TPU-first batched augmentation functions.
"""

from .augment import (
    augment_classification,
    random_normals,
    random_rotate,
    random_scale,
    random_translate_global,
)
from .geodesic_fps import GeodesicFPS
from .transforms import (
    Compose,
    NormalizeArea,
    NormalizeAxes,
    NormalizeScale,
    RandomNormals,
    RandomRotate,
    RandomScale,
    RandomTranslateGlobal,
    SamplePoints,
)

__all__ = [
    "Compose",
    "GeodesicFPS",
    "NormalizeArea",
    "NormalizeAxes",
    "NormalizeScale",
    "RandomNormals",
    "RandomRotate",
    "RandomScale",
    "RandomTranslateGlobal",
    "SamplePoints",
    "augment_classification",
    "random_normals",
    "random_rotate",
    "random_scale",
    "random_translate_global",
]
