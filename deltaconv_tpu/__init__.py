"""DeltaConv-TPU: a TPU-native JAX framework for anisotropic geometric deep
learning on point clouds.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the
capabilities of the reference PyTorch implementation of
"DeltaConv: Anisotropic Operators for Geometric Deep Learning on Point Clouds"
(SIGGRAPH 2022, arXiv 2111.08799).

Key design deltas from the reference (see SURVEY.md §7):
  * Static shapes everywhere: dense neighbor index arrays ``[N, K]`` plus a
    validity mask replace ragged PyG ``edge_index`` tensors.
  * No sparse tensors: grad/div are per-edge coefficient tensors applied with
    gather + einsum under ``jit``/``vmap``.
  * Vector features are laid out ``[..., N, 2, C]`` (components in the
    second-to-last axis, channels on TPU lanes) instead of interleaved
    ``[2N, C]`` rows.
  * Batched small linear algebra (3x3 eigh, 6x6 Cholesky) is closed-form /
    unrolled elementwise code that maps onto the VPU, never a LAPACK loop.
"""

__version__ = "0.1.0"
version_info = (0, 1, 0)

from . import geometry  # noqa: F401
from . import nn  # noqa: F401
from . import models  # noqa: F401
from . import transforms  # noqa: F401
