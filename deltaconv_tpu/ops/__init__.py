"""Pallas TPU kernels for the hot ops.

XLA's TPU gather/scatter lower far below HBM bandwidth (measured
~9 GB/s, ~80x off), so the neighbor-indexed operations are implemented
as in-VMEM one-hot matmuls that ride the MXU instead. Every kernel has
a pure-XLA reference implementation used on non-TPU backends and for
testing.
"""

from .gather_max import gather_max

__all__ = ["gather_max"]
