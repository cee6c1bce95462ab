"""Utilities: visualization export, profiling, weight import."""

from .ply_export import save_feature, save_ply, write_ply
from .profiling import Throughput, trace

__all__ = ["Throughput", "save_feature", "save_ply", "trace", "write_ply"]
