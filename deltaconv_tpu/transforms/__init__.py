"""Data transforms (placeholder — populated in the data-pipeline milestone)."""

__all__ = []
