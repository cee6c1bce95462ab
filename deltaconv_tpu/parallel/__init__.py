"""Device-mesh data parallelism.

The reference is strictly single-device (SURVEY.md §2.7); this module
is the new first-class TPU component: a 1-D ``data`` mesh over ICI,
batch sharded across it, parameters/optimizer state replicated, and the
gradient all-reduce emitted by XLA from the sharding annotations — no
hand-written communication.
"""

from .mesh import make_mesh, shard_batch, shard_train_step

__all__ = ["make_mesh", "shard_batch", "shard_train_step"]
