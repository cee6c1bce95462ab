"""Device-mesh parallelism.

The reference is strictly single-device (SURVEY.md §2.7); this package
is the new first-class TPU component:

* data parallelism (``mesh``): a 1-D ``data`` mesh over ICI, batch
  sharded across it, parameters/optimizer state replicated, and the
  gradient all-reduce emitted by XLA from the sharding annotations;
* point-sharding (``point_sharding``): ONE cloud's points sharded over
  the mesh — operator build, the full model forward, and a training
  step expressed with ``shard_map`` collectives.
"""

from .mesh import make_mesh, shard_batch, shard_train_step
from .point_sharding import (
    ShardedGradDiv,
    pad_cloud,
    point_sharded_classification,
    point_sharded_operators,
    point_sharded_segmentation,
    point_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_train_step",
    "ShardedGradDiv",
    "pad_cloud",
    "point_sharded_classification",
    "point_sharded_operators",
    "point_sharded_segmentation",
    "point_sharded_train_step",
]
