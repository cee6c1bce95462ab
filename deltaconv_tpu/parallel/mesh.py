"""Mesh construction and sharded step wrappers.

Point clouds are independent, so the scaling axis is the batch: a 1-D
``data`` mesh shards axis 0 of every batch array; parameters, optimizer
state and BatchNorm statistics are replicated. Under ``jax.jit`` with
these shardings XLA inserts the cross-device psum for gradients and
BatchNorm batch statistics automatically, riding ICI.

(The reference has no distributed path at all — single CUDA device,
train_modelnet.py:191; see SURVEY.md §2.7 for the mapping.)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_train_step"]


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Places a dict of host arrays with axis 0 sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_train_step(train_step: Callable, mesh: Mesh,
                     axis_name: str = "data") -> Callable:
    """Wraps a jitted ``train_step(state, batch, rng)`` with explicit
    data-parallel shardings.

    State (params, optimizer, batch stats) is replicated; every array in
    the batch dict is sharded on axis 0. The returned state stays
    replicated, so the wrapper composes with checkpointing untouched.
    """
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P(axis_name))

    def batch_sharding(batch):
        return jax.tree_util.tree_map(lambda _: data_sharded, batch)

    def wrapped(state, batch, rng):
        state = jax.device_put(state, replicated)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sharded), batch
        )
        rng = jax.device_put(rng, replicated)
        return train_step(state, batch, rng)

    return wrapped
