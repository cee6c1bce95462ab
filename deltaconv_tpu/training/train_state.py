"""Train state and optimizer factories.

The reference training recipe (train_modelnet.py:67-68): SGD with
momentum 0.9, weight decay 1e-4, base lr ``100 * lr`` annealed by a
per-epoch cosine schedule down to ``eta_min = lr``. Expressed here as
an optax chain (``add_decayed_weights`` before SGD reproduces torch's
coupled weight decay) and a step-indexed cosine schedule.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

__all__ = [
    "TrainState",
    "create_train_state",
    "cosine_epoch_schedule",
    "sgd_momentum",
    "adam_steplr",
]


class TrainState(train_state.TrainState):
    """flax TrainState extended with BatchNorm running statistics."""

    batch_stats: Any = None


def cosine_epoch_schedule(base_lr: float, epochs: int, steps_per_epoch: int,
                          eta_min: float = 0.0) -> Callable:
    """Cosine annealing stepped once per epoch (torch
    ``CosineAnnealingLR(T_max=epochs, eta_min)`` semantics,
    train_modelnet.py:68)."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, epochs)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def sgd_momentum(learning_rate, momentum: float = 0.9,
                 weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """torch-style SGD: coupled weight decay folded into the gradient
    before the momentum buffer (train_modelnet.py:67)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate, momentum=momentum, nesterov=False),
    )


def adam_steplr(base_lr: float, step_size: int, gamma: float,
                steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + per-epoch StepLR decay (train_shapeseg.py:82-83)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size)

    return optax.adam(schedule)


def create_train_state(model, rng, example_inputs, tx,
                       init_kwargs: Optional[dict] = None) -> TrainState:
    """Initializes parameters/batch stats and wraps them in a TrainState.

    Args:
      model: a flax module whose ``__call__`` accepts ``train``.
      rng: PRNGKey.
      example_inputs: tuple of positional example arrays.
      tx: optax transformation.
      init_kwargs: extra kwargs for ``model.init``.
    """
    variables = jax.jit(
        lambda *args: model.init(rng, *args, train=False,
                                 **(init_kwargs or {}))
    )(*example_inputs)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
