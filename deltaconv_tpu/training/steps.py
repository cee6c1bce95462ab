"""Jitted train / eval step factories.

One compiled step fuses the whole per-batch pipeline of the reference
(kNN + frames + grad/div build + conv stack + loss + backward +
optimizer update; reference hot loop train_modelnet.py:90-121) into a
single XLA program — operator construction included, since the
reference rebuilds operators on augmented positions every step.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .losses import smooth_cross_entropy

__all__ = ["make_train_step", "make_eval_step"]


def _batch_kwargs(batch):
    """Optional model inputs present in the batch dict."""
    kw = {}
    for key in ("normal", "features", "point_mask", "category"):
        if batch.get(key) is not None:
            kw[key] = batch[key]
    return kw


def make_train_step(model, smoothing: float = 0.2,
                    per_point: bool = False) -> Callable:
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``.

    Args:
      model: flax module returning logits (``[B, C]`` or ``[B, N, C]``).
      smoothing: label-smoothing eps (0 disables).
      per_point: segmentation-style per-point labels ``[B, N]``.
    """

    @jax.jit
    def train_step(state, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
                **_batch_kwargs(batch),
            )
            label_mask = batch.get("point_mask") if per_point else None
            loss = smooth_cross_entropy(
                logits, batch["label"], smoothing, label_mask
            )
            return loss, (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"]
        )
        pred = jnp.argmax(logits, axis=-1)
        if per_point and batch.get("point_mask") is not None:
            m = batch["point_mask"]
            correct = jnp.sum((pred == batch["label"]) * m) / jnp.maximum(
                jnp.sum(m), 1
            )
        else:
            correct = jnp.mean((pred == batch["label"]).astype(jnp.float32))
        return state, {"loss": loss, "accuracy": correct}

    return train_step


def make_eval_step(model, per_point: bool = False) -> Callable:
    """Returns ``eval_step(state, batch) -> logits`` (running stats,
    no dropout)."""

    @jax.jit
    def eval_step(state, batch):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pos"],
            train=False,
            **_batch_kwargs(batch),
        )

    return eval_step
